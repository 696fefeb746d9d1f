"""Data-pipeline tests mirroring the reference's coverage
(tests/test_data_loader.py, tests/test_utils.py there): decoder target
construction, timestamp encoding, truncation, lazy invalid-record skipping,
collation, samplers, loader, and process_dataset behaviours on in-memory
datasets."""

import random

import numpy as np
import pytest

from whisper_finetune_tpu.data import (
    BatchLoader,
    SampleBuilder,
    SampleDataset,
    ShardedSampler,
    WarmupDatasetSampler,
    collate,
    get_dataset_boundary_indices,
    infinite_batches,
    process_dataset,
    stack_microbatches,
)
from whisper_finetune_tpu.ops.mel import N_FRAMES, N_SAMPLES


class DummyTokenizer:
    """Fixed-id tokenizer (reference tests/test_data_loader.py:53-64 style):
    encode maps each char to a small id; specials use a large-id block."""

    sot = 1000
    eot = 1001
    sot_prev = 1002
    no_speech = 1003
    no_timestamps = 1004
    timestamp_begin = 1500

    def __init__(self):
        self.special_tokens = {
            "<|de|>": 1010,
            "<|en|>": 1011,
            "<|transcribe|>": 1012,
        }

    def encode(self, text, dropout_prob=0.0, rng=None):
        return [ord(c) % 200 for c in text]


class DummyHF:
    """In-memory dataset; can raise on configured indices
    (reference tests/test_data_loader.py:67-83 technique)."""

    column_names = ["audio", "text", "language", "prompt"]

    def __init__(self, records, bad=()):
        self.records = records
        self.bad = set(bad)

    def __len__(self):
        return len(self.records)

    def __getitem__(self, i):
        if i in self.bad:
            raise RuntimeError("corrupt record")
        return self.records[i]


def _record(text="hello", prompt="", n_audio=16000, language="de"):
    return {
        "audio": {"array": np.zeros(n_audio, dtype=np.float32)},
        "text": text,
        "language": language,
        "prompt": prompt,
    }


def _builder(**kw):
    defaults = dict(prompt_use_rate=0.0, no_timestamps_rate=0.0)
    defaults.update(kw)
    return SampleBuilder(DummyTokenizer(), **defaults)


def test_decoder_output_no_prompt():
    b = _builder()
    s = b.build(_record("ab"), random.Random(0))
    tok = DummyTokenizer()
    text = [ord("a") % 200, ord("b") % 200]
    assert s["dec_input"] == [tok.sot, 1010, 1012] + text
    # target drops sot, appends eot (reference data_loader.py:303-320)
    assert s["dec_output"] == [1010, 1012] + text + [tok.eot]
    assert s["crop_frames"] == N_FRAMES
    assert s["audio"].shape == (N_SAMPLES,)


def test_decoder_output_with_prompt_masks_minus_100():
    b = _builder(prompt_use_rate=1.0)
    s = b.build(_record("a", prompt="xy"), random.Random(0))
    tok = DummyTokenizer()
    prompt = [tok.sot_prev, ord("x") % 200, ord("y") % 200]
    specials = [tok.sot, 1010, 1012]
    text = [ord("a") % 200]
    assert s["dec_input"] == prompt + specials + text
    assert s["dec_output"] == [-100] * (len(prompt) - 1) + specials + text + [tok.eot]


def test_no_speech_and_no_timestamps_prefix():
    b = _builder(no_timestamp_training=True)
    s = b.build(_record(""), random.Random(0))
    tok = DummyTokenizer()
    # empty text -> no_speech appended; no_timestamps since timestamps off
    assert s["dec_input"] == [tok.sot, 1010, 1012, tok.no_timestamps, tok.no_speech]


def test_timestamp_token_encoding():
    b = _builder()  # timestamps on (no_timestamps_rate=0)
    s = b.build(_record("<|0.00|>ab<|1.50|>"), random.Random(0))
    tok = DummyTokenizer()
    text = s["dec_input"][3:]
    assert text[0] == tok.timestamp_begin  # <|0.00|>
    assert text[-1] == tok.timestamp_begin + 75  # <|1.50|> = 150/2
    with pytest.raises(ValueError):
        b.build(_record("<|0.01|>x"), random.Random(0))  # odd centisecond


def test_partial_segment_crop_frames():
    # trailing double timestamp + no-timestamp training -> crop at the last
    b = _builder(no_timestamp_training=True)
    s = b.build(_record("<|0.00|>ab<|2.00|><|4.00|>"), random.Random(0))
    assert s["crop_frames"] == 400  # 4.0s * 100 frames/s
    # timestamps kept -> no crop
    b2 = _builder()
    s2 = b2.build(_record("<|0.00|>ab<|2.00|><|4.00|>"), random.Random(0))
    assert s2["crop_frames"] == N_FRAMES


def test_context_truncation_shortens_prompt():
    b = _builder(prompt_use_rate=1.0, max_prompt_length=300)
    long_prompt = "p" * 300
    long_text = "t" * 200
    s = b.build(_record(long_text, prompt=long_prompt), random.Random(0))
    assert len(s["dec_input"]) <= 448


def test_lazy_invalid_record_skipping():
    records = [_record(text=f"r{i}") for i in range(4)]
    ds = SampleDataset(DummyHF(records, bad={1, 2}), _builder())
    s = ds.get(1)  # lands on record 3 after skipping 1, 2
    assert ds.invalid_indices == {1, 2}
    assert s["dec_input"][-2:] == [ord("r") % 200, ord("3") % 200]


def test_collate_shapes_and_padding():
    b = _builder()
    samples = [
        b.build(_record("ab"), random.Random(0)),
        b.build(_record("abcdef"), random.Random(0)),
    ]
    batch = collate(samples, pad_to=32)
    assert batch["audio"].shape == (2, N_SAMPLES)
    assert batch["dec_input"].shape == (2, 32)
    assert batch["dec_output"].shape == (2, 32)
    assert batch["dec_input"][0, -1] == 0
    assert batch["dec_output"][0, -1] == -100
    with pytest.raises(ValueError):
        collate(samples, pad_to=4)


def test_warmup_sampler_curriculum():
    import itertools

    sampler = WarmupDatasetSampler(
        warmup_indices=list(range(10)),
        all_indices=list(range(100)),
        warmup_steps=5,
        batch_size=2,
        shuffle=True,
        seed=0,
    )
    first = list(itertools.islice(iter(sampler), 30))
    assert all(i < 10 for i in first[:10])  # 5 steps * batch 2 warmup samples
    assert any(i >= 10 for i in first[10:])
    with pytest.raises(ValueError):
        WarmupDatasetSampler([], list(range(5)), warmup_steps=1, batch_size=1)


def test_boundaries():
    assert get_dataset_boundary_indices([1000, 500, 2000]) == [
        (0, 1000),
        (1000, 1500),
        (1500, 3500),
    ]


def test_sharded_sampler_disjoint_and_complete():
    world = 4
    shards = [
        list(ShardedSampler(103, rank=r, world_size=world, seed=1, drop_last=True))
        for r in range(world)
    ]
    sizes = {len(s) for s in shards}
    assert sizes == {103 // world}
    all_idx = [i for s in shards for i in s]
    assert len(all_idx) == len(set(all_idx))  # disjoint
    # epoch changes the permutation
    s0 = ShardedSampler(103, rank=0, world_size=world, seed=1)
    a = list(s0)
    s0.set_epoch(1)
    assert list(s0) != a


def test_batch_loader_workers_and_infinite():
    records = [_record(text=f"rec{i}") for i in range(10)]
    ds = SampleDataset(DummyHF(records), _builder())
    loader = BatchLoader(
        ds, batch_size=3, shuffle=True, seed=0, num_workers=2, drop_last=True, pad_to=16
    )
    batches = list(loader)
    assert len(batches) == len(loader) == 3
    assert batches[0]["dec_input"].shape == (3, 16)

    stream = infinite_batches(loader)
    stacked = stack_microbatches([next(stream) for _ in range(2)])
    assert stacked["audio"].shape == (2, 3, N_SAMPLES)
    # drain past one epoch: should keep yielding (epoch 2+)
    for _ in range(5):
        next(stream)


# ---------------------------------------------------------------------------
# process_dataset on in-memory datasets (reference tests/test_utils.py style)
# ---------------------------------------------------------------------------

def _hf_dataset(rows):
    import datasets

    return datasets.Dataset.from_dict(
        {k: [r[k] for r in rows] for k in rows[0]}
    )


def test_process_dataset_normalization(monkeypatch):
    import whisper_finetune_tpu.data.hf_utils as hf_utils

    ds = _hf_dataset(
        [
            {"sentence": "hallo", "audio": [0.0]},
            {"sentence": "welt", "audio": [0.0]},
        ]
    )
    monkeypatch.setattr(hf_utils, "load_hf_dataset", lambda name, **kw: ds)
    out = process_dataset(["fake"], [None], "train", [None])
    assert "text" in out.column_names
    assert out["language"] == ["de", "de"]
    assert out["prompt"] == ["", ""]


def test_process_dataset_language_filter_and_sampling(monkeypatch):
    import whisper_finetune_tpu.data.hf_utils as hf_utils

    rows = [
        {"text": f"t{i}", "language": "german" if i % 2 else "english", "audio": [0.0]}
        for i in range(20)
    ]
    ds = _hf_dataset(rows)
    monkeypatch.setattr(hf_utils, "load_hf_dataset", lambda name, **kw: ds)
    out, sizes = process_dataset(
        ["fake"],
        [5],
        "train",
        [None],
        select_language_tag=[["de"]],
        return_sizes=True,
        rng=np.random.default_rng(0),
    )
    assert sizes == [5]
    assert set(out["language"]) == {"de"}  # 'german' normalized + filtered


def test_process_dataset_groupby_sampling(monkeypatch):
    import whisper_finetune_tpu.data.hf_utils as hf_utils

    rows = [
        {"text": f"t{i}", "language": "de", "speaker": f"s{i % 3}", "audio": [0.0]}
        for i in range(30)
    ]
    ds = _hf_dataset(rows)
    monkeypatch.setattr(hf_utils, "load_hf_dataset", lambda name, **kw: ds)
    out = process_dataset(
        ["fake"], [4], "train", ["speaker"], rng=np.random.default_rng(0)
    )
    assert len(out) == 12  # 3 groups x 4 each


def test_normalize_language_values():
    from whisper_finetune_tpu.data import normalize_language

    assert normalize_language("German") == "de"
    assert normalize_language(" de ") == "de"
    with pytest.raises(ValueError):
        normalize_language("klingon")


def test_collate_bucketing_and_mixed_stack():
    b = _builder()
    short = [b.build(_record("ab"), random.Random(0)) for _ in range(2)]
    long = [b.build(_record("x" * 200), random.Random(0)) for _ in range(2)]

    batch_short = collate(short, pad_to=(64, 128, 448))
    assert batch_short["dec_input"].shape[1] == 64
    batch_long = collate(long, pad_to=(64, 128, 448))
    assert batch_long["dec_input"].shape[1] == 448  # 200 chars + specials > 128

    with pytest.raises(ValueError):
        collate(long, pad_to=(64, 128))

    stacked = stack_microbatches([batch_short, batch_long])
    assert stacked["dec_input"].shape == (2, 2, 448)
    assert stacked["dec_output"][0, 0, -1] == -100  # re-pad fill
    assert stacked["dec_input"][0, 0, -1] == 0


def test_bg_noise_uses_packaged_bank():
    import numpy as np

    from whisper_finetune_tpu.data.augment import AddBackgroundNoise

    t = AddBackgroundNoise(p=1.0)
    # six committed office-ambience wavs (tools/make_bg_noise_bank.py)
    assert len(t._bank) == 6
    assert all(len(b) == 160000 for b in t._bank)  # 10 s at 16 kHz
    y = t.apply(np.zeros(16000, np.float32), 16000, np.random.default_rng(0))
    assert float(np.abs(y).max()) > 0  # noise actually mixed in
