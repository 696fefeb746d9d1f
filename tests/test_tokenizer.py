"""Tokenizer tests.

Golden-tests the byte-level BPE against the HuggingFace ``tokenizers``
implementation when a reference tokenizer.json is reachable, plus
self-contained property tests (dropout=0 determinism, decode∘encode identity,
special-token layout) mirroring the reference test strategy of fixed-id
assertions (reference tests/test_data_loader.py:53-64).
"""

import os
import random

import pytest

from whisper_finetune_tpu.tokenizer import get_tokenizer

REFERENCE_TOKENIZER_JSON = "/root/reference/whisper_v3_utils/tokenizer.json"

SAMPLES = [
    "Hello, world!",
    " Das ist ein Test mit Umlauten: äöü ÄÖÜ ß.",
    "Zürich—Basel / 12'345.67 CHF",
    "   multiple   spaces\tand\nnewlines ",
    "emoji 🤗 and 中文 mixed",
    "",
    "a",
    "Grüezi mitenand, wie gaht's?",
]


@pytest.fixture(scope="module")
def tok():
    return get_tokenizer(multilingual=True, language="de", task="transcribe")


def test_special_token_layout(tok):
    # Multilingual large-v3 layout.
    assert tok.eot == 50257
    assert tok.sot == 50258
    assert tok.special_tokens["<|de|>"] == 50261
    assert tok.transcribe == 50360
    assert tok.sot_prev == 50362
    assert tok.no_speech == 50363
    assert tok.no_timestamps == 50364
    assert tok.timestamp_begin == 50365
    assert tok.n_vocab == 51866
    assert tok.sot_sequence == (50258, 50261, 50360)


def test_timestamp_tokens(tok):
    assert tok.timestamp_token(0.0) == tok.timestamp_begin
    assert tok.timestamp_token(30.0) == tok.timestamp_begin + 1500
    assert tok.timestamp_token(1.5) == tok.timestamp_begin + 75
    with pytest.raises(ValueError):
        tok.timestamp_token(0.01)
    with pytest.raises(ValueError):
        tok.timestamp_token(31.0)


def test_encode_decode_roundtrip(tok):
    for text in SAMPLES:
        ids = tok.encode(text)
        assert tok.decode(ids) == text


def test_encode_deterministic_without_dropout(tok):
    for text in SAMPLES:
        assert tok.encode(text) == tok.encode(text)


def test_bpe_dropout_changes_segmentation_not_content(tok):
    text = "Die schweizerische Eidgenossenschaft ist ein Bundesstaat."
    base = tok.encode(text)
    rng = random.Random(0)
    seen_longer = False
    for _ in range(10):
        dropped = tok.encode(text, dropout_prob=0.3, rng=rng)
        assert tok.decode(dropped) == text
        if len(dropped) > len(base):
            seen_longer = True
    assert seen_longer, "dropout should produce finer segmentations"


def test_dropout_one_gives_byte_level(tok):
    rng = random.Random(1)
    ids = tok.encode("abc def", dropout_prob=1.0, rng=rng)
    # With every merge dropped, each byte is its own token.
    assert len(ids) == len("abc def".encode("utf-8"))
    assert tok.decode(ids) == "abc def"


def test_decode_filters_timestamps_and_keeps_specials(tok):
    ids = [tok.sot, tok.timestamp_begin + 10] + tok.encode(" hi") + [tok.eot]
    text = tok.decode(ids)
    assert "<|startoftranscript|>" in text
    assert " hi" in text
    assert "0.2" not in text


@pytest.mark.skipif(
    not os.path.exists(REFERENCE_TOKENIZER_JSON),
    reason="reference tokenizer.json not available",
)
def test_golden_against_hf_tokenizers(tok):
    tokenizers = pytest.importorskip("tokenizers")
    hf = tokenizers.Tokenizer.from_file(REFERENCE_TOKENIZER_JSON)
    for text in SAMPLES:
        ours = tok.encode(text)
        theirs = hf.encode(text, add_special_tokens=False).ids
        assert ours == theirs, f"mismatch for {text!r}"
