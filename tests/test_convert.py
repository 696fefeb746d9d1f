"""OpenAI->HF conversion test: our saved checkpoint, converted with the
deployment script, must produce the same logits in transformers as our own
forward — closing the deployment loop (train here -> convert -> HF/CT2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_finetune_tpu.models import (
    ForwardConfig,
    ModelDimensions,
    forward,
    init_params,
    save_checkpoint,
)

DIMS = ModelDimensions(
    n_mels=80, n_audio_ctx=50, n_audio_state=64, n_audio_head=4, n_audio_layer=2,
    n_vocab=1000, n_text_ctx=32, n_text_head=4, n_text_state=64, n_text_layer=2,
)


def test_convert_openai_to_hf_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    from whisper_finetune_tpu.scripts.convert_openai_to_hf import (
        convert_openai_whisper_to_tfms,
        infer_multilinguality,
    )

    params = init_params(jax.random.PRNGKey(0), DIMS)
    ckpt = str(tmp_path / "model.pt")
    save_checkpoint(ckpt, params, DIMS)

    out_dir = str(tmp_path / "hf")
    model, _, _ = convert_openai_whisper_to_tfms(ckpt, out_dir)
    model = model.eval()

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, DIMS.n_mels, DIMS.n_audio_ctx * 2)).astype(np.float32)
    tokens = rng.integers(0, DIMS.n_vocab, (1, 10)).astype(np.int32)

    with torch.no_grad():
        hf_logits = model(
            input_features=torch.from_numpy(mel.copy()),
            decoder_input_ids=torch.from_numpy(tokens.copy()).long(),
        ).logits.numpy()

    ours = np.asarray(
        forward(params, jnp.asarray(mel), jnp.asarray(tokens), DIMS,
                ForwardConfig(compute_dtype="float32"))
    )
    # fp16 checkpoint storage dominates the tolerance
    np.testing.assert_allclose(ours, hf_logits, atol=0.05, rtol=0.05)

    import os

    assert os.path.exists(os.path.join(out_dir, "config.json"))


def test_infer_multilinguality():
    from whisper_finetune_tpu.scripts.convert_openai_to_hf import infer_multilinguality

    assert infer_multilinguality(51865) == (True, 99)   # v1/v2 multilingual
    assert infer_multilinguality(51866) == (True, 100)  # large-v3 (+yue)
    assert infer_multilinguality(51864) == (False, 0)   # english-only


def test_build_generation_config_offline_synthesis():
    # no network/cache in this image -> exercises the tokenizer-derived path
    from whisper_finetune_tpu.scripts.convert_openai_to_hf import (
        build_generation_config,
    )

    cfg = build_generation_config(True, 100)
    assert cfg.decoder_start_token_id == 50258  # <|startoftranscript|>
    assert cfg.no_timestamps_token_id == 50364
    assert cfg.task_to_id == {"transcribe": 50360, "translate": 50359}
    assert len(cfg.lang_to_id) == 100 and cfg.lang_to_id["<|de|>"] == 50261
    assert cfg.max_length == 448
    assert 220 in cfg.begin_suppress_tokens
    assert len(cfg.suppress_tokens) > 50  # non-speech symbol ids

    en = build_generation_config(False, 0)
    assert en.is_multilingual is False and en.max_length == 448


def test_local_only_hf_cache_layout(tmp_path):
    # reference --local-only shape (upload_model_to_hub.py:282-342):
    # models--org--repo/refs/main + snapshots/<40-hex>/<files>
    from whisper_finetune_tpu.scripts.upload_model_to_hub import (
        build_readme,
        write_to_hf_cache,
    )

    pt = tmp_path / "best_model.pt"
    pt.write_bytes(b"fake checkpoint")
    ct2 = tmp_path / "ct2"
    ct2.mkdir()
    (ct2 / "model.bin").write_bytes(b"ct2 weights")

    readme = build_readme(
        "org/my-model", str(pt), has_ct2=True, quantization="int8",
        wandb_run_url="https://wandb.ai/org/proj/runs/abc",
    )
    snapshot = write_to_hf_cache(
        "org/my-model", pt_path=str(pt), ct2_folder=str(ct2),
        readme_text=readme, cache_dir=str(tmp_path / "hub"),
    )

    repo = tmp_path / "hub" / "models--org--my-model"
    assert (repo / "refs" / "main").is_file()
    commit = (repo / "refs" / "main").read_text()
    assert len(commit) == 40 and snapshot.endswith(commit)
    snap = repo / "snapshots" / commit
    assert (snap / "best_model.pt").read_bytes() == b"fake checkpoint"
    assert (snap / "model.bin").read_bytes() == b"ct2 weights"
    text = (snap / "README.md").read_text()
    assert "faster_whisper" in text and 'compute_type="int8"' in text
    assert "W&B Run: https://wandb.ai/org/proj/runs/abc" in text
    assert "best_model.pt" in text


def test_build_readme_custom_overrides(tmp_path):
    from whisper_finetune_tpu.scripts.upload_model_to_hub import build_readme

    f = tmp_path / "readme.md"
    f.write_text("# custom")
    assert build_readme("o/r", "x.pt", readme_arg=str(f)) == "# custom"
    assert build_readme("o/r", "x.pt", readme_arg="literal text") == "literal text"
