"""WER-parity harness rehearsal: the full path pt -> params -> mesh eval ->
macro-WER JSON, on synthetic weights and the local debug dataset (the
network-free stand-in for docs/wer_parity.md's recipe)."""

import json
import os
import subprocess
import sys

import pytest

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_load_model_hard_fails_without_weights(monkeypatch):
    from whisper_finetune_tpu.models.checkpoint import load_model

    monkeypatch.delenv("WFT_ALLOW_RANDOM_INIT", raising=False)
    monkeypatch.delenv("WHISPER_CHECKPOINT_DIR", raising=False)
    with pytest.raises(FileNotFoundError, match="WFT_ALLOW_RANDOM_INIT"):
        load_model("tiny")


def test_evaluate_cli_end_to_end(tmp_path):
    from whisper_finetune_tpu.models import ModelDimensions  # noqa: F401 (jax init)
    from whisper_finetune_tpu.models.checkpoint import save_checkpoint
    from whisper_finetune_tpu.models.dims import MODEL_PRESETS
    from whisper_finetune_tpu.models.whisper import init_params

    if not os.path.exists(os.path.join(REPO, "data", "debug_dataset")):
        subprocess.run(
            [sys.executable, "tools/make_debug_dataset.py"], cwd=REPO, check=True
        )

    # save a random-init tiny in OpenAI .pt format, then run the CLI on it
    dims = MODEL_PRESETS["tiny"]
    params = init_params(jax.random.PRNGKey(0), dims)
    ckpt = str(tmp_path / "rehearsal.pt")
    save_checkpoint(ckpt, params, dims)

    proc = subprocess.run(
        [
            sys.executable, "-m", "whisper_finetune_tpu.scripts.evaluate",
            "--checkpoint", ckpt,
            "--datasets", "data/debug_dataset",
            "--names", "debug",
            "--split", "validation",
            "--batch-size", "4",
            "--dtype", "float32",
        ],
        cwd=REPO,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
        capture_output=True,
        text=True,
        timeout=1500,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    # the CLI's final output is the pretty-printed metric dict
    result = json.loads(proc.stdout[proc.stdout.index('{\n  "val/'):])
    assert "val/macro_wer" in result
    assert 0.0 <= result["val/debug_wer"]
    assert result["val/macro_wer"] == result["val/debug_wer"]
