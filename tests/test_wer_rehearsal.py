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


def test_split_manual_checkpoint_roundtrip_eval_parity(tmp_path):
    """The split-program/manual-backward path's checkpoint output must
    survive the full WER loop: train (split_update + manual_backward, the
    Muon flagship step shape) -> save OpenAI ``.pt`` fp16 -> reload -> eval
    on the CPU mesh. The reloaded params reproduce the eval forward of the
    fp16-roundtripped in-memory state bit-for-bit and stay within fp16
    round-off of the fp32 training state — guarding the handoff between the
    round-3 memory stack and the WER-parity harness (docs/wer_parity.md)."""
    import numpy as np

    import jax.numpy as jnp
    import torch

    from whisper_finetune_tpu.eval.evaluator import make_eval_step
    from whisper_finetune_tpu.models import (
        ForwardConfig,
        ModelDimensions,
        init_params,
    )
    from whisper_finetune_tpu.models.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )
    from whisper_finetune_tpu.optim import get_optimizer
    from whisper_finetune_tpu.parallel import get_data_mesh
    from whisper_finetune_tpu.train.step import (
        TrainState,
        combine_params,
        make_train_step,
        partition_params,
        shard_batch,
    )

    dims = ModelDimensions(
        n_mels=16, n_audio_ctx=32, n_audio_state=32, n_audio_head=2,
        n_audio_layer=2, n_vocab=128, n_text_ctx=16, n_text_head=2,
        n_text_state=32, n_text_layer=2,
    )
    mesh = get_data_mesh()
    conf = {
        "type": "adamw", "muon": True, "8bit": False,
        "muon_params": {"lr": 0.01, "momentum": 0.95},
        "params": {"lr": 1e-3},
        "muon_momentum_dtype": "int8",
    }
    params = init_params(jax.random.PRNGKey(0), dims)
    trainable, frozen = partition_params(params, None)
    tx, _ = get_optimizer(trainable, conf)
    state = TrainState(
        trainable, frozen, tx.init(trainable), jnp.zeros((), jnp.int32)
    )
    step_fn = make_train_step(
        mesh, dims, ForwardConfig(compute_dtype="float32"), tx,
        max_grad_norm=1.0, accum_dtype="bfloat16",
        split_update=True, manual_backward=True,
    )
    rng = np.random.default_rng(11)
    batch = shard_batch(mesh, {
        "mel": jnp.asarray(rng.standard_normal(
            (2, 8, dims.n_mels, dims.n_audio_ctx * 2)).astype(np.float32)),
        "dec_input": jnp.asarray(
            rng.integers(0, dims.n_vocab, (2, 8, dims.n_text_ctx)).astype(np.int32)),
        "dec_output": jnp.asarray(
            rng.integers(0, dims.n_vocab, (2, 8, dims.n_text_ctx)).astype(np.int32)),
    })
    for _ in range(2):
        state, loss = step_fn(state, batch, jax.random.PRNGKey(7))
    assert np.isfinite(float(loss))

    full = combine_params(state.trainable, state.frozen)
    ckpt = str(tmp_path / "split_manual.pt")
    save_checkpoint(ckpt, full, dims)

    # Output contract: fp16 tensors in OpenAI state_dict layout.
    raw = torch.load(ckpt, map_location="cpu")
    assert all(t.dtype == torch.float16
               for t in raw["model_state_dict"].values())

    reloaded, dims2 = load_checkpoint(ckpt)
    assert dims2 == dims

    eval_step = make_eval_step(dims, ForwardConfig(compute_dtype="float32"))
    eval_batch = {
        "mel": batch["mel"][0], "dec_input": batch["dec_input"][0],
        "dec_output": batch["dec_output"][0],
    }
    roundtrip = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float16).astype(x.dtype), full
    )
    out_saved = eval_step(reloaded, eval_batch)
    out_roundtrip = eval_step(roundtrip, eval_batch)
    out_fp32 = eval_step(full, eval_batch)
    # exact: the .pt round-trip IS the fp16 cast
    for a, b in zip(out_saved, out_roundtrip):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and fp16 storage stays close to the training-state forward
    np.testing.assert_allclose(
        np.asarray(out_saved[1]), np.asarray(out_fp32[1]),
        atol=5e-2, rtol=1e-2,
        err_msg="fp16 checkpoint eval NLL drifted from the training state",
    )
