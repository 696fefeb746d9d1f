"""LoRA checkpoint interop: unmerged adapters round-trip through the
torch-parametrize/minLoRA key layout the reference writes and reads
(merge_lora_weights.py:43-51), and the merge CLI produces a clean
OpenAI-format model."""

import numpy as np
import pytest

import jax

from whisper_finetune_tpu.models import (
    ModelDimensions,
    init_params,
    load_checkpoint,
    params_to_state_dict,
    save_checkpoint,
)
from whisper_finetune_tpu.models.lora import apply_lora, has_lora, merge_lora

DIMS = ModelDimensions(
    n_mels=8, n_audio_ctx=16, n_audio_state=16, n_audio_head=2, n_audio_layer=2,
    n_vocab=64, n_text_ctx=8, n_text_head=2, n_text_state=16, n_text_layer=1,
)


@pytest.fixture()
def lora_params():
    params = init_params(jax.random.PRNGKey(0), DIMS)
    params, _ = apply_lora(params, rank=2, alpha=4, key=jax.random.PRNGKey(1))
    # non-trivial B so merging changes weights
    b = params["decoder"]["blocks"]["attn"]["q_w_lora"]["b"]
    params["decoder"]["blocks"]["attn"]["q_w_lora"]["b"] = b + 0.05
    return params


def test_lora_state_dict_uses_parametrize_names(lora_params):
    sd = params_to_state_dict(lora_params, DIMS)
    base = "decoder.blocks.0.attn.query.parametrizations.weight"
    assert f"{base}.original" in sd
    assert f"{base}.0.lora_A" in sd
    assert f"{base}.0.lora_B" in sd
    # plain name absent for adapted weights, present for non-adapted params
    assert "decoder.blocks.0.attn.query.weight" not in sd
    assert "decoder.blocks.0.attn_ln.weight" in sd
    # minLoRA shape conventions: A (rank, in), B (out, rank)
    assert sd[f"{base}.0.lora_A"].shape == (2, 16)
    assert sd[f"{base}.0.lora_B"].shape == (16, 2)


def test_lora_checkpoint_roundtrip(lora_params, tmp_path):
    path = str(tmp_path / "lora_ckpt.pt")
    save_checkpoint(path, lora_params, DIMS)
    reloaded, dims = load_checkpoint(path)
    assert dims == DIMS
    assert has_lora(reloaded)
    a0 = np.asarray(lora_params["decoder"]["blocks"]["attn"]["q_w_lora"]["a"])
    a1 = np.asarray(reloaded["decoder"]["blocks"]["attn"]["q_w_lora"]["a"])
    np.testing.assert_allclose(a0, a1, atol=1e-3)


def test_merge_cli(lora_params, tmp_path):
    from whisper_finetune_tpu.scripts.merge_lora_weights import main as merge_main

    src = str(tmp_path / "lora_ckpt.pt")
    dst = str(tmp_path / "merged.pt")
    save_checkpoint(src, lora_params, DIMS)
    merge_main(src, dst, test_merge=True, rank=2, alpha=4)

    merged, _ = load_checkpoint(dst)
    assert not has_lora(merged)
    # equals in-memory merge (fp16 storage tolerance)
    expected = merge_lora(lora_params, rank=2, alpha=4)
    got = np.asarray(merged["decoder"]["blocks"]["attn"]["q_w"])
    want = np.asarray(expected["decoder"]["blocks"]["attn"]["q_w"])
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_merge_cli_rejects_plain_checkpoint(tmp_path):
    from whisper_finetune_tpu.scripts.merge_lora_weights import main as merge_main

    params = init_params(jax.random.PRNGKey(0), DIMS)
    src = str(tmp_path / "plain.pt")
    save_checkpoint(src, params, DIMS)
    with pytest.raises(ValueError, match="no LoRA adapters"):
        merge_main(src, str(tmp_path / "out.pt"))
