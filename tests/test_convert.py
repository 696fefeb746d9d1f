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
