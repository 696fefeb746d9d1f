"""Blockwise 8-bit optimizer state: quantization roundtrip, trajectory close
to fp32 AdamW, state memory actually int8, small-leaf fp32 passthrough."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from whisper_finetune_tpu.optim.quantized import (
    BLOCK,
    MIN_QUANT_SIZE,
    adamw_8bit,
    dequantize_blockwise,
    quantize_blockwise,
)


def test_quantize_roundtrip_error_bounded():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(5000).astype(np.float32))
    codes, scale = quantize_blockwise(x)
    assert codes.dtype == jnp.int8
    assert codes.size == ((5000 + BLOCK - 1) // BLOCK) * BLOCK
    y = dequantize_blockwise(codes, scale, (5000,))
    err = np.abs(np.asarray(y) - np.asarray(x))
    # error bounded by half a quantization bin per block
    per_block_bound = np.abs(np.asarray(x)).reshape(-1)  # loose global check
    assert err.max() <= np.abs(np.asarray(x)).max() / 127.0 + 1e-6


def test_quantize_zeros_and_exact_shapes():
    codes, scale = quantize_blockwise(jnp.zeros(300))
    y = dequantize_blockwise(codes, scale, (300,))
    np.testing.assert_array_equal(np.asarray(y), np.zeros(300))


def test_adamw8bit_tracks_fp32_adamw():
    rng = np.random.default_rng(1)
    w0 = rng.standard_normal(8192).astype(np.float32) * 0.1
    grads = [rng.standard_normal(8192).astype(np.float32) for _ in range(25)]

    tx8 = adamw_8bit(1e-2, weight_decay=0.0)
    tx32 = optax.adamw(1e-2, weight_decay=0.0)

    p8 = {"w": jnp.asarray(w0)}
    p32 = {"w": jnp.asarray(w0)}
    s8, s32 = tx8.init(p8), tx32.init(p32)
    for g in grads:
        gt = {"w": jnp.asarray(g)}
        u8, s8 = tx8.update(gt, s8, p8)
        p8 = optax.apply_updates(p8, u8)
        u32, s32 = tx32.update(gt, s32, p32)
        p32 = optax.apply_updates(p32, u32)

    a, b = np.asarray(p8["w"]), np.asarray(p32["w"])
    # quantized trajectory stays close; updates are O(lr)=1e-2 each
    assert np.abs(a - b).max() < 0.02
    assert np.corrcoef(a - w0, b - w0)[0, 1] > 0.99

    # moment state really is int8 for large leaves
    from whisper_finetune_tpu.optim.quantized import _QMoment

    adam_state = s8[0]
    assert isinstance(adam_state.mu["w"], _QMoment)
    assert adam_state.mu["w"].codes.dtype == jnp.int8


def test_small_leaves_stay_fp32():
    tx = adamw_8bit(1e-3)
    params = {"big": jnp.zeros(MIN_QUANT_SIZE), "small": jnp.zeros(16)}
    state = tx.init(params)
    from whisper_finetune_tpu.optim.quantized import _QMoment

    assert isinstance(state[0].mu["big"], _QMoment)
    assert isinstance(state[0].mu["small"], jnp.ndarray)


def test_get_optimizer_8bit_path():
    from whisper_finetune_tpu.optim import get_optimizer

    conf = {"type": "adamw", "8bit": True, "muon": None,
            "params": {"lr": 1e-3, "weight_decay": 0.01}}
    params = {"w": jnp.zeros(MIN_QUANT_SIZE)}
    tx, meta = get_optimizer(params, conf)
    state = tx.init(params)
    updates, _ = tx.update({"w": jnp.ones(MIN_QUANT_SIZE)}, state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()


def test_8bit_under_jit():
    tx = adamw_8bit(1e-2)
    params = {"w": jnp.zeros(MIN_QUANT_SIZE)}
    state = tx.init(params)

    @jax.jit
    def step(params, state, g):
        updates, state = tx.update({"w": g}, state, params)
        return optax.apply_updates(params, updates), state

    g = jnp.ones(MIN_QUANT_SIZE)
    p, s = step(params, state, g)
    p, s = step(p, s, g)
    assert np.isfinite(np.asarray(p["w"])).all()


# ---------------------------------------------------------------------------
# Fused one-pass update (ops/fused_adamw8.py, Pallas interpret mode on CPU)
# ---------------------------------------------------------------------------

def _unfused_steps(tx, params, state, grads_list, clip=None):
    for g in grads_list:
        if clip is not None:
            gnorm = optax.global_norm(g)
            c = jnp.minimum(1.0, clip / (gnorm + 1e-6))
            g = jax.tree_util.tree_map(lambda x: x * c, g)
        updates, state = tx.update(g, state, params)
        params = optax.apply_updates(params, updates)
    return params, state


def _fused_steps(tx, params, state, grads_list, clip=None):
    for g in grads_list:
        gs = None
        if clip is not None:
            gnorm = jnp.sqrt(sum(
                jnp.sum(jnp.square(x.astype(jnp.float32)))
                for x in jax.tree_util.tree_leaves(g)
            ))
            gs = jnp.minimum(1.0, clip / (gnorm + 1e-6))
        params, state = tx.fused_apply(g, state, params, g_scale=gs)
    return params, state


@pytest.mark.parametrize("use_schedule", [False, True])
def test_fused_apply_matches_unfused(use_schedule):
    lr = (lambda c: 1e-2 * (1.0 + 0.5 * c)) if use_schedule else 1e-2
    tx = adamw_8bit(lr, weight_decay=0.01)
    rng = np.random.default_rng(0)
    params = {
        "big": jnp.asarray(rng.standard_normal(MIN_QUANT_SIZE), jnp.float32),
        "small": jnp.asarray(rng.standard_normal(16), jnp.float32),
    }
    grads_list = [
        {
            "big": jnp.asarray(
                rng.standard_normal(MIN_QUANT_SIZE) * 0.1, jnp.float32
            ),
            "small": jnp.asarray(rng.standard_normal(16) * 0.1, jnp.float32),
        }
        for _ in range(3)
    ]
    p_ref, s_ref = _unfused_steps(tx, params, tx.init(params), grads_list)
    p_fus, s_fus = _fused_steps(tx, params, tx.init(params), grads_list)

    for k in params:
        np.testing.assert_allclose(
            np.asarray(p_fus[k]), np.asarray(p_ref[k]), rtol=0, atol=1e-6
        )
    assert int(s_fus[0].count) == int(s_ref[0].count) == 3
    # moment codes agree within one quantization level
    from whisper_finetune_tpu.optim.quantized import _QMoment

    assert isinstance(s_fus[0].mu["big"], _QMoment)
    d = np.abs(
        np.asarray(s_fus[0].mu["big"].codes, np.int32)
        - np.asarray(s_ref[0].mu["big"].codes, np.int32)
    )
    assert d.max() <= 1


def test_fused_apply_clip_matches_unfused_clip():
    tx = adamw_8bit(5e-3, weight_decay=0.005)
    rng = np.random.default_rng(1)
    params = {"w": jnp.asarray(rng.standard_normal(MIN_QUANT_SIZE), jnp.float32)}
    grads_list = [
        {"w": jnp.asarray(rng.standard_normal(MIN_QUANT_SIZE) * 5, jnp.float32)}
        for _ in range(2)
    ]
    p_ref, _ = _unfused_steps(tx, params, tx.init(params), grads_list, clip=1.0)
    p_fus, _ = _fused_steps(tx, params, tx.init(params), grads_list, clip=1.0)
    np.testing.assert_allclose(
        np.asarray(p_fus["w"]), np.asarray(p_ref["w"]), rtol=0, atol=1e-6
    )


def test_train_step_uses_fused_path_and_converges():
    # make_train_step with adamw_8bit must run end-to-end through the fused
    # branch (Pallas interpret mode on the CPU mesh) and reduce the loss.
    from whisper_finetune_tpu.models import ForwardConfig, ModelDimensions, init_params
    from whisper_finetune_tpu.parallel import get_data_mesh
    from whisper_finetune_tpu.train.step import (
        TrainState,
        make_train_step,
        partition_params,
        shard_batch,
    )

    dims = ModelDimensions(
        n_mels=8, n_audio_ctx=16, n_audio_state=16, n_audio_head=2,
        n_audio_layer=2, n_vocab=64, n_text_ctx=8, n_text_head=2,
        n_text_state=16, n_text_layer=2,
    )
    params = init_params(jax.random.PRNGKey(0), dims)
    trainable, frozen = partition_params(params, None)
    mesh = get_data_mesh()
    tx = adamw_8bit(1e-2)
    assert hasattr(tx, "fused_apply")
    state = TrainState(trainable, frozen, tx.init(trainable), jnp.zeros((), jnp.int32))
    fcfg = ForwardConfig(compute_dtype="float32")
    step_fn = make_train_step(mesh, dims, fcfg, tx, 0.0, max_grad_norm=1.0)

    rng = np.random.default_rng(0)
    batch = shard_batch(
        mesh,
        {
            "mel": jnp.asarray(
                rng.standard_normal((1, 8, dims.n_mels, 32)), jnp.float32
            ),
            "dec_input": jnp.asarray(rng.integers(0, 64, (1, 8, 8)), jnp.int32),
            "dec_output": jnp.asarray(rng.integers(0, 64, (1, 8, 8)), jnp.int32),
        },
    )
    losses = []
    for i in range(5):
        state, loss = step_fn(state, batch, jax.random.PRNGKey(1))
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert int(jax.device_get(state.step)) == 5
