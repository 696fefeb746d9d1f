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
