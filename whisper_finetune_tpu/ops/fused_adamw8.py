"""Fused blockwise-8-bit AdamW update as one Pallas TPU kernel.

The unfused path (optim/quantized.py + optax.chain + apply_updates) walks the
1.55B-parameter tree ~6 times through HBM per step (dequantize both moments to
fp32, compute updates, add decayed weights, scale by LR, apply) — measured at
178 ms/step on v5e for large-v3 (tools/bench_optimizer_cost.py), 6x the
speed-of-light traffic. This kernel does the whole AdamW update for one leaf
in a single pass: read grads + int8 codes + params, write new params + codes
in place (input_output_aliases) — ~22 GB of traffic, ~30 ms.

Math is bit-identical in structure to quantized.py's update_fn followed by
optax.add_decayed_weights + scale_by_learning_rate + apply_updates:

    m  = b1*deq(m8) + (1-b1)*g          nu = b2*deq_log(nu8) + (1-b2)*g^2
    u  = (m/(1-b1^t)) / (sqrt(nu/(1-b2^t)) + eps)
    p  = p - lr*(u + wd*p)
    m8 = quant(m)                        nu8 = quant_log(nu)

Layout: each leaf is flattened to (n_blocks, 256) — quantized.py's BLOCK —
with per-row fp32 scales (n_blocks, 1); the grid tiles rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from whisper_finetune_tpu.optim.quantized import (
    BLOCK,
    _LOG_DECADES,
    _LOG_LEVELS,
)

_LN10 = 2.302585092994046


def _u8_to_f32(x: jnp.ndarray) -> jnp.ndarray:
    """Mosaic has no uint8->f32 cast; go through an int8 bitcast."""
    i8 = pltpu.bitcast(x, jnp.int8).astype(jnp.float32)
    return jnp.where(i8 < 0, i8 + 256.0, i8)


def _f32_to_u8(x: jnp.ndarray) -> jnp.ndarray:
    """Values in [0, 255] -> uint8 storage, via the int8 two's-complement."""
    wrapped = jnp.where(x > 127.5, x - 256.0, x)
    return pltpu.bitcast(jnp.round(wrapped).astype(jnp.int8), jnp.uint8)


def _deq_log(q: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """uint8 log-codebook codes -> non-negative fp32 (quantized.py:75-82)."""
    qf = _u8_to_f32(q)
    r = jnp.exp(((qf - 1.0) / _LOG_LEVELS * _LOG_DECADES - _LOG_DECADES) * _LN10)
    return jnp.where(qf == 0, 0.0, r) * scale


def _quant_linear(m: jnp.ndarray):
    scale = jnp.max(jnp.abs(m), axis=1, keepdims=True) / 127.0
    safe = jnp.where(scale == 0, 1.0, scale)
    codes = jnp.clip(jnp.round(m / safe), -127, 127).astype(jnp.int8)
    return codes, scale


def _quant_log(nu: jnp.ndarray):
    scale = jnp.max(nu, axis=1, keepdims=True)
    safe = jnp.where(scale == 0, 1.0, scale)
    r = jnp.clip(nu / safe, 0.0, 1.0)
    logr = jnp.log(jnp.maximum(r, 10.0 ** (-_LOG_DECADES))) / _LN10
    codes = 1.0 + jnp.round((logr + _LOG_DECADES) / _LOG_DECADES * _LOG_LEVELS)
    codes = _f32_to_u8(jnp.where(r == 0, 0.0, codes))
    return codes, scale


def _kernel(
    scal_ref,  # SMEM (4,): lr, inv_c1, inv_c2, g_scale
    p_ref, g_ref, mc_ref, ms_ref, nc_ref, ns_ref,
    p_out, mc_out, ms_out, nc_out, ns_out,
    *, b1: float, b2: float, eps: float, wd: float,
):
    # Op-count matters more than traffic here (the VPU chain is the
    # bottleneck, tools/bench_fused_opt.py): every per-row divisor becomes a
    # per-row reciprocal + elementwise multiply, and constant factors fold
    # into the per-row scales so they cost 1/BLOCK as much.
    lr, inv_c1, inv_c2 = scal_ref[0], scal_ref[1], scal_ref[2]
    g = g_ref[:].astype(jnp.float32) * scal_ref[3]
    # m = b1 * deq(m8) + (1-b1) g, with b1 folded into the row scale
    m = mc_ref[:].astype(jnp.float32) * (ms_ref[:] * b1) + (1.0 - b1) * g
    # nu = b2 * deq_log(nu8) + (1-b2) g^2, b2 folded into the row scale
    qf = _u8_to_f32(nc_ref[:])
    r = jnp.exp(((qf - 1.0) * (_LOG_DECADES / _LOG_LEVELS) - _LOG_DECADES) * _LN10)
    nu_prev = jnp.where(qf == 0, 0.0, r) * (ns_ref[:] * b2)
    nu = nu_prev + (1.0 - b2) * g * g
    upd = (m * inv_c1) / (jnp.sqrt(nu * inv_c2) + eps)
    p = p_ref[:]
    p_out[:] = p - lr * (upd + wd * p)

    # requantize m (linear absmax), divides as per-row reciprocals
    ms = jnp.max(jnp.abs(m), axis=1, keepdims=True) / 127.0
    ms_rec = jnp.where(ms == 0, 1.0, 1.0 / ms)
    mc_out[:] = jnp.clip(jnp.round(m * ms_rec), -127, 127).astype(jnp.int8)
    ms_out[:] = ms

    # requantize nu (log codebook)
    ns = jnp.max(nu, axis=1, keepdims=True)
    ns_rec = jnp.where(ns == 0, 1.0, 1.0 / ns)
    rq = jnp.clip(nu * ns_rec, 0.0, 1.0)
    logr = jnp.log(jnp.maximum(rq, 10.0 ** (-_LOG_DECADES))) * (1.0 / _LN10)
    codes = 1.0 + jnp.round((logr + _LOG_DECADES) * (_LOG_LEVELS / _LOG_DECADES))
    nc_out[:] = _f32_to_u8(jnp.where(rq == 0, 0.0, codes))
    ns_out[:] = ns


@functools.partial(
    jax.jit,
    static_argnames=("b1", "b2", "eps", "wd", "rows_per_tile", "interpret"),
)
def fused_adamw8_leaf(
    p: jnp.ndarray,       # (NB, BLOCK) fp32
    g: jnp.ndarray,       # (NB, BLOCK) fp32/bf16
    m_codes: jnp.ndarray,  # (NB, BLOCK) int8
    m_scale: jnp.ndarray,  # (NB, 1) fp32
    n_codes: jnp.ndarray,  # (NB, BLOCK) uint8
    n_scale: jnp.ndarray,  # (NB, 1) fp32
    lr: jnp.ndarray,       # scalar fp32 (already sign-positive)
    c1: jnp.ndarray,       # scalar fp32: 1 - b1**t
    c2: jnp.ndarray,       # scalar fp32: 1 - b2**t
    g_scale: jnp.ndarray,  # scalar fp32 grad multiplier (clip factor)
    *,
    b1: float,
    b2: float,
    eps: float,
    wd: float,
    rows_per_tile: int = 512,
    interpret: bool = False,
):
    nb = p.shape[0]
    r = min(rows_per_tile, nb)
    scalars = jnp.stack(
        [
            lr.astype(jnp.float32),
            1.0 / c1.astype(jnp.float32),
            1.0 / c2.astype(jnp.float32),
            g_scale.astype(jnp.float32),
        ]
    )

    grid = (pl.cdiv(nb, r),)
    row_spec = pl.BlockSpec((r, BLOCK), lambda i: (i, 0), memory_space=pltpu.VMEM)
    scale_spec = pl.BlockSpec((r, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_kernel, b1=b1, b2=b2, eps=eps, wd=wd),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            row_spec,  # p
            row_spec,  # g
            row_spec,  # m codes
            scale_spec,  # m scale
            row_spec,  # n codes
            scale_spec,  # n scale
        ],
        out_specs=(row_spec, row_spec, scale_spec, row_spec, scale_spec),
        out_shape=(
            jax.ShapeDtypeStruct(p.shape, jnp.float32),
            jax.ShapeDtypeStruct(m_codes.shape, jnp.int8),
            jax.ShapeDtypeStruct(m_scale.shape, jnp.float32),
            jax.ShapeDtypeStruct(n_codes.shape, jnp.uint8),
            jax.ShapeDtypeStruct(n_scale.shape, jnp.float32),
        ),
        # In-place: params and both moment stores update without fresh HBM
        # allocations (operand indices are offset by 1 for the SMEM scalars).
        input_output_aliases={1: 0, 3: 1, 4: 2, 5: 3, 6: 4},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(scalars, p, g, m_codes, m_scale, n_codes, n_scale)
