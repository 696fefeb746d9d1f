"""Fused blockwise-8-bit AdamW update as one Pallas TPU kernel.

The unfused path (optim/quantized.py + optax.chain + apply_updates) walks the
1.55B-parameter tree ~6 times through HBM per step (dequantize both moments to
fp32, compute updates, add decayed weights, scale by LR, apply) — measured at
178 ms/step on v5e for large-v3 (tools/bench_optimizer_cost.py). This kernel
does the whole AdamW update for one leaf in a single pass.

Layout (measured, tools/bench_fused_opt.py + /tmp probes): per-block scales
stored as (NB, 1) force 1024 strided 4-byte DMA descriptors per tile and in/
out aliasing defeats Mosaic's pipelining — together capping the kernel at
~160 GB/s effective. The kernel therefore views each leaf THREE-dimensionally,
(NB/128, 128, BLOCK), with the scales reshaped to (NB/128, 128): every
operand tile is contiguous and lane-aligned, nothing is aliased, and the same
copy workload sustains ~340 GB/s (above XLA's own elementwise rate on this
chip). Leaves whose block count is not 128-divisible take a 2D fallback path.

Math is identical in structure to quantized.py's update_fn followed by
optax.add_decayed_weights + scale_by_learning_rate + apply_updates:

    m  = b1*deq(m8) + (1-b1)*g          nu = b2*deq_log(nu8) + (1-b2)*g^2
    u  = (m/(1-b1^t)) / (sqrt(nu/(1-b2^t)) + eps)
    p  = p - lr*(u + wd*p)
    m8 = quant(m)                        nu8 = quant_log(nu)

with the gradient-clip factor riding in as a scalar multiply (the global
norm is a read-only fp32 reduction computed outside).
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
GROUP = 128  # quantization blocks per scale row (lane dimension)


def _u8_to_f32(x: jnp.ndarray) -> jnp.ndarray:
    """Mosaic has no uint8->f32 cast; go through an int8 bitcast."""
    i8 = pltpu.bitcast(x, jnp.int8).astype(jnp.float32)
    return jnp.where(i8 < 0, i8 + 256.0, i8)


def _f32_to_u8(x: jnp.ndarray) -> jnp.ndarray:
    """Values in [0, 255] -> uint8 storage, via the int8 two's-complement."""
    wrapped = jnp.where(x > 127.5, x - 256.0, x)
    return pltpu.bitcast(jnp.round(wrapped).astype(jnp.int8), jnp.uint8)


def _update_math(
    scal_ref, p, g_raw, mc, ms, nc, ns, *, b1, b2, eps, wd, axis
):
    """Shared update body. ``ms``/``ns`` broadcast against the code arrays
    over ``axis`` (the quantization-block axis). Returns the five outputs.

    Operation ORDER matches optim/quantized.py's unfused path exactly (e.g.
    ``b1 * (codes*scale)``, divides not reciprocal-multiplies) so the fused
    and unfused states stay bit-identical — measured perf is bound by HBM
    layout, not these ops (tools/bench_fused_opt.py)."""
    lr, c1, c2 = scal_ref[0], scal_ref[1], scal_ref[2]
    g = g_raw.astype(jnp.float32) * scal_ref[3]
    m = b1 * (mc.astype(jnp.float32) * ms) + (1.0 - b1) * g
    qf = _u8_to_f32(nc)
    r = jnp.exp(((qf - 1.0) / _LOG_LEVELS * _LOG_DECADES - _LOG_DECADES) * _LN10)
    nu_prev = jnp.where(qf == 0, 0.0, r) * ns
    nu = b2 * nu_prev + (1.0 - b2) * g * g
    upd = (m / c1) / (jnp.sqrt(nu / c2) + eps)
    p_new = p - lr * (upd + wd * p)

    ms_new = jnp.max(jnp.abs(m), axis=axis, keepdims=True) / 127.0
    ms_safe = jnp.where(ms_new == 0, 1.0, ms_new)
    mc_new = jnp.clip(jnp.round(m / ms_safe), -127, 127).astype(jnp.int8)

    ns_new = jnp.max(nu, axis=axis, keepdims=True)
    ns_safe = jnp.where(ns_new == 0, 1.0, ns_new)
    rq = jnp.clip(nu / ns_safe, 0.0, 1.0)
    logr = jnp.log(jnp.maximum(rq, 10.0 ** (-_LOG_DECADES))) / _LN10
    codes = 1.0 + jnp.round((logr + _LOG_DECADES) / _LOG_DECADES * _LOG_LEVELS)
    nc_new = _f32_to_u8(jnp.where(rq == 0, 0.0, codes))
    return p_new, mc_new, ms_new, nc_new, ns_new


def _kernel3d(
    scal_ref,  # SMEM (4,): lr, 1/c1, 1/c2, g_scale
    p_ref, g_ref, mc_ref, ms_ref, nc_ref, ns_ref,
    p_out, mc_out, ms_out, nc_out, ns_out,
    *, b1: float, b2: float, eps: float, wd: float,
):
    p_new, mc, ms, nc, ns = _update_math(
        scal_ref, p_ref[:], g_ref[:], mc_ref[:], ms_ref[:][..., None],
        nc_ref[:], ns_ref[:][..., None], b1=b1, b2=b2, eps=eps, wd=wd, axis=2,
    )
    p_out[:] = p_new
    mc_out[:] = mc
    ms_out[:] = ms[..., 0]
    nc_out[:] = nc
    ns_out[:] = ns[..., 0]


def _kernel2d(
    scal_ref,
    p_ref, g_ref, mc_ref, ms_ref, nc_ref, ns_ref,
    p_out, mc_out, ms_out, nc_out, ns_out,
    *, b1: float, b2: float, eps: float, wd: float,
):
    p_new, mc, ms, nc, ns = _update_math(
        scal_ref, p_ref[:], g_ref[:], mc_ref[:], ms_ref[:],
        nc_ref[:], ns_ref[:], b1=b1, b2=b2, eps=eps, wd=wd, axis=1,
    )
    p_out[:] = p_new
    mc_out[:] = mc
    ms_out[:] = ms
    nc_out[:] = nc
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
    rows_per_tile: int = 1024,
    interpret: bool = False,
):
    nb = p.shape[0]
    scalars = jnp.stack(
        [
            lr.astype(jnp.float32),
            c1.astype(jnp.float32),
            c2.astype(jnp.float32),
            g_scale.astype(jnp.float32),
        ]
    )
    body = {"b1": b1, "b2": b2, "eps": eps, "wd": wd}
    params = dict(
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )

    if nb % GROUP == 0:
        ng = nb // GROUP
        # scale-tile sublane constraint: rg % 8 == 0 or rg == ng
        rg = max(8, min(rows_per_tile // GROUP, ng)) if ng > 8 else ng
        shape3 = (ng, GROUP, BLOCK)
        row = pl.BlockSpec(
            (rg, GROUP, BLOCK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        sc = pl.BlockSpec((rg, GROUP), lambda i: (i, 0), memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_kernel3d, **body),
            grid=(pl.cdiv(ng, rg),),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), row, row, row, sc,
                      row, sc],
            out_specs=(row, row, sc, row, sc),
            out_shape=(
                jax.ShapeDtypeStruct(shape3, jnp.float32),
                jax.ShapeDtypeStruct(shape3, jnp.int8),
                jax.ShapeDtypeStruct((ng, GROUP), jnp.float32),
                jax.ShapeDtypeStruct(shape3, jnp.uint8),
                jax.ShapeDtypeStruct((ng, GROUP), jnp.float32),
            ),
            **params,
        )(
            scalars,
            p.reshape(shape3),
            g.reshape(shape3),
            m_codes.reshape(shape3),
            m_scale.reshape(ng, GROUP),
            n_codes.reshape(shape3),
            n_scale.reshape(ng, GROUP),
        )
        p2, mc, ms, nc, ns = out
        return (
            p2.reshape(nb, BLOCK),
            mc.reshape(nb, BLOCK),
            ms.reshape(nb, 1),
            nc.reshape(nb, BLOCK),
            ns.reshape(nb, 1),
        )

    # 2D fallback for leaves whose block count is not GROUP-divisible
    r = min(rows_per_tile, nb)
    row = pl.BlockSpec((r, BLOCK), lambda i: (i, 0), memory_space=pltpu.VMEM)
    sc = pl.BlockSpec((r, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel2d, **body),
        grid=(pl.cdiv(nb, r),),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), row, row, row, sc,
                  row, sc],
        out_specs=(row, row, sc, row, sc),
        out_shape=(
            jax.ShapeDtypeStruct(p.shape, jnp.float32),
            jax.ShapeDtypeStruct(m_codes.shape, jnp.int8),
            jax.ShapeDtypeStruct(m_scale.shape, jnp.float32),
            jax.ShapeDtypeStruct(n_codes.shape, jnp.uint8),
            jax.ShapeDtypeStruct(n_scale.shape, jnp.float32),
        ),
        **params,
    )(scalars, p, g, m_codes, m_scale, n_codes, n_scale)
