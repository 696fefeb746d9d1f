"""Probe: can int8 MXU matmuls accelerate Muon's Newton-Schulz iteration?

Measures, in-graph (lax.fori_loop inside one jit, per the axon RPC-dispatch
gotcha), at the flagship NS shapes (32-layer stacked large-v3 leaves):

  1. bf16 batched matmul throughput (the NS baseline),
  2. int8 batched matmul throughput (the candidate 2x),
  3. the full 5-iteration NS in bf16 (absolute cost per leaf family),
  4. an int8-hybrid NS (quantized first iterations, bf16 polish) + its
     orthogonality error vs the bf16 reference.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_ns_probe.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from whisper_finetune_tpu.optim.muon import (
    _NS_COEFFS,
    newton_schulz_orthogonalize,
)


def timed(fn, *args, iters=8, label=""):
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out.astype(jnp.float32)))  # hard sync
    t0 = time.time()
    out = jax.jit(fn)(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.time() - t0) / iters
    print(f"{label}: {dt*1000:.2f} ms/iter-group", flush=True)
    return dt


def loop_matmul(x, y, iters):
    def body(_, c):
        a, b = c
        return (jnp.matmul(a, b, preferred_element_type=a.dtype), b)

    return jax.lax.fori_loop(0, iters, body, (x, y))[0]


def loop_matmul_i8(x8, y8, iters):
    def body(_, acc):
        r = jax.lax.dot_general(
            x8, y8, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )
        return acc + r[:, :8, :8].astype(jnp.int32).sum()

    return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.int32))


def ns_int8_hybrid(g, steps_q=4, steps_f=1):
    """NS with per-matrix int8 quantized matmuls for the first iterations,
    bf16 for the last. Values stay in ~[-1.5, 1.5] through the iteration,
    so one static scale per matmul suffices."""
    a, b, c = _NS_COEFFS
    transpose = g.shape[-2] > g.shape[-1]
    x = jnp.swapaxes(g, -2, -1) if transpose else g
    x = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(x * x, axis=(-2, -1), keepdims=True))
    x = x / (norm + 1e-7)

    def q(m, bound):
        s = bound / 127.0
        return jnp.clip(jnp.round(m / s), -127, 127).astype(jnp.int8), s

    def iter_q(x):
        # x entries bounded ~1.5 through NS; xxt/bxx bounded by spectral
        # bounds of the quintic (empirically < 4)
        x8, sx = q(x, 1.8)
        xxt = jax.lax.dot_general(
            x8, x8, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * (sx * sx)
        x8t, st = q(xxt, 4.0)
        xxt2 = jax.lax.dot_general(
            x8t, x8t, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * (st * st)
        bxx = b * xxt + c * xxt2
        b8, sb = q(bxx, 8.0)
        upd = jax.lax.dot_general(
            b8, x8, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * (sb * sx)
        return a * x + upd

    def iter_f(x):
        xb = x.astype(jnp.bfloat16)
        xxt = jnp.matmul(xb, jnp.swapaxes(xb, -2, -1),
                         preferred_element_type=jnp.bfloat16)
        bxx = b * xxt + c * jnp.matmul(xxt, xxt,
                                       preferred_element_type=jnp.bfloat16)
        return (a * xb + jnp.matmul(bxx, xb,
                                    preferred_element_type=jnp.bfloat16)
                ).astype(jnp.float32)

    for _ in range(steps_q):
        x = iter_q(x)
    for _ in range(steps_f):
        x = iter_f(x)
    x = jnp.swapaxes(x, -2, -1) if transpose else x
    return x.astype(g.dtype)


def ortho_err(o):
    o = o.astype(jnp.float32)
    if o.shape[-2] > o.shape[-1]:
        o = jnp.swapaxes(o, -2, -1)
    eye = jnp.eye(o.shape[-2])
    g = jnp.matmul(o, jnp.swapaxes(o, -2, -1))
    return float(jnp.max(jnp.abs(g - eye)))


def main():
    rng = np.random.default_rng(0)
    sq = jnp.asarray(rng.standard_normal((32, 1280, 1280)).astype(np.float32))
    fc = jnp.asarray(rng.standard_normal((32, 1280, 5120)).astype(np.float32))

    ITERS = 8
    bf = sq.astype(jnp.bfloat16)
    timed(lambda x: loop_matmul(x, jnp.swapaxes(x, -2, -1), ITERS), bf,
          label=f"bf16 (32,1280,1280)@T x{ITERS}")
    i8 = jnp.clip(jnp.round(sq * 10), -127, 127).astype(jnp.int8)
    timed(lambda x: loop_matmul_i8(x, jnp.swapaxes(x, -2, -1), ITERS), i8,
          label=f"int8 (32,1280,1280)@T x{ITERS}")

    for name, leaf in (("square", sq), ("fc", fc)):
        t_bf = timed(
            lambda x: newton_schulz_orthogonalize(x), leaf,
            label=f"NS bf16 5-iter {name}")
        t_q = timed(
            lambda x: ns_int8_hybrid(x), leaf,
            label=f"NS int8-hybrid (4q+1f) {name}")
        e_bf = ortho_err(newton_schulz_orthogonalize(leaf))
        e_q = ortho_err(ns_int8_hybrid(leaf))
        print(
            f"{name}: bf16 {t_bf*1000:.1f} ms err={e_bf:.3f} | "
            f"hybrid {t_q*1000:.1f} ms err={e_q:.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
