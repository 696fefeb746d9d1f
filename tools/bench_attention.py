"""Micro-benchmark of attention implementations on the real chip.

Times forward and forward+backward for Whisper's three attention shapes
(encoder self 1500x1500, decoder self 448x448 causal, cross 448x1500) across
the XLA einsum path, the legacy Pallas flash kernel, and splash attention.
Used to pick ops/attention.py defaults; run serially (one chip, one process).
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]).astype(jnp.float32))


def timeit(fn, *args, steps=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(steps):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / steps


def bench_impl(name, impl_fn, q, k, v, causal):
    fwd = jax.jit(impl_fn)
    t_fwd = timeit(fwd, q, k, v)

    def loss(q, k, v):
        return jnp.sum(impl_fn(q, k, v).astype(jnp.float32))

    bwd = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    t_bwd = timeit(bwd, q, k, v)
    print(f"  {name:28s} fwd {t_fwd*1e3:8.2f} ms   fwd+bwd {t_bwd*1e3:8.2f} ms")
    return t_fwd, t_bwd


def main():
    import importlib

    A = importlib.import_module("whisper_finetune_tpu.ops.attention")

    rng = np.random.default_rng(0)
    B, H, D = 6, 20, 64
    shapes = [
        ("encoder self 1500", 1500, 1500, False),
        ("decoder self 448 causal", 448, 448, True),
        ("cross 448x1500", 448, 1500, False),
    ]
    for label, Tq, Tk, causal in shapes:
        q = jnp.asarray(rng.standard_normal((B, H, Tq, D)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, H, Tk, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, H, Tk, D)), jnp.bfloat16)
        scale = float(D) ** -0.5
        print(f"{label}  (B={B} H={H} D={D}, bf16)")

        bench_impl(
            "xla", partial(A.xla_mha, causal=causal, sm_scale=scale), q, k, v, causal
        )
        try:
            bench_impl(
                "flash(legacy)",
                partial(A.flash_mha, causal=causal, sm_scale=scale),
                q, k, v, causal,
            )
        except Exception as e:
            print(f"  flash(legacy) failed: {type(e).__name__}: {e}")
        for variant in A.SPLASH_VARIANTS:
            try:
                bench_impl(
                    f"splash[{variant}]",
                    partial(
                        A.splash_mha, causal=causal, sm_scale=scale, variant=variant
                    ),
                    q, k, v, causal,
                )
            except Exception as e:
                print(f"  splash[{variant}] failed: {type(e).__name__}: {e}")
        try:
            bench_impl(
                "flash fwd + xla bwd",
                partial(A.flash_fwd_xla_bwd, causal=causal, sm_scale=scale),
                q, k, v, causal,
            )
        except Exception as e:
            print(f"  flash_fwd_xla_bwd failed: {type(e).__name__}: {e}")
        print()


if __name__ == "__main__":
    main()
