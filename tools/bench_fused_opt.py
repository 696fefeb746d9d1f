"""Standalone timing of the fused adamw8 kernel: one 52M-param leaf, various
tile sizes. Traffic bound is ~14 bytes/param -> ~0.9 ms for 52M at 819 GB/s.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_fused_opt.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from whisper_finetune_tpu.ops.fused_adamw8 import fused_adamw8_leaf
from whisper_finetune_tpu.optim.quantized import (
    BLOCK,
    quantize_blockwise,
    quantize_log_blockwise,
)


def main():
    n = 32 * 1280 * 1280  # one stacked large-v3 weight leaf
    nb = n // BLOCK
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.standard_normal((nb, BLOCK)) * 0.02, jnp.float32)
    g = jnp.asarray(rng.standard_normal((nb, BLOCK)) * 0.01, jnp.bfloat16)
    mc, ms = quantize_blockwise(np.asarray(p) * 0.1)
    nc, ns = quantize_log_blockwise(np.abs(np.asarray(p)) * 0.01)
    mc, ms = mc.reshape(nb, BLOCK), ms.reshape(nb, 1)
    nc, ns = nc.reshape(nb, BLOCK), ns.reshape(nb, 1)
    one = jnp.asarray(1.0, jnp.float32)

    for rows in (256, 512, 1024, 2048):
        fn = jax.jit(
            lambda *a: fused_adamw8_leaf(
                *a, one * 1e-3, one * 0.1, one * 0.001, one,
                b1=0.9, b2=0.999, eps=1e-8, wd=0.01, rows_per_tile=rows,
            )
        )
        out = fn(p, g, mc, ms, nc, ns)
        jax.block_until_ready(out)
        float(jnp.sum(out[0][:1]))
        t0 = time.time()
        steps = 30
        for _ in range(steps):
            out = fn(p, g, mc, ms, nc, ns)
        float(jnp.sum(out[0][:1]))
        dt = (time.time() - t0) / steps
        gbs = n * 14 / dt / 1e9
        print(f"rows={rows:5d}  {dt*1e3:7.2f} ms   {gbs:6.0f} GB/s effective")


if __name__ == "__main__":
    main()
