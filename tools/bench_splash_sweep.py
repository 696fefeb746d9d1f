"""Sweep splash-attention BlockSizes/QKVLayout for Whisper's shapes on the
real chip.

The encoder backward is the step's worst-MFU section (~400ms of the 973ms
round-2 step at ~40% of measured peak), and splash attention is ~20% of
encoder FLOPs but a larger share of its runtime. This sweeps the kernel's
tuning axes — forward blocks, backward (dkv/dq) blocks, inner compute
blocking, fused vs split backward, and SEQ_MINOR layouts — on the padded
encoder shape, then spot-checks the winner on the cross/decoder shapes.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python tools/bench_splash_sweep.py > /tmp/splash_sweep.log 2>&1
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental.pallas.ops.tpu.splash_attention import (
    splash_attention_kernel as sk,
    splash_attention_mask as sm,
)

QKVLayout = sk.QKVLayout


def timeit(fn, *args, steps=12, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(steps):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    return (time.time() - t0) / steps


def make_kernel(H, Tq, Tk, causal, block_sizes):
    valid = np.zeros((Tq, Tk), dtype=bool)
    valid[:, :] = np.tril(np.ones((Tq, Tk), dtype=bool)) if causal else True
    mask = sm.MultiHeadMask([sm.NumpyMask(valid) for _ in range(H)])
    return sk.make_splash_mha(
        mask, block_sizes=block_sizes, head_shards=1, q_seq_shards=1
    )


def bench_case(label, B, H, Tq, Tk, D, causal, bs):
    try:
        kernel = make_kernel(H, Tq, Tk, causal, bs)
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((B, H, Tq, D)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, H, Tk, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, H, Tk, D)), jnp.bfloat16)

        fwd = jax.jit(jax.vmap(kernel))
        t_fwd = timeit(fwd, q, k, v)

        def loss(q, k, v):
            return jnp.sum(jax.vmap(kernel)(q, k, v).astype(jnp.float32))

        bwd = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        t_bwd = timeit(bwd, q, k, v)
        print(
            f"RESULT {label}: fwd {t_fwd*1e3:7.2f} ms   fwd+bwd "
            f"{t_bwd*1e3:7.2f} ms",
            flush=True,
        )
        return t_bwd
    except Exception as e:  # noqa: BLE001
        print(f"RESULT {label}: FAILED {type(e).__name__}: {e}", flush=True)
        return float("inf")


def main():
    B, H, D = 6, 20, 64
    Tq = Tk = 1536  # padded encoder extent

    HDM, SEQM = QKVLayout.HEAD_DIM_MINOR, QKVLayout.SEQ_MINOR
    enc_cases = {
        # round-2 shipped configuration
        "ship_fused_512_1536": sk.BlockSizes(
            block_q=512, block_kv=1536, block_q_dkv=512, block_kv_dkv=1536,
            use_fused_bwd_kernel=True,
        ),
        "fused_512_1536_c512": sk.BlockSizes(
            block_q=512, block_kv=1536, block_kv_compute=512,
            block_q_dkv=512, block_kv_dkv=1536, block_kv_dkv_compute=512,
            use_fused_bwd_kernel=True,
        ),
        "fused_1536_1536": sk.BlockSizes(
            block_q=1536, block_kv=1536, block_q_dkv=1536,
            block_kv_dkv=1536, use_fused_bwd_kernel=True,
        ),
        "fused_768_1536": sk.BlockSizes(
            block_q=768, block_kv=1536, block_q_dkv=768, block_kv_dkv=1536,
            use_fused_bwd_kernel=True,
        ),
        "fused_256_1536": sk.BlockSizes(
            block_q=256, block_kv=1536, block_q_dkv=256, block_kv_dkv=1536,
            use_fused_bwd_kernel=True,
        ),
        "fused_512_768": sk.BlockSizes(
            block_q=512, block_kv=768, block_q_dkv=512, block_kv_dkv=768,
            use_fused_bwd_kernel=True,
        ),
        "split_512_1536": sk.BlockSizes(
            block_q=512, block_kv=1536, block_q_dkv=512, block_kv_dkv=1536,
            block_q_dq=512, block_kv_dq=1536,
        ),
        "split_1536_512dq": sk.BlockSizes(
            block_q=512, block_kv=1536, block_q_dkv=1536, block_kv_dkv=512,
            block_q_dq=512, block_kv_dq=1536,
        ),
        "fused_kv_seqminor": sk.BlockSizes(
            block_q=512, block_kv=1536, block_q_dkv=512, block_kv_dkv=1536,
            use_fused_bwd_kernel=True, k_layout=SEQM, v_layout=SEQM,
        ),
        "fused_all_seqminor": sk.BlockSizes(
            block_q=512, block_kv=1536, block_q_dkv=512, block_kv_dkv=1536,
            use_fused_bwd_kernel=True, q_layout=SEQM, k_layout=SEQM,
            v_layout=SEQM,
        ),
    }
    print(f"== encoder self ({B},{H},{Tq},{D}) ==", flush=True)
    results = {}
    for label, bs in enc_cases.items():
        results[label] = bench_case(label, B, H, Tq, Tk, D, False, bs)
    best = min(results, key=results.get)
    print(f"BEST encoder: {best} ({results[best]*1e3:.2f} ms)", flush=True)

    # cross-attention shape (decoder queries over encoder keys)
    print(f"== cross ({B},{H},512x1536,{D}) ==", flush=True)
    cross_cases = {
        "ship_fused_512_1536": sk.BlockSizes(
            block_q=512, block_kv=1536, block_q_dkv=512, block_kv_dkv=1536,
            use_fused_bwd_kernel=True,
        ),
        "fused_512_768": sk.BlockSizes(
            block_q=512, block_kv=768, block_q_dkv=512, block_kv_dkv=768,
            use_fused_bwd_kernel=True,
        ),
    }
    for label, bs in cross_cases.items():
        bench_case(label, B, H, 512, 1536, D, False, bs)

    # decoder self (causal)
    print(f"== decoder self causal ({B},{H},512,{D}) ==", flush=True)
    dec_cases = {
        "ship_fused_512_512": sk.BlockSizes(
            block_q=512, block_kv=512, block_q_dkv=512, block_kv_dkv=512,
            use_fused_bwd_kernel=True,
        ),
        "fused_256_512": sk.BlockSizes(
            block_q=256, block_kv=512, block_q_dkv=256, block_kv_dkv=512,
            use_fused_bwd_kernel=True,
        ),
    }
    for label, bs in dec_cases.items():
        bench_case(label, B, H, 512, 512, D, True, bs)


if __name__ == "__main__":
    main()
