"""Time the flagship Muon optimizer update in ISOLATION (its own jit with
donated grads/state/params), versus the raw Newton-Schulz MXU share.

The update program mirrors the train step's optimizer tail exactly:
bf16 accumulator grads -> fp32 cast -> tx.update -> apply_updates, with
everything donated. If this is fast but the in-step delta
(bench_muon_cost.py) is ~3s/opt-step, the problem is program-level
scheduling inside the big step program, not the optimizer math.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_muon_update.py
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import optax

from whisper_finetune_tpu.models import get_preset_dims, init_params
from whisper_finetune_tpu.optim.muon import newton_schulz_orthogonalize
from whisper_finetune_tpu.train.step import partition_params


def make_tx(trainable):
    from whisper_finetune_tpu.optim.optimizers import get_optimizer

    conf = {
        "type": "adamw",
        "muon": True,
        "8bit": False,
        "muon_ndim_threshold": 2,
        "muon_params": {"lr": 2e-5, "momentum": 0.95, "weight_decay": 0.01},
        "params": {"lr": 2e-5, "weight_decay": 0.01, "betas": [0.9, 0.98],
                   "eps": 1e-6},
        "muon_momentum_dtype": "bfloat16",
    }
    tx, _ = get_optimizer(trainable, conf)
    return tx


def sync(tree):
    jax.block_until_ready(tree)
    float(jnp.sum(jax.tree_util.tree_leaves(tree)[0].astype(jnp.float32)))


def timed_repeat(fn, *args, label="", iters=5):
    sync(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.time()
        sync(fn(*args))
        ts.append(time.time() - t0)
    print(f"{label:42s} {min(ts)*1e3:8.1f} ms", flush=True)
    return min(ts)


def main():
    dims = get_preset_dims("large-v3")
    params = init_params(jax.random.PRNGKey(0), dims)
    trainable, frozen = partition_params(params, None)
    del params, frozen
    tx = make_tx(trainable)

    sq = jax.random.normal(jax.random.PRNGKey(2), (32, 1280, 1280), jnp.float32)
    fc = jax.random.normal(jax.random.PRNGKey(3), (32, 1280, 5120), jnp.float32)
    ns = jax.jit(newton_schulz_orthogonalize)
    t_sq = timed_repeat(ns, sq, label="NS 5-iter (32,1280,1280)")
    t_fc = timed_repeat(ns, fc, label="NS 5-iter (32,1280,5120)")
    del sq, fc
    print(f"NS share extrapolation 12*sq+4*fc = "
          f"{(12 * t_sq + 4 * t_fc) * 1e3:.0f} ms", flush=True)

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def opt_tail(g_acc, opt_state, p):
        g = jax.tree_util.tree_map(lambda x: x.astype(jnp.float32), g_acc)
        updates, new_state = tx.update(g, opt_state, p)
        return optax.apply_updates(p, updates), new_state

    def fresh_grads(p_tree):
        return jax.tree_util.tree_map(
            lambda p: (jax.random.normal(jax.random.PRNGKey(1), p.shape,
                                         jnp.bfloat16) * 1e-3),
            p_tree,
        )

    opt_state = tx.init(trainable)
    p = trainable
    # compile + warmup (donates; outputs chain into the next call)
    g = fresh_grads(p)
    sync(g)
    p, opt_state = opt_tail(g, opt_state, p)
    sync(p)
    ts = []
    for _ in range(3):
        g = fresh_grads(p)
        sync(g)
        t0 = time.time()
        p, opt_state = opt_tail(g, opt_state, p)
        sync(p)
        ts.append(time.time() - t0)
    print(f"{'full muon opt tail (cast+update+apply)':42s} "
          f"{min(ts)*1e3:8.1f} ms (single dispatch, RPC-inflated)",
          flush=True)


if __name__ == "__main__":
    main()
