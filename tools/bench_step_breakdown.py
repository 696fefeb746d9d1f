"""Where does the train step's time go? Times each stage of the large-v3
step separately on the real chip: featurize, encoder fwd, decoder fwd, loss,
full fwd, full grad, optimizer update — for a given attention impl.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_step_breakdown.py [xla|splash|flash]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax


def timeit(fn, *args, steps=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jnp.sum(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32).item()
    t0 = time.time()
    for _ in range(steps):
        out = fn(*args)
    jnp.sum(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32).item()
    return (time.time() - t0) / steps


def main():
    impl = sys.argv[1] if len(sys.argv) > 1 else "xla"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    from whisper_finetune_tpu.models import ForwardConfig, get_preset_dims, init_params
    from whisper_finetune_tpu.models.whisper import (
        decoder_forward,
        encoder_forward,
        forward_impl,
    )
    from whisper_finetune_tpu.ops.spec_augment import FeaturizeConfig, featurize_impl
    from whisper_finetune_tpu.optim.quantized import adamw_8bit
    from whisper_finetune_tpu.train.step import cross_entropy_loss

    dims = get_preset_dims("large-v3")
    fcfg = ForwardConfig(compute_dtype="bfloat16", attn_impl=impl)
    feat = FeaturizeConfig(n_mels=dims.n_mels, spec_augment=True, p=1.0)
    params = init_params(jax.random.PRNGKey(0), dims)

    rng = np.random.default_rng(0)
    audio = jnp.asarray((rng.standard_normal((B, 480000)) * 0.05), jnp.float32)
    crop = jnp.full((B,), 3000, jnp.int32)
    tokens = jnp.asarray(rng.integers(0, dims.n_vocab, (B, 448)), jnp.int32)
    targets = jnp.asarray(rng.integers(0, dims.n_vocab, (B, 448)), jnp.int32)
    key = jax.random.PRNGKey(0)

    feat_fn = jax.jit(lambda a, c, k: featurize_impl(a, c, k, feat, train=True))
    mel = feat_fn(audio, crop, key)
    print(f"impl={impl} B={B}")
    print(f"  featurize            {timeit(feat_fn, audio, crop, key)*1e3:8.1f} ms")

    enc_fn = jax.jit(
        lambda p, m, k: encoder_forward(p, m, dims, fcfg, k, train=True)
    )
    xa = enc_fn(params, mel, key)
    print(f"  encoder fwd (remat)  {timeit(enc_fn, params, mel, key)*1e3:8.1f} ms")

    dec_fn = jax.jit(
        lambda p, t, xa, k: decoder_forward(p, t, xa, dims, fcfg, k, train=True)
    )
    print(f"  decoder fwd (remat)  {timeit(dec_fn, params, tokens, xa, key)*1e3:8.1f} ms")

    def loss_fn(p, a, c, t, y, k):
        m = featurize_impl(a, c, k, feat, train=True)
        logits = forward_impl(p, m, t, dims, fcfg, rng=k, train=True)
        return cross_entropy_loss(logits, y, 0.1)

    fwd_fn = jax.jit(loss_fn)
    print(f"  full fwd+loss        {timeit(fwd_fn, params, audio, crop, tokens, targets, key)*1e3:8.1f} ms")
    del xa, mel  # free HBM before the grad pass

    # bf16 grad outputs, like the real step's bf16 accumulator (the fp32
    # tree transiently exists inside XLA but the output buffer is half).
    grad_fn = jax.jit(
        lambda *a: jax.tree_util.tree_map(
            lambda g: g.astype(jnp.bfloat16), jax.grad(loss_fn)(*a)
        )
    )
    t_grad = timeit(grad_fn, params, audio, crop, tokens, targets, key)
    print(f"  full grad            {t_grad*1e3:8.1f} ms")

    # Per-side grads to localize the backward cost.
    def enc_loss(p, m, k):
        return jnp.sum(encoder_forward(p, m, dims, fcfg, k, train=True) ** 2)

    mel2 = feat_fn(audio, crop, key)
    enc_grad = jax.jit(
        lambda *a: jax.tree_util.tree_map(
            lambda g: g.astype(jnp.bfloat16), jax.grad(enc_loss)(*a)
        )
    )
    print(f"  encoder grad         {timeit(enc_grad, params, mel2, key)*1e3:8.1f} ms")
    del mel2

    # CE loss fwd+bwd alone at full vocab.
    logits = jnp.zeros((B, 448, dims.n_vocab), jnp.bfloat16)
    ce = jax.jit(
        jax.grad(lambda l, y: cross_entropy_loss(l.astype(jnp.float32), y, 0.1))
    )
    print(f"  CE grad (full vocab) {timeit(ce, logits, targets)*1e3:8.1f} ms")
    del logits

    # Optimizer update, donated like the real step.
    tx = adamw_8bit(2e-5, weight_decay=0.01)
    opt_state = tx.init(params)
    grads = grad_fn(params, audio, crop, tokens, targets, key)

    def upd(g, s, p):
        g32 = jax.tree_util.tree_map(lambda x: x.astype(jnp.float32), g)
        u, s2 = tx.update(g32, s, p)
        return optax.apply_updates(p, u), s2

    upd2 = jax.jit(upd, donate_argnums=(1, 2))
    # donation consumes the buffers; re-feed outputs each iteration
    p2, s2 = params, opt_state
    for _ in range(2):
        p2, s2 = upd2(grads, s2, p2)
    t0 = time.time()
    steps_u = 6
    for _ in range(steps_u):
        p2, s2 = upd2(grads, s2, p2)
    jnp.sum(jax.tree_util.tree_leaves(p2)[0]).item()
    t_upd = (time.time() - t0) / steps_u
    print(f"  optimizer update     {t_upd*1e3:8.1f} ms")
    del opt_state, params, grads

    # Pure-matmul MFU ceiling at the MLP shape.
    a = jnp.zeros((B * 1500, 1280), jnp.bfloat16)
    w1 = jnp.zeros((1280, 5120), jnp.bfloat16)
    w2 = jnp.zeros((5120, 1280), jnp.bfloat16)
    mm = jax.jit(lambda a, w1, w2: (a @ w1) @ w2)
    t_mm = timeit(mm, a, w1, w2, steps=30)
    mm_flops = 2 * a.shape[0] * 1280 * 5120 * 2
    print(f"  matmul ceiling       {mm_flops / t_mm / 1e12:8.1f} TFLOP/s")

    # FLOP-based MFU estimate for the grad step (fwd+bwd+remat ~ 4x fwd).
    sys.path.insert(0, "/root/repo")
    import bench as bench_mod

    flops = bench_mod._flops_per_sample(dims) * B * 4
    print(f"  grad-step TFLOP/s    {flops / t_grad / 1e12:8.1f}  "
          f"(~{flops / t_grad / 1e12 / 197 * 100:.0f}% of v5e bf16 peak)")


if __name__ == "__main__":
    main()
