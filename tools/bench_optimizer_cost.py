"""Isolate the optimizer's share of the real train step: time the full jitted
step (make_train_step, donated buffers) with adamw_8bit vs plain SGD — the
difference is the 8-bit update + quant/dequant cost inside the program.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_optimizer_cost.py [impl] [batch]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax


def bench_step(tx, label, impl, batch):
    from whisper_finetune_tpu.models import ForwardConfig, get_preset_dims, init_params
    from whisper_finetune_tpu.ops.spec_augment import FeaturizeConfig
    from whisper_finetune_tpu.parallel import get_data_mesh
    from whisper_finetune_tpu.train.step import (
        TrainState,
        make_train_step,
        partition_params,
        shard_batch,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    dims = get_preset_dims("large-v3")
    params = init_params(jax.random.PRNGKey(0), dims)
    trainable, frozen = partition_params(params, None)
    del params
    mesh = get_data_mesh()
    state = TrainState(trainable, frozen, tx.init(trainable), jnp.zeros((), jnp.int32))
    state = jax.device_put(state, NamedSharding(mesh, P()))

    if "," in impl:
        enc, dec, cross = impl.split(",")
        fcfg = ForwardConfig(
            compute_dtype="bfloat16",
            attn_impl_encoder=enc, attn_impl_decoder=dec, attn_impl_cross=cross,
        )
    else:
        fcfg = ForwardConfig(compute_dtype="bfloat16", attn_impl=impl)
    feat = FeaturizeConfig(n_mels=dims.n_mels, spec_augment=True, p=1.0)
    step_fn = make_train_step(
        mesh, dims, fcfg, tx, 0.1, feat_cfg=feat, max_grad_norm=1.0,
        accum_dtype="bfloat16",
    )

    rng = np.random.default_rng(0)
    data = shard_batch(
        mesh,
        {
            "audio": jnp.asarray(
                (rng.standard_normal((1, batch, 480000)) * 0.05).astype(np.float32)
            ),
            "crop_frames": jnp.full((1, batch), 3000, jnp.int32),
            "dec_input": jnp.asarray(
                rng.integers(0, dims.n_vocab, (1, batch, 448)).astype(np.int32)
            ),
            "dec_output": jnp.asarray(
                rng.integers(0, dims.n_vocab, (1, batch, 448)).astype(np.int32)
            ),
        },
    )
    key = jax.random.PRNGKey(0)
    for _ in range(3):
        state, loss = step_fn(state, data, key)
    float(loss)
    t0 = time.time()
    steps = 10
    for _ in range(steps):
        state, loss = step_fn(state, data, key)
    float(loss)
    dt = (time.time() - t0) / steps
    print(f"  {label:24s} step {dt*1e3:8.1f} ms")
    return dt


def main():
    impl = sys.argv[1] if len(sys.argv) > 1 else "xla"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    from whisper_finetune_tpu.optim.quantized import adamw_8bit

    print(f"impl={impl} B={batch}")
    t_sgd = bench_step(optax.sgd(1e-5), "sgd (floor)", impl, batch)
    t_8bit = bench_step(adamw_8bit(2e-5, weight_decay=0.01), "adamw_8bit", impl, batch)
    print(f"  8-bit optimizer share {1e3*(t_8bit - t_sgd):8.1f} ms")


if __name__ == "__main__":
    main()
