"""Compile BOTH split-step programs (accumulation + optimizer update) for
the Muon flagship abstractly — no buffers allocated — and print XLA's
memory analyses.

This is the HBM-budget instrument for the split-update work
(train/step.py split mode, train/manual_grad.py): the accumulation
program must fit next to the resident fp32 master weights + compressed
optimizer state on a 16 GB chip, and the update program's temps must fit
next to the same residents. ``peak`` here is the worst-case
args+temp+unaliased-out figure XLA reports for ONE program; the split
design guarantees the two programs never run concurrently
(train/step.py split_step retires each before enqueueing the next).

Env knobs:
    WFT_ACCUM          global accumulation window   (default 8)
    WFT_BATCH          per-device batch             (default 6)
    WFT_MANUAL         1 = manual backward          (default 0)
    WFT_MANUAL_PRECAST 1 = precast block shadow     (default 0)
    WFT_PRECAST        0 = slice-cast automatic fwd (default 1)
    WFT_TX             muon (default) | adamw8 — which optimizer's split
                       programs to compile

Usage: PYTHONPATH=/root/repo python tools/probe_split_memory.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench
from whisper_finetune_tpu.models import ForwardConfig, get_preset_dims, init_params
from whisper_finetune_tpu.ops.attention import resolve_auto_impls
from whisper_finetune_tpu.ops.spec_augment import FeaturizeConfig
from whisper_finetune_tpu.parallel import get_data_mesh
from whisper_finetune_tpu.train.step import (
    TrainState,
    make_train_step,
    partition_params,
)


def report(tag, compiled):
    ma = compiled.memory_analysis()
    tot = (
        ma.argument_size_in_bytes
        + ma.temp_size_in_bytes
        + ma.output_size_in_bytes
        - ma.alias_size_in_bytes
    )
    print(
        f"{tag}: args {ma.argument_size_in_bytes/2**30:.2f} GiB, "
        f"out {ma.output_size_in_bytes/2**30:.2f}, "
        f"alias {ma.alias_size_in_bytes/2**30:.2f}, "
        f"temp {ma.temp_size_in_bytes/2**30:.2f}, "
        f"peak(args+temp+unaliased-out) {tot/2**30:.2f} GiB",
        flush=True,
    )


def main():
    accum = int(os.environ.get("WFT_ACCUM", 8))
    batch = int(os.environ.get("WFT_BATCH", 6))
    manual = os.environ.get("WFT_MANUAL", "0") == "1"
    manual_precast = os.environ.get("WFT_MANUAL_PRECAST", "0") == "1"
    precast = os.environ.get("WFT_PRECAST", "1") == "1"
    tx_name = os.environ.get("WFT_TX", "muon")

    dims = get_preset_dims("large-v3")
    params = jax.eval_shape(lambda k: init_params(k, dims), jax.random.PRNGKey(0))
    trainable, frozen = partition_params(params, None)
    if tx_name == "adamw8":
        # The primary workload's optimizer (silver-hill.yaml trains 8-bit
        # AdamW at accum_grad_steps 8 — same split-step fit question).
        from whisper_finetune_tpu.optim.quantized import adamw_8bit

        tx = adamw_8bit(2e-5, weight_decay=0.01)
    else:
        tx = bench._muon_flagship_tx(trainable)
    opt_state = jax.eval_shape(tx.init, trainable)
    state = TrainState(
        trainable, frozen, opt_state, jax.ShapeDtypeStruct((), jnp.int32)
    )

    mesh = get_data_mesh()
    fcfg = ForwardConfig(
        compute_dtype="bfloat16",
        precast_weights=precast,
        **dict(resolve_auto_impls()),
    )
    feat = FeaturizeConfig(n_mels=dims.n_mels, spec_augment=True, p=1.0)
    step_fn = make_train_step(
        mesh, dims, fcfg, tx, 0.1, feat_cfg=feat, max_grad_norm=1.0,
        accum_dtype="bfloat16", split_update=True,
        manual_backward=manual, manual_precast=manual_precast,
    )
    data = {
        "audio": jax.ShapeDtypeStruct((accum, batch, 480000), jnp.float32),
        "crop_frames": jax.ShapeDtypeStruct((accum, batch), jnp.int32),
        "dec_input": jax.ShapeDtypeStruct((accum, batch, 448), jnp.int32),
        "dec_output": jax.ShapeDtypeStruct((accum, batch, 448), jnp.int32),
    }
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)

    grads = jax.tree_util.tree_map(
        lambda l: jax.ShapeDtypeStruct(l.shape, jnp.bfloat16), trainable
    )
    tag = (
        f"tx={tx_name} accum={accum} B={batch} manual={int(manual)}"
        f" mprecast={int(manual_precast)}"
    )
    acc = step_fn.accum_jit.lower(state, data, key, grads).compile()
    report(f"accum  [{tag}]", acc)
    g_scale = jax.ShapeDtypeStruct((), jnp.float32)
    upd = step_fn.update_jit.lower(state, grads, g_scale).compile()
    report(f"update [{tag}]", upd)


if __name__ == "__main__":
    main()
