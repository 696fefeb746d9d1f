"""Measure the flagship train step under a ladder of remat/attention
configurations on the real chip.

Each case compiles a fresh XLA program (~5-15 min each through the remote
compile service), so cases are ordered most-promising-first and every
result is flushed to stdout as soon as it lands. OOM at compile time is
caught and logged — the ladder continues.

Usage:  PYTHONPATH=/root/repo python tools/bench_remat_ladder.py [case ...]
        (no args = all cases)
"""

import os
import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np
import optax


def bench_case(label: str, batch: int, fcfg_overrides: dict,
               steps: int = 8, warmup: int = 3, unroll: int = 1,
               accum: int = 1) -> None:
    from whisper_finetune_tpu.models import (
        ForwardConfig,
        get_preset_dims,
        init_params,
    )
    from whisper_finetune_tpu.ops.attention import resolve_auto_impls
    from whisper_finetune_tpu.ops.spec_augment import FeaturizeConfig
    from whisper_finetune_tpu.optim.quantized import adamw_8bit
    from whisper_finetune_tpu.parallel import get_data_mesh
    from whisper_finetune_tpu.train.step import (
        TrainState,
        make_train_step,
        partition_params,
        shard_batch,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    t_start = time.time()
    dims = get_preset_dims("large-v3")
    params = init_params(jax.random.PRNGKey(0), dims)
    trainable, frozen = partition_params(params, None)

    mesh = get_data_mesh()
    tx = adamw_8bit(2e-5, weight_decay=0.01)
    state = TrainState(
        trainable, frozen, tx.init(trainable), jnp.zeros((), jnp.int32)
    )
    state = jax.device_put(state, NamedSharding(mesh, P()))

    fkw = dict(resolve_auto_impls())
    fkw.update(fcfg_overrides)
    fcfg = ForwardConfig(compute_dtype="bfloat16", **fkw)
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
                (rng.standard_normal((accum, batch, 480000)) * 0.05).astype(
                    np.float32
                )
            ),
            "crop_frames": jnp.full((accum, batch), 3000, jnp.int32),
            "dec_input": jnp.asarray(
                rng.integers(
                    0, dims.n_vocab, (accum, batch, 448)
                ).astype(np.int32)
            ),
            "dec_output": jnp.asarray(
                rng.integers(
                    0, dims.n_vocab, (accum, batch, 448)
                ).astype(np.int32)
            ),
        },
    )
    key = jax.random.PRNGKey(0)

    if unroll > 1:
        # N steps inlined into ONE XLA program: the scheduler can overlap
        # step k's trailing optimizer updates with step k+1's early forward
        # (the params a layer reads first are updated long before the big
        # decoder/mlp leaves finish their one-pass updates).
        inner = step_fn

        def unrolled(state, data, key):
            for j in range(unroll):
                state, loss = inner(state, data, jax.random.fold_in(key, j))
            return state, loss

        step_fn = jax.jit(unrolled, donate_argnums=(0,))

    for _ in range(warmup):
        state, loss = step_fn(state, data, key)
    float(loss)
    compile_s = time.time() - t_start
    t0 = time.time()
    for _ in range(steps):
        state, loss = step_fn(state, data, key)
    final_loss = float(loss)
    dt = (time.time() - t0) / steps / unroll
    assert np.isfinite(final_loss)
    hbm_peak = None
    try:
        stats = jax.local_devices()[0].memory_stats()
        hbm_peak = round(stats.get("peak_bytes_in_use", 0) / 2**30, 2)
    except Exception:
        pass
    audio_hps = accum * batch * 30.0 / 3600.0 / dt
    print(
        f"RESULT {label}: step={dt*1000:.1f} ms  audio-h/s={audio_hps:.4f}"
        f"  batch={batch}  accum={accum}  peak_hbm={hbm_peak} GiB"
        f"  (setup+compile {compile_s:.0f}s)",
        flush=True,
    )


CASES = {
    # round-2 shipped configuration (should reproduce 973 ms from cache)
    "base": (6, {}),
    # decoder-side selective remat (dec self-attn probs are the only
    # "attn_probs"-named tensor on TPU: the encoder runs splash)
    "save_dec_probs": (6, {"remat_policy": "save:attn_probs"}),
    "save_dec_proj": (6, {"remat_policy": "save:dec_qkv,dec_mlp_h"}),
    "save_dec_probs_qkv": (6, {"remat_policy": "save:attn_probs,dec_qkv"}),
    "save_dec_qkv": (6, {"remat_policy": "save:dec_qkv"}),
    "save_dec_lns": (
        6, {"remat_policy": "save:dec_ln1,dec_ln2,dec_ln_cross"},
    ),
    "save_dec_qkv_lns": (
        6, {"remat_policy": "save:dec_qkv,dec_ln1,dec_ln2,dec_ln_cross"},
    ),
    "save_cross_kv": (6, {"remat_policy": "save:cross_q,cross_kv"}),
    # kernel mix: cross-attention probs (161MB bf16/layer) are the biggest
    # HBM tensors in the decoder — splash materializes nothing
    "cross_splash": (6, {"attn_impl_cross": "splash"}),
    "dec_all_splash": (
        6,
        {"attn_impl_cross": "splash", "attn_impl_decoder": "splash"},
    ),
    "cross_splash_save_dec": (
        6,
        {
            "attn_impl_cross": "splash",
            "remat_policy": "save:dec_qkv,dec_mlp_h",
        },
    ),
    "cross_splash_save_qkv": (
        6,
        {"attn_impl_cross": "splash", "remat_policy": "save:dec_qkv"},
    ),
    # trade the resident bf16 weight copy (~3.1GB) for activation saves
    "nocast_save_dec": (
        6,
        {
            "precast_weights": False,
            "remat_policy": "save:attn_probs,dec_qkv,dec_mlp_h",
        },
    ),
    "nocast_save_enc_qkv": (
        6,
        {"precast_weights": False, "remat_policy": "save:enc_qkv,dec_qkv"},
    ),
    # nocast + big save-sets: with the barriered per-layer cast
    # (models/whisper.py _cast_block_slice) precast_weights=False now truly
    # frees the ~3.1 GB resident bf16 tree (it used to be hoisted back),
    # which pays for save-sets that were OOM in the round-3 ladder
    "nocast_save_probs": (
        6,
        {"precast_weights": False, "remat_policy": "save:attn_probs"},
    ),
    "nocast_save_cross": (
        6,
        {"precast_weights": False, "remat_policy": "save:cross_q,cross_kv"},
    ),
    "cs_nocast_save_probs": (
        6,
        {
            "attn_impl_cross": "splash",
            "precast_weights": False,
            "remat_policy": "save:attn_probs",
        },
    ),
    "cs_nocast_save_probs_qkv": (
        6,
        {
            "attn_impl_cross": "splash",
            "precast_weights": False,
            "remat_policy": "save:attn_probs,dec_qkv,dec_mlp_h",
        },
    ),
    "cs_nocast_save_enc_qkv": (
        6,
        {
            "attn_impl_cross": "splash",
            "precast_weights": False,
            "remat_policy": "save:enc_qkv,enc_mlp_h",
        },
    ),
    "cs_nocast_save_enc_qkv_only": (
        6,
        {
            "attn_impl_cross": "splash",
            "precast_weights": False,
            "remat_policy": "save:enc_qkv",
        },
    ),
    "cs_nocast_save_enc_ln": (
        6,
        {
            "attn_impl_cross": "splash",
            "precast_weights": False,
            "remat_policy": "save:enc_ln1,enc_ln2,dec_qkv",
        },
    ),
    "cross_splash_nocast": (
        6,
        {"attn_impl_cross": "splash", "precast_weights": False},
    ),
    # bigger batch, full remat (MFU via batch instead of saves)
    "batch8": (8, {}),
    "batch7": (7, {}),
    "cross_splash_batch7": (7, {"attn_impl_cross": "splash"}),
    "cross_splash_batch8": (8, {"attn_impl_cross": "splash"}),
    # batch 7 + the nocast save-set: the reduction-form CE freed the fp32
    # log-softmax tree (~0.18 GB/sample), which may fund one more sample
    # on top of the 3.1 GB the barriered nocast already frees
    "cs_nocast_save_enc_qkv_b7": (
        7,
        {
            "attn_impl_cross": "splash",
            "precast_weights": False,
            "remat_policy": "save:enc_qkv",
        },
    ),
    # two steps in one XLA program: overlap optimizer tail with next fwd
    "unroll2": (6, {}, 2),
    "unroll2_cross_splash": (6, {"attn_impl_cross": "splash"}, 2),
    # round-4 cases (batch 8 = the new measured-best primary shape, auto
    # impls already resolve to encoder+cross splash):
    # scoped-VMEM ceiling — how much of the 128 MiB VMEM the fusion
    # scheduler may dedicate to one fusion's operands/accumulators; the
    # default is conservative and matmul-heavy programs often gain a few
    # percent from a higher cap (goes through jit(compiler_options=...) so
    # it reaches the axon remote compiler, train/step.py
    # _step_compiler_options)
    "b8_vmem32": (8, {}, 1, {"env": {
        "WFT_COMPILER_OPTIONS":
            '{"xla_tpu_scoped_vmem_limit_kib": "32768"}'}}),
    "b8_vmem64": (8, {}, 1, {"env": {
        "WFT_COMPILER_OPTIONS":
            '{"xla_tpu_scoped_vmem_limit_kib": "65536"}'}}),
    # per-sample time kept improving 6 -> 8; probe two more samples
    "batch10": (10, {}),
    # amortize the fused-optimizer pass (~90 ms) over 2 microbatches; the
    # bf16 accumulation buffer costs ~2.9 GB so this only fits if the
    # activation workspace shrinks at batch 8 vs the save-set OOM margins
    "b8_accum2": (8, {}, 1, {"accum": 2}),
    # ---- round-5: host-offload remat (remat_policy 'offload:<names>') ----
    # Every round-4 'save:' relaxation OOMed by 0.34-3.5 GB
    # (docs/logs/chip_queue_r4b_report.json); 'offload:' stages the same
    # sites to pinned host RAM instead, costing DMA bandwidth rather than
    # HBM. Whether DMA beats recompute is exactly what these measure
    # (tools/probe_host_dma.py gives the raw link bandwidth for the
    # arithmetic). Traffic per microbatch step at batch 8, bf16, one way:
    #   attn_probs (dec self only; enc+cross run splash) 32*(8,20,448,448)
    #     = 2.0 GB; enc_qkv 32*3*(8,1500,1280) = 2.9 GB; enc_mlp_h
    #     32*(8,1500,5120) = 3.9 GB; enc LNs 2.0 GB; dec_qkv 0.9 GB.
    # Cheapest recompute first (probs skip the QK^T+softmax pipeline;
    # LNs gate long recompute chains), heaviest DMA last.
    "b8_offload_probs": (8, {"remat_policy": "offload:attn_probs"}),
    "b8_offload_probs_dqkv": (
        8, {"remat_policy": "offload:attn_probs,dec_qkv"},
    ),
    "b8_offload_enc_ln": (
        8, {"remat_policy": "offload:enc_ln1,enc_ln2"},
    ),
    "b8_offload_enc_qkv": (8, {"remat_policy": "offload:enc_qkv"}),
    "b8_offload_enc_mlp": (8, {"remat_policy": "offload:enc_mlp_h"}),
    # the kill-recompute attempt: offload every named site (~12 GB/step
    # one way at batch 8) — wins only if XLA overlaps the DMA under the
    # matmuls AND the link sustains it; otherwise a measured dead end
    "b8_offload_heavy": (
        8,
        {"remat_policy": (
            "offload:attn_probs,enc_qkv,enc_mlp_h,dec_qkv,dec_mlp_h,"
            "cross_q,cross_kv,enc_ln1,enc_ln2,dec_ln1,dec_ln2,dec_ln_cross"
        )},
    ),
    # offload + save mix: keep the cheap-to-hold dec sites resident
    # (batch-8 full remat leaves ~1 GB free), offload the big encoder ones
    "b8_save_dec_offload_enc": (
        8,
        {"remat_policy": "save:attn_probs+offload:enc_qkv,enc_mlp_h"},
    ),
}


def main() -> None:
    names = sys.argv[1:] or list(CASES)
    for name in names:
        case = CASES[name]
        batch, over = case[0], case[1]
        unroll = case[2] if len(case) > 2 else 1
        extras = case[3] if len(case) > 3 else {}
        env = extras.get("env") or {}
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            bench_case(name, batch, over, unroll=unroll,
                       accum=extras.get("accum", 1))
        except Exception as e:  # noqa: BLE001 - log and continue the ladder
            msg = str(e)
            over_line = next(
                (
                    ln.strip()
                    for ln in msg.splitlines()
                    if "Exceeded hbm capacity" in ln or "Used " in ln
                ),
                msg.splitlines()[0] if msg else "",
            )
            print(
                f"RESULT {name}: FAILED {type(e).__name__}: {over_line}",
                flush=True,
            )
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v


if __name__ == "__main__":
    main()
