"""Decompose the Muon-flagship split step (bench.py line 2) on the real chip.

The first-ever chip timing of the round-3 split/manual stack came in at
24.5 s/opt-step (3.07 s/microbatch) against the primary line's
159 ms/sample — the fit is proven but something runs ~3x slower than the
same math in the automatic path. This times each piece in isolation:

  accum_manual   the manual-backward accumulation program (one call = all
                 8 microbatches), per call
  accum_auto     the AUTOMATIC (scan over value_and_grad) accumulation
                 program at the same accum — pre-reduction-CE this compiled
                 to 16.0 GB and OOMed the 15.75 GB chip; the CE rewrite
                 freed ~1.1 GB/microbatch so it may fit now (catches OOM
                 and reports it either way)
  update         the fused one-pass Muon update program, per call
  zero_buf       the in-place gradient-buffer zeroing pass
  sync           one host scalar fetch (axon tunnel round-trip)

Decision input for docs/perf_round3.md rule 1 and the bench line: if
accum_auto fits and beats accum_manual, the Muon line should run
split_update WITHOUT manual_backward.

Usage (real chip, serialized with other TPU users):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_split_breakdown.py
Env:
  WFT_BATCH (6), WFT_ACCUM (8), WFT_ITERS (3),
  WFT_SKIP (comma list of section names to skip),
  WFT_ONLY (comma list — run ONLY these sections; overrides WFT_SKIP),
  WFT_MPRECAST (1; 0 = slice-cast manual backward)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(msg, flush=True)


def main():
    batch = int(os.environ.get("WFT_BATCH", 6))
    accum = int(os.environ.get("WFT_ACCUM", 8))
    iters = int(os.environ.get("WFT_ITERS", 3))
    sections = {"sync", "accum_manual", "update", "zero_buf", "accum_auto"}
    only = {s for s in os.environ.get("WFT_ONLY", "").split(",") if s}
    if only:
        skip = sections - only
    else:
        skip = set(os.environ.get("WFT_SKIP", "").split(","))

    from bench import _muon_flagship_tx  # repo root on sys.path via PYTHONPATH
    from whisper_finetune_tpu.models import (
        ForwardConfig, get_preset_dims, init_params,
    )
    from whisper_finetune_tpu.ops.attention import resolve_auto_impls
    from whisper_finetune_tpu.ops.spec_augment import FeaturizeConfig
    from whisper_finetune_tpu.parallel import get_data_mesh
    from whisper_finetune_tpu.train.step import (
        TrainState, make_train_step, partition_params, shard_batch,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    dims = get_preset_dims("large-v3")
    params = init_params(jax.random.PRNGKey(0), dims)
    trainable, frozen = partition_params(params, None)
    mesh = get_data_mesh()
    tx = _muon_flagship_tx(trainable)
    state = TrainState(trainable, frozen, tx.init(trainable),
                       jnp.zeros((), jnp.int32))
    state = jax.device_put(state, NamedSharding(mesh, P()))
    # Drop every extra reference to the param tree: the update program
    # donates `state`, and stale aliases of donated buffers both pin HBM
    # and poison later sections (the first chip run of this tool died
    # RESOURCE_EXHAUSTED rebuilding state from donated leaves).
    del params, trainable, frozen

    fcfg = ForwardConfig(compute_dtype="bfloat16", **dict(resolve_auto_impls()))
    feat = FeaturizeConfig(n_mels=dims.n_mels, spec_augment=True, p=1.0)

    rng = np.random.default_rng(0)
    data = shard_batch(mesh, {
        "audio": jnp.asarray(
            (rng.standard_normal((accum, batch, 480000)) * 0.05)
            .astype(np.float32)),
        "crop_frames": jnp.full((accum, batch), 3000, jnp.int32),
        "dec_input": jnp.asarray(
            rng.integers(0, dims.n_vocab, (accum, batch, 448))
            .astype(np.int32)),
        "dec_output": jnp.asarray(
            rng.integers(0, dims.n_vocab, (accum, batch, 448))
            .astype(np.int32)),
    })
    key = jax.random.PRNGKey(0)

    # Precast defaults ON to match the measured bench default (18.399 vs
    # 24.532 s/opt-step, docs/perf_round4.md); WFT_MPRECAST=0 reverts.
    mprecast = os.environ.get("WFT_MPRECAST", "1") == "1"

    def step_factory(manual):
        return make_train_step(
            mesh, dims, fcfg, tx, 0.1, feat_cfg=feat, max_grad_norm=1.0,
            accum_dtype="bfloat16", split_update=True,
            manual_backward=manual, manual_precast=manual and mprecast,
        )

    results = {}

    def timed(label, fn, *args, sync=None, n=iters):
        """Median-of-n wall time; sync fetches a scalar to defeat the axon
        backend's lazy block_until_ready."""
        out = fn(*args)  # warm/compile
        (sync or _default_sync)(out)
        ts = []
        for _ in range(n):
            t0 = time.time()
            out = fn(*args)
            (sync or _default_sync)(out)
            ts.append(time.time() - t0)
        best = min(ts)
        results[label] = best
        log(f"{label:14s} {best*1e3:9.1f} ms  (runs: "
            + " ".join(f"{t*1e3:.0f}" for t in ts) + ")")
        return out

    def _default_sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf.astype(jnp.float32)))

    # --- host round-trip latency --------------------------------------
    if "sync" not in skip:
        x = jnp.zeros(())
        t0 = time.time()
        for _ in range(10):
            float(x + 1.0)
        results["sync"] = (time.time() - t0) / 10
        log(f"{'sync':14s} {results['sync']*1e3:9.1f} ms (scalar fetch)")

    # --- manual accumulation program ----------------------------------
    grads_keep = g_scale_keep = None
    need_manual = {"accum_manual", "update", "zero_buf"} - skip
    step_manual = accum_jit = None
    if need_manual:
        step_manual = step_factory(True)
        accum_jit = step_manual.accum_jit
    if "accum_manual" not in skip:
        buf_shape = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.bfloat16), state.trainable)
        zb = jax.jit(lambda t: jax.tree_util.tree_map(jnp.zeros_like, t),
                     donate_argnums=(0,))
        # each call donates buf, so recycle the output grads per run
        out = accum_jit(state, data, key, buf_shape)
        float(out[2])
        ts = []
        for _ in range(iters):
            buf = zb(out[0])
            t0 = time.time()
            out = accum_jit(state, data, key, buf)
            float(out[2])  # loss scalar — forces completion
            ts.append(time.time() - t0)
        results["accum_manual"] = min(ts)
        log(f"{'accum_manual':14s} {min(ts)*1e3:9.1f} ms  (runs: "
            + " ".join(f"{t*1e3:.0f}" for t in ts) + ")")
        grads_keep, g_scale_keep = out[0], out[1]

    # --- update program ------------------------------------------------
    if "update" not in skip and grads_keep is not None:
        update_jit = step_manual.update_jit
        g_scale = g_scale_keep

        # update donates state; keep feeding the returned state back in
        st = update_jit(state, grads_keep, g_scale)
        int(st.step)
        ts = []
        for _ in range(iters):
            t0 = time.time()
            st = update_jit(st, grads_keep, g_scale)
            int(st.step)
            ts.append(time.time() - t0)
        results["update"] = min(ts)
        log(f"{'update':14s} {min(ts)*1e3:9.1f} ms  (runs: "
            + " ".join(f"{t*1e3:.0f}" for t in ts) + ")")
        # The update donated `state`; its output is the one live state now.
        state = st

    # --- zeroing pass ----------------------------------------------------
    if "zero_buf" not in skip and grads_keep is not None:
        zb = jax.jit(lambda t: jax.tree_util.tree_map(jnp.zeros_like, t),
                     donate_argnums=(0,))
        g = grads_keep
        g = zb(g)
        _default_sync(g)
        ts = []
        for _ in range(iters):
            t0 = time.time()
            g = zb(g)
            _default_sync(g)
            ts.append(time.time() - t0)
        results["zero_buf"] = min(ts)
        log(f"{'zero_buf':14s} {min(ts)*1e3:9.1f} ms")
        del g

    # Release every manual-section residue (the final `out` tuple alone
    # pins the 3 GB grad buffer) before compiling the automatic program.
    del step_manual, accum_jit
    grads_keep = g_scale_keep = out = None  # noqa: F841

    # --- automatic accumulation at the same accum (may OOM) -------------
    if "accum_auto" not in skip:
        try:
            step_auto = step_factory(False)
            auto_jit = step_auto.accum_jit
            zb_auto = jax.jit(
                lambda t: jax.tree_util.tree_map(jnp.zeros_like, t),
                donate_argnums=(0,),
            )
            buf = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.bfloat16), state.trainable)

            out = auto_jit(state, data, key, buf)
            float(out[2])
            ts = []
            for _ in range(iters):
                buf = zb_auto(out[0])
                t0 = time.time()
                out = auto_jit(state, data, key, buf)
                float(out[2])
                ts.append(time.time() - t0)
            results["accum_auto"] = min(ts)
            log(f"{'accum_auto':14s} {min(ts)*1e3:9.1f} ms  (runs: "
                + " ".join(f"{t*1e3:.0f}" for t in ts) + ")")
        except Exception as e:  # noqa: BLE001 - OOM is an expected outcome
            results["accum_auto_error"] = f"{type(e).__name__}: {e}"
            log(f"accum_auto FAILED: {type(e).__name__}: "
                + str(e).split("\n")[0][:200])

    import json
    print(json.dumps({"batch": batch, "accum": accum, **{
        k: (round(v, 4) if isinstance(v, float) else v)
        for k, v in results.items()}}))


if __name__ == "__main__":
    main()
