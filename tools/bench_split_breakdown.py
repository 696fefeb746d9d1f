"""Decompose the Muon-flagship split step (bench.py line 2) on the real chip.

The first chip timing of the round-3 split/manual stack came in at
18.4 s/opt-step precast (2.30 s/microbatch) against the primary line's
~0.88 s autodiff fwd/bwd for the same microbatch work — the fit is proven
but the manual accumulating backward runs ~2.4x slower. This tool answers
the docs/perf_round4.md "open problem" questions on-chip:

  manual      the shipped split_step (manual backward, precast per
              WFT_MPRECAST) — per-phase times from the wrapper's
              last_timing: accum_s (accumulation program incl. the loss
              fetch that retires it) and update_s (fused Muon update)
  auto        the SAME split_step wrapper but with the AUTOMATIC
              (scan over value_and_grad) accumulation program — this
              compiled to 16.0 GB pre-reduction-CE and OOMed the 15.75 GB
              chip; the CE rewrite freed ~1.1 GB/microbatch so it may fit
              now (OOM is caught and reported either way)

Both variants run through train/step.py's split_step wrapper, which owns
the buffer discipline this measurement needs (retire each program before
enqueueing the next, one recycled grad allocation) — a standalone loop
that re-implemented it OOMed from enqueue-time workspace overlap.

Decision input for docs/perf_round4.md: if `auto` fits and beats `manual`,
the Muon flagship line should run split_update WITHOUT manual_backward
(keeping the manual backward as the documented fallback for smaller HBM).

Usage (real chip, serialized with other TPU users):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_split_breakdown.py
Env:
  WFT_BATCH (6), WFT_ACCUM (8), WFT_ITERS (3),
  WFT_ONLY (comma list of {manual,auto} — run only these),
  WFT_MPRECAST (1; 0 = slice-cast manual backward)
"""

import json
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
    only = {s for s in os.environ.get("WFT_ONLY", "").split(",") if s}
    variants = [v for v in ("manual", "auto") if not only or v in only]

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
    mesh = get_data_mesh()
    tx = None

    def build_state():
        """Fresh donated-buffer-free TrainState. Rebuilt per variant need:
        if a variant dies AFTER its buffers were donated (e.g. inside
        update_jit), the shared state's arrays are deleted and the next
        variant would fail spuriously on deleted buffers."""
        nonlocal tx
        params = init_params(jax.random.PRNGKey(0), dims)
        trainable, frozen = partition_params(params, None)
        if tx is None:
            tx = _muon_flagship_tx(trainable)
        st = TrainState(trainable, frozen, tx.init(trainable),
                        jnp.zeros((), jnp.int32))
        # device_put drops every extra host reference to the param tree:
        # the update program donates `state`, and stale aliases of donated
        # buffers pin HBM.
        return jax.device_put(st, NamedSharding(mesh, P()))

    state = build_state()

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

    results = {"batch": batch, "accum": accum, "mprecast": mprecast}

    # host round-trip latency for reference (the wrapper pays 2 per step)
    x = jnp.zeros(())
    t0 = time.time()
    for _ in range(10):
        float(x + 1.0)
    results["sync_s"] = round((time.time() - t0) / 10, 4)
    log(f"sync {results['sync_s']*1e3:.1f} ms (scalar fetch)")

    for variant in variants:
        step = None
        try:
            # Rebuild the state if a prior variant's failure left donated
            # (deleted) buffers behind.
            if any(getattr(leaf, "is_deleted", lambda: False)()
                   for leaf in jax.tree_util.tree_leaves(state)):
                log("state carried deleted (donated) buffers — rebuilding")
                state = build_state()
            step = step_factory(variant == "manual")
            state, loss = step(state, data, key)  # warm/compile
            rows = []
            totals = []
            for _ in range(iters):
                t0 = time.time()
                state, loss = step(state, data, key)
                totals.append(time.time() - t0)
                rows.append(dict(step.last_timing))
            best = min(range(iters), key=lambda i: totals[i])
            results[variant] = {
                "opt_step_s": round(totals[best], 3),
                "accum_s": round(rows[best]["accum_s"], 3),
                "update_s": round(rows[best]["update_s"], 3),
                "per_microbatch_s": round(rows[best]["accum_s"] / accum, 3),
                "runs_s": [round(t, 3) for t in totals],
            }
            log(f"{variant:7s} opt_step {totals[best]:7.3f} s  accum "
                f"{rows[best]['accum_s']:7.3f} s  update "
                f"{rows[best]['update_s']:6.3f} s  (runs: "
                + " ".join(f"{t:.2f}" for t in totals) + ")")
        except Exception as e:  # noqa: BLE001 - OOM is an expected outcome
            results[f"{variant}_error"] = f"{type(e).__name__}: {e}".split(
                "\n")[0][:300]
            log(f"{variant} FAILED: {results[f'{variant}_error']}")
        finally:
            # Release the wrapper's recycled 3 GB grad buffer before
            # compiling the other variant's programs.
            if step is not None:
                step._grad_buf = None
            del step

    print(json.dumps(results))


if __name__ == "__main__":
    main()
