"""Benchmark: fine-tune step throughput in audio-hours/sec/chip.

Runs the real jitted train step (fused on-device log-mel + SpecAugment +
bf16 forward/backward + optimizer update) on synthetic 30-second batches and
prints the primary metric as ONE JSON line:

    {"metric": ..., "value": N, "unit": "audio-hours/sec/chip", "vs_baseline": N}

followed by a second JSON line benchmarking the reference's actual flagship
optimizer configuration (Muon + aux AdamW at accum_grad_steps 8 —
config_large_v3_best_muon.yaml).

The reference publishes no benchmark numbers (BASELINE.md), so vs_baseline
is computed against an analytic A100 estimate: matmul FLOPs per 30 s sample
for the same model (fwd + bwd + full-remat recompute = 4x fwd), at 45% MFU of
A100's 312 TFLOP/s fp16 peak — a deliberately generous stand-in for the
PyTorch reference's single-A100 production config (sc_sbatch.sh:7-9,
config_large_v3_best_muon.yaml).

Failure contract: if the accelerator is unreachable (bounded 60s subprocess
probe) or anything fatal happens mid-run, bench prints ONE JSON line
{"error": ..., "reason": ..., "stale": {last committed result}} and exits 0,
so the round artifact is always parseable.

Primary configuration: FULL large-v3 fine-tuning (all 1.55B params — the
reference's flagship config_large_v3_best_muon.yaml workload), made
single-chip-feasible by the blockwise 8-bit optimizer state + bf16 gradient
accumulator; the reference needs an 80GB-class GPU for the same run. Falls
back to LoRA / smaller presets if the chip runs out of memory.
"""

import glob
import json
import os
import signal
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _flops_per_sample(dims) -> float:
    """Matmul FLOPs for one 30s sample, fwd pass (2*M*N*K per matmul)."""
    d_a, d_t = dims.n_audio_state, dims.n_text_state
    T_a, T_t = dims.n_audio_ctx, dims.n_text_ctx
    enc_block = (
        4 * 2 * T_a * d_a * d_a  # qkv + out projections
        + 2 * 2 * T_a * T_a * d_a  # qk^T and att*v
        + 2 * 2 * T_a * d_a * 4 * d_a  # mlp
    )
    dec_block = (
        4 * 2 * T_t * d_t * d_t
        + 2 * 2 * T_t * T_t * d_t
        + 4 * 2 * T_t * d_t * d_t  # cross-attn projections
        + 2 * 2 * T_t * T_a * d_t  # cross qk / av
        + 2 * 2 * T_t * d_t * 4 * d_t
    )
    convs = 2 * (2 * T_a) * 3 * dims.n_mels * d_a + 2 * T_a * 3 * d_a * d_a
    logits = 2 * T_t * d_t * dims.n_vocab
    return (
        dims.n_audio_layer * enc_block
        + dims.n_text_layer * dec_block
        + convs
        + logits
    )


def _bench_model(name: str, batch: int, steps: int = 10, warmup: int = 2,
                 lora: bool = False, accum: int = 1, tx_factory=None,
                 fcfg_overrides=None, split_update: bool = False,
                 manual_backward: bool = False, manual_precast: bool = False,
                 compiler_options=None):
    from whisper_finetune_tpu.models import ForwardConfig, get_preset_dims, init_params
    from whisper_finetune_tpu.models.lora import apply_lora, lora_scale
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

    dims = get_preset_dims(name)
    params = init_params(jax.random.PRNGKey(0), dims)
    mask = None
    scale = 0.0
    if lora:
        params, mask = apply_lora(params, rank=16, alpha=32)
        scale = lora_scale(16, 32)
    trainable, frozen = partition_params(params, mask)

    mesh = get_data_mesh()
    if tx_factory is not None:
        tx = tx_factory(trainable)
    else:
        tx = optax.adamw(1e-4) if lora else adamw_8bit(2e-5, weight_decay=0.01)
    state = TrainState(trainable, frozen, tx.init(trainable), jnp.zeros((), jnp.int32))
    state = jax.device_put(state, NamedSharding(mesh, P()))

    from whisper_finetune_tpu.ops.attention import resolve_auto_impls

    fkw = dict(resolve_auto_impls())
    fkw.update(fcfg_overrides or {})
    fcfg = ForwardConfig(compute_dtype="bfloat16", lora_scale=scale, **fkw)
    feat = FeaturizeConfig(n_mels=dims.n_mels, spec_augment=True, p=1.0)
    step_fn = make_train_step(
        mesh, dims, fcfg, tx, 0.1, feat_cfg=feat, max_grad_norm=1.0,
        accum_dtype=None if lora else "bfloat16", split_update=split_update,
        manual_backward=manual_backward, manual_precast=manual_precast,
        compiler_options=compiler_options,
    )

    n_dev = mesh.devices.size
    rng = np.random.default_rng(0)
    batch_global = batch * n_dev
    data = shard_batch(
        mesh,
        {
            "audio": jnp.asarray(
                (rng.standard_normal((accum, batch_global, 480000)) * 0.05).astype(
                    np.float32
                )
            ),
            "crop_frames": jnp.full((accum, batch_global), 3000, jnp.int32),
            "dec_input": jnp.asarray(
                rng.integers(
                    0, dims.n_vocab, (accum, batch_global, 448)
                ).astype(np.int32)
            ),
            "dec_output": jnp.asarray(
                rng.integers(
                    0, dims.n_vocab, (accum, batch_global, 448)
                ).astype(np.int32)
            ),
        },
    )
    key = jax.random.PRNGKey(0)

    for _ in range(warmup):
        state, loss = step_fn(state, data, key)
    float(loss)  # hard host sync (block_until_ready alone can be lazy on
    # remote-execution platforms)
    times = []
    final_loss = None
    for _ in range(steps):
        t0 = time.time()
        state, loss = step_fn(state, data, key)
        final_loss = float(loss)  # per-step sync so times are honest
        times.append(time.time() - t0)
    assert np.isfinite(final_loss), f"non-finite loss {final_loss}"
    # Short windows (accum>1 runs use steps=3) are vulnerable to one slow
    # outlier (e.g. the ~98 s first-post-compile split-step call when
    # warmup under-covers it) — report the median as the step time and
    # carry the raw window for the record.
    dt = float(np.median(times))
    samples_per_opt_step = accum * batch_global
    audio_hours_per_sec_per_chip = (
        samples_per_opt_step * 30.0 / 3600.0 / dt / n_dev
    )
    return dims, dt, audio_hours_per_sec_per_chip, times


# Measured on THIS chip with in-graph fori_loop probes (no dispatch
# overhead): bf16 8192^3 matmul sustains 148.8 TFLOP/s and elementwise
# read+write sustains 276 GB/s — well below v5e paper peaks (197 TFLOP/s,
# 819 GB/s), so MFU is reported against the measured ceiling.
#
# Honest target arithmetic (round-5 correction — the earlier comment here
# compared a fwd-only 'useful work' count against the total-execution
# ceiling and understated the requirement ~3-4x): the analytic baseline
# (A100 at 45% MFU of 312 TF) executes 140.4e12 FLOP/s on the SAME
# 4x-fwd count this bench uses. At 100% of this chip's measured 148.8 TF
# ceiling, vs_baseline tops out at 148.8/140.4 = 1.06 under full remat,
# or 1.06 * 4/3 = 1.41 if recompute is eliminated (3x-fwd execution for
# the same 4x-fwd credited work). The 3x north star is therefore a
# MULTI-CHIP aggregate goal by physics; the per-chip goals are MFU >= 70%
# of the measured ceiling and killing remat recompute (host offload).
# bench JSON self-describes this via max_attainable_vs_baseline.
MEASURED_PEAK_TFLOPS = 148.8
MEASURED_HBM_GBPS = 276.0
# Baseline effective FLOP/s on the same 4x-fwd count (A100 45% of 312 TF).
BASELINE_EFFECTIVE_TFLOPS = 312.0 * 0.45


def _result_json(label, dims, batch, accum, step_time, value, extra=None):
    flops = _flops_per_sample(dims)
    # A100 estimate: fwd+bwd+remat ~= 4x fwd FLOPs, 45% MFU of 312e12.
    a100_samples_per_sec = (312e12 * 0.45) / (4 * flops)
    a100_audio_hours_per_sec = a100_samples_per_sec * 30.0 / 3600.0
    # MFU vs the measured (not paper) ceiling: train step executes
    # ~4x forward matmul FLOPs (fwd + full-remat recompute + 2x bwd).
    achieved_tflops = 4 * flops * batch * accum / step_time / 1e12
    record = {
        "metric": f"fine-tune audio-hours/sec/chip ({label}, "
        "fused on-device featurize)",
        "value": round(value, 4),
        "unit": "audio-hours/sec/chip",
        "vs_baseline": round(value / a100_audio_hours_per_sec, 3),
        "step_time_s": round(step_time, 3),
        "devices": jax.device_count(),
        "achieved_tflops": round(achieved_tflops, 1),
        "mfu_vs_measured_peak": round(
            achieved_tflops / MEASURED_PEAK_TFLOPS, 3
        ),
        "measured_peak_tflops": MEASURED_PEAK_TFLOPS,
        "measured_hbm_gbps": MEASURED_HBM_GBPS,
        # Physics ceiling for THIS chip vs the analytic baseline on the
        # same 4x-fwd count: what vs_baseline would read at 100% MFU of
        # the measured peak. ~1.06 under full remat; x4/3 if recompute
        # is eliminated. The 3x north star is a multi-chip aggregate.
        "max_attainable_vs_baseline": round(
            MEASURED_PEAK_TFLOPS / BASELINE_EFFECTIVE_TFLOPS, 3
        ),
    }
    record.update(extra or {})
    return json.dumps(record)


def _muon_flagship_tx(trainable):
    """The reference's best config's optimizer
    (configs/config_large_v3_best_muon.yaml optimizer section): Muon on the
    hidden matrices + auxiliary AdamW, RMS matching on. State compressed
    for the single-chip 16GB fit (optim/muon.py): blockwise-int8 momentum
    + 8-bit aux AdamW — bf16 momentum alone left so little HBM headroom
    that the cross-splash scratch pushed the step over the edge."""
    from whisper_finetune_tpu.optim.optimizers import get_optimizer

    conf = {
        "type": "adamw",
        "muon": True,
        "8bit": True,
        "muon_ndim_threshold": 2,
        "muon_params": {"lr": 2e-5, "momentum": 0.95, "weight_decay": 0.01},
        "params": {
            "lr": 2e-5,
            "weight_decay": 0.01,
            "betas": [0.9, 0.98],
            "eps": 1e-6,
        },
        "muon_momentum_dtype": "int8",
        "muon_aux_8bit": True,
    }
    tx, _ = get_optimizer(trainable, conf)
    return tx


def _load_stale_result(base: str = None):
    """Last committed bench measurement, echoed when the accelerator is
    down so the round artifact is never empty. Sources, newest wins:
    driver artifacts (highest-round BENCH_r*.json with a non-null parse)
    and docs/logs/chip_queue_bench.json (a mid-round measurement committed
    from tools/run_chip_queue.py, which outranks all driver rounds it
    names in "after_round"). Returns (record_or_None, source_name)."""
    here = base or os.path.dirname(__file__) or "."
    best, best_n, best_src = None, -1, None
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        try:
            with open(path) as f:
                doc = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        parsed = doc.get("parsed")
        n = doc.get("n", 0)
        if not isinstance(parsed, dict):
            continue
        # A driver artifact can itself be a failure envelope ({"error": ...,
        # "stale": {...}}) from a round where the tunnel was down — echoing
        # that verbatim produces unit-less nested garbage (round-4's
        # BENCH_r04.json). Unwrap the nested measurement; require a value.
        if not parsed.get("value") and isinstance(parsed.get("stale"), dict):
            parsed = parsed["stale"]
        if parsed.get("value") and n > best_n:
            best, best_n, best_src = parsed, n, os.path.basename(path)
    queue_path = os.path.join(here, "docs", "logs", "chip_queue_bench.json")
    try:
        with open(queue_path) as f:
            doc = json.load(f)
        primary = doc.get("primary")
        if (isinstance(primary, dict) and primary.get("value")
                and doc.get("after_round", -1) >= best_n):
            best, best_src = primary, os.path.basename(queue_path)
    except (OSError, json.JSONDecodeError):
        pass
    return best, best_src


def _emit_failure(reason: str) -> None:
    """ONE parseable JSON line on any fatal failure — a bench that cannot
    run must still say so within the harness budget (round-3's artifact was
    rc=124/parsed=null because in-process backend retries consumed it).
    Echoes the last committed measurement marked stale=true."""
    stale, src = _load_stale_result()
    record = {"error": "bench did not run", "reason": reason}
    if stale is not None:
        record["stale"] = dict(stale, stale=True, stale_source=src)
    print(json.dumps(record))


_PROBE_CODE = """
import os, sys
if os.environ.get("WFT_BENCH_FORCE_PROBE_FAIL"):
    sys.exit("forced probe failure (WFT_BENCH_FORCE_PROBE_FAIL)")
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
print("CHIP_OK", float((x @ x).sum()), jax.devices()[0].platform)
"""


def _probe_backend() -> str:
    """Bounded accelerator liveness probe. Backend init on a dead tunnel
    HANGS in C++ for many minutes (observed 27 min before RuntimeError), so
    the probe runs in a subprocess that can actually be killed. Returns ""
    when alive, else a short failure reason. Knobs:
    WFT_BENCH_PROBE_TIMEOUT (s, default 60), WFT_BENCH_BACKEND_TRIES
    (default 1 — one bounded probe, then emit-and-exit)."""
    timeout_s = float(os.environ.get("WFT_BENCH_PROBE_TIMEOUT", 60))
    tries = int(os.environ.get("WFT_BENCH_BACKEND_TRIES", 1))
    reason = "unknown"
    for k in range(max(tries, 1)):
        try:
            out = subprocess.run(
                [sys.executable, "-c", _PROBE_CODE],
                capture_output=True, text=True, timeout=timeout_s,
            )
        except subprocess.TimeoutExpired:
            reason = f"backend probe hung >{timeout_s:.0f}s (tunnel down?)"
        else:
            if out.returncode == 0 and "CHIP_OK" in out.stdout:
                return ""
            tail = (out.stderr or out.stdout).strip().splitlines()
            reason = "backend probe failed: " + (tail[-1] if tail else
                                                 f"rc={out.returncode}")
        if k < tries - 1:
            time.sleep(min(timeout_s, 60.0))
    return reason


def _arm_deadline() -> None:
    """Best-effort mid-run backstop: if the accelerator dies AFTER the
    probe, raise in the main thread before the driver's harness budget
    does, so the failure path still emits JSON. WFT_BENCH_DEADLINE_S=0
    disables."""
    deadline = int(os.environ.get("WFT_BENCH_DEADLINE_S", 2400))
    if deadline <= 0 or not hasattr(signal, "SIGALRM"):
        return

    def _expired(signum, frame):
        raise TimeoutError(f"bench exceeded {deadline}s deadline mid-run")

    signal.signal(signal.SIGALRM, _expired)
    signal.alarm(deadline)


def main():
    reason = _probe_backend()
    if reason:
        _emit_failure(reason)
        return
    _arm_deadline()
    try:
        _run_benchmarks()
    except BaseException as e:  # noqa: BLE001 - parseable artifact > rc
        _emit_failure(f"{type(e).__name__}: {e}")


def _run_benchmarks():
    # tools/run_chip_queue.py drives variants through these knobs:
    #   WFT_BENCH_ONLY=primary|muon|turbo|lora|small
    #                                     run just one line; turbo/lora/small
    #                                     pin that fallback row directly (the
    #                                     driver configs BASELINE.json lists
    #                                     include turbo_best and small-LoRA,
    #                                     which the primary line never
    #                                     measures — VERDICT r4 item 8)
    #   WFT_BENCH_PRIMARY_OVERRIDES=json  fcfg overrides for the primary line
    #   WFT_BENCH_PRIMARY_BATCH=N         primary per-device batch
    #   WFT_BENCH_PRIMARY_ACCUM=N         primary accum_grad_steps (the
    #                                     reference's 8-bit AdamW config
    #                                     silver-hill.yaml:71 trains at 8)
    #   WFT_BENCH_PRIMARY_SPLIT=1         primary via the split-program +
    #                                     manual-backward step (accum > 1)
    #   WFT_BENCH_MUON_PRECAST=1          Muon line with manual_precast on
    only = os.environ.get("WFT_BENCH_ONLY", "")
    primary_overrides = json.loads(
        os.environ.get("WFT_BENCH_PRIMARY_OVERRIDES", "{}")
    )
    primary_batch = os.environ.get("WFT_BENCH_PRIMARY_BATCH")
    primary_accum = int(os.environ.get("WFT_BENCH_PRIMARY_ACCUM", "1"))
    primary_split = os.environ.get("WFT_BENCH_PRIMARY_SPLIT", "0") == "1"

    # The primary line bakes in xla_tpu_scoped_vmem_limit_kib=32768: three
    # independent runs at this exact shape land on 1239.9/1240.6/1240.5 ms
    # vs 1252-1287 ms at the compiler default (r4 sweep + r5 ladder case
    # b8_vmem32 — docs/perf_round5.md); 65536 regresses ~5%. Only the
    # measured shape gets the flag; WFT_COMPILER_OPTIONS overrides.
    primary_copts = {"xla_tpu_scoped_vmem_limit_kib": "32768"}
    attempts = [
        # batch 8 measured fastest per-sample under full remat + splash
        # encoder/cross (156.6 ms/sample vs 158.7 at batch 6 — chip_queue
        # r4b ladder case cross_splash_batch8, 2026-08-19); every `save:`
        # remat relaxation still OOMs post-reduction-CE (closest miss
        # +341 MB), and every `offload:` case is 17%+ slower than recompute
        # (r5 ladder), so MFU comes from batch, not saved activations.
        ("large-v3 full fine-tune (8-bit state, bf16 accum)", "large-v3", 8, False),
        ("large-v3 LoRA r16", "large-v3", 8, True),
        ("large-v3-turbo full fine-tune (8-bit state)", "large-v3-turbo", 8, False),
        ("small full fine-tune", "small", 16, False),
    ]
    # Pin one specific fallback row (no fallback chain): the row IS the
    # measurement target, so an OOM there must surface, not degrade.
    pinned = {
        "turbo": "large-v3-turbo full fine-tune (8-bit state)",
        "lora": "large-v3 LoRA r16",
        "small": "small full fine-tune",
    }
    if only in pinned:
        attempts = [a for a in attempts if a[0] == pinned[only]]
        assert attempts, f"no bench row for WFT_BENCH_ONLY={only}"

    last_err = None
    if only != "muon":
        for label, name, batch, lora in attempts:
            is_primary = name == "large-v3" and not lora and only not in pinned
            if primary_batch and is_primary:
                batch = int(primary_batch)
            accum = primary_accum if is_primary else 1
            split = primary_split and is_primary and accum > 1
            try:
                dims, step_time, value, times = _bench_model(
                    name, batch, lora=lora, accum=accum,
                    steps=3 if accum > 1 else 10,
                    warmup=2,
                    fcfg_overrides=primary_overrides if not lora else None,
                    split_update=split, manual_backward=split,
                    manual_precast=split,
                    compiler_options=(
                        primary_copts
                        if is_primary and batch == 8 and not split
                        else None
                    ),
                )
                extra = None
                if accum > 1:
                    extra = {
                        "accum_grad_steps": accum,
                        "microbatch_step_time_s": round(step_time / accum, 3),
                        "manual_backward": split,
                        "per_step_times_s": [round(t, 3) for t in times],
                    }
                print(_result_json(label, dims, batch, accum, step_time,
                                   value, extra=extra))
                break
            except Exception as e:  # noqa: BLE001 - fall through to smaller model
                last_err = e
                print(f"# bench for {label} failed ({type(e).__name__}); trying fallback")
        else:
            raise SystemExit(f"bench failed for all model sizes: {last_err}")
    if only == "primary" or only in pinned:
        return

    # Second line: the reference's actual flagship workload —
    # config_large_v3_best_muon.yaml trains with Muon + aux AdamW at
    # accum_grad_steps 8, which amortizes the Newton-Schulz orthogonalization
    # over 8 microbatches exactly as the reference amortizes it over 8
    # DataLoader batches.
    try:
        MUON_ACCUM = 8
        # Default ON: 18.399 vs 24.532 s/step measured (chip_queue r4b,
        # 2026-08-19) and the precast accum program peaks at the same
        # 14.45 GiB as slice-cast. WFT_BENCH_MUON_PRECAST=0 reverts.
        precast = os.environ.get("WFT_BENCH_MUON_PRECAST", "1") == "1"
        # WFT_BENCH_MUON_MANUAL=0 swaps the manual accumulating backward
        # for the AUTOMATIC (scan over value_and_grad) accumulation program
        # — pre-reduction-CE it compiled to 16.0 GB and OOMed; the
        # breakdown tool (tools/bench_split_breakdown.py) decides which
        # one the flagship line ships with.
        manual = os.environ.get("WFT_BENCH_MUON_MANUAL", "1") == "1"
        # warmup=2, NOT 1: the split step's first post-compile call runs
        # ~98 s (tools/bench_split_breakdown.py, 2026-08-19 — the recycled
        # zero_buf-output buffer first feeds the accum program there and
        # triggers a second compile), and averaging it into a 3-step
        # window inflated the flagship to 18.4 s/opt-step when its steady
        # state is ~7.2 s (runs: 98.5, 7.16, 7.18).
        muon_steps = int(os.environ.get("WFT_BENCH_MUON_STEPS", "3"))
        dims, step_time, value, times = _bench_model(
            "large-v3", 6, steps=muon_steps, warmup=2, accum=MUON_ACCUM,
            tx_factory=_muon_flagship_tx, split_update=True,
            manual_backward=manual, manual_precast=manual and precast,
        )
        print(
            _result_json(
                "large-v3 Muon flagship, accum 8", dims, 6, MUON_ACCUM,
                step_time, value,
                extra={
                    "accum_grad_steps": MUON_ACCUM,
                    "microbatch_step_time_s": round(step_time / MUON_ACCUM, 3),
                    "manual_backward": manual,
                    "manual_precast_weights": manual and precast,
                    "per_step_times_s": [round(t, 3) for t in times],
                },
            )
        )
    except Exception as e:  # noqa: BLE001 - the muon line is additive
        print(f"# muon flagship bench failed ({type(e).__name__}): {e}")


if __name__ == "__main__":
    main()
