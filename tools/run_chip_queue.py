"""Chip measurement queue: wait for the accelerator, run the queued
benches + probes + ladder in order, apply the perf decision rules, and
write one JSON report — so any session (or the driver) resumes the
round's measurement debt with a single command.

The round-5 queue (VERDICT r4 "next round" items 2/3/5/6/8):

  1. ``python bench.py``              — both headline lines, 10-step Muon
                                        steady-state window (weak 7)
  2. ``tools/probe_host_dma.py``      — device<->pinned-host bandwidth
                                        (offload-ladder arithmetic)
  3. ``WFT_BENCH_ONLY=primary WFT_BENCH_PRIMARY_ACCUM=8`` split/manual —
     first measured primary step at the reference's accum 8 (weak 4),
     with JAX_LOG_COMPILES for the ~98 s first-call anomaly (weak 5)
  4. ``WFT_BENCH_ONLY=turbo`` / ``lora`` — one number per remaining
     BASELINE.json config family (item 8)
  5. ``WFT_MANUAL=1 tools/probe_split_memory.py`` (x2: slice-cast and
     precast) — HBM fit re-check after any program change
  6. Muon slice-cast contrast run (rule 1)
  7. ``tools/bench_remat_ladder.py`` — the host-offload ladder (item 3)
     plus the round-4 late additions (vmem / batch10 / accum2)
  8. ``tools/bench_e2e.py``           — end-to-end driver throughput,
     host feed rate vs device rate (item 5)

Every bench-ish measurement is merged into
docs/logs/chip_queue_bench.json as it lands (bench.py's stale-echo
source), so a mid-queue tunnel death still persists what was gathered.

Decision rules encoded:

  * rule 1 — if the slice-cast contrast Muon run beats the shipped
    precast default, recommend flipping
    ``training.manual_precast_weights`` off (bench.py Muon line +
    configs/config_large_v3_best_muon_1chip.yaml).
  * rule 2 — if a ladder case beats the primary line's measured
    per-sample step time, recommend baking its fcfg into bench.py's
    primary workload (the report carries the exact
    WFT_BENCH_PRIMARY_OVERRIDES/BATCH/env JSON).

Usage:
    python tools/run_chip_queue.py [--wait-hours H] [--out DIR]
        [--skip bench|probes|precast-bench|ladder] [--ladder-cases a,b,...]

Exit code 0 with a report at <out>/report.json whenever the chip was seen
alive; 3 when the wait budget expired with the chip still down.
Only one process can use the chip (CLAUDE.md) — this tool serializes
everything and must be the only TPU user while it runs.
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# Round-5 queue: the offload ladder (VERDICT r4 item 3 — every round-4
# 'save:' case OOMed by 0.34-3.5 GB; 'offload:' stages the same sites to
# pinned host RAM) plus the round-4 late additions that never got timed
# (the r4b queue ran before they were added).
DEFAULT_LADDER_CASES = [
    "b8_offload_probs",
    "b8_offload_probs_dqkv",
    "b8_offload_enc_ln",
    "b8_offload_enc_qkv",
    "b8_offload_enc_mlp",
    "b8_save_dec_offload_enc",
    "b8_offload_heavy",
    "b8_vmem32",
    "b8_vmem64",
    "batch10",
    "b8_accum2",
]
# Ladder case name -> (bench primary fcfg overrides, batch, extra env).
# Mirrors tools/bench_remat_ladder.py CASES so rule 2's recommendation is
# directly actionable. Auto impls already resolve to encoder+cross splash,
# so offload cases need no attn keys.
LADDER_TO_BENCH = {
    "cs_nocast_save_enc_qkv_only": (
        {"attn_impl_cross": "splash", "precast_weights": False,
         "remat_policy": "save:enc_qkv"}, 6, {}),
    "cs_nocast_save_probs": (
        {"attn_impl_cross": "splash", "precast_weights": False,
         "remat_policy": "save:attn_probs"}, 6, {}),
    "cs_nocast_save_probs_qkv": (
        {"attn_impl_cross": "splash", "precast_weights": False,
         "remat_policy": "save:attn_probs,dec_qkv,dec_mlp_h"}, 6, {}),
    "cs_nocast_save_enc_qkv": (
        {"attn_impl_cross": "splash", "precast_weights": False,
         "remat_policy": "save:enc_qkv,enc_mlp_h"}, 6, {}),
    "cs_nocast_save_enc_ln": (
        {"attn_impl_cross": "splash", "precast_weights": False,
         "remat_policy": "save:enc_ln1,enc_ln2,dec_qkv"}, 6, {}),
    "cross_splash_nocast": (
        {"attn_impl_cross": "splash", "precast_weights": False}, 6, {}),
    "cross_splash_batch7": ({"attn_impl_cross": "splash"}, 7, {}),
    "cross_splash_batch8": ({"attn_impl_cross": "splash"}, 8, {}),
    "cs_nocast_save_enc_qkv_b7": (
        {"attn_impl_cross": "splash", "precast_weights": False,
         "remat_policy": "save:enc_qkv"}, 7, {}),
    "unroll2_cross_splash": ({"attn_impl_cross": "splash"}, 6, {}),
    "b8_offload_probs": ({"remat_policy": "offload:attn_probs"}, 8, {}),
    "b8_offload_probs_dqkv": (
        {"remat_policy": "offload:attn_probs,dec_qkv"}, 8, {}),
    "b8_offload_enc_ln": (
        {"remat_policy": "offload:enc_ln1,enc_ln2"}, 8, {}),
    "b8_offload_enc_qkv": ({"remat_policy": "offload:enc_qkv"}, 8, {}),
    "b8_offload_enc_mlp": ({"remat_policy": "offload:enc_mlp_h"}, 8, {}),
    "b8_save_dec_offload_enc": (
        {"remat_policy": "save:attn_probs+offload:enc_qkv,enc_mlp_h"},
        8, {}),
    "b8_offload_heavy": (
        {"remat_policy": (
            "offload:attn_probs,enc_qkv,enc_mlp_h,dec_qkv,dec_mlp_h,"
            "cross_q,cross_kv,enc_ln1,enc_ln2,dec_ln1,dec_ln2,dec_ln_cross"
        )}, 8, {}),
    "b8_vmem32": ({}, 8, {"WFT_COMPILER_OPTIONS":
                          '{"xla_tpu_scoped_vmem_limit_kib": "32768"}'}),
    "b8_vmem64": ({}, 8, {"WFT_COMPILER_OPTIONS":
                          '{"xla_tpu_scoped_vmem_limit_kib": "65536"}'}),
    "batch10": ({}, 10, {}),
    "b8_accum2": ({}, 8, {"WFT_BENCH_PRIMARY_ACCUM": "2"}),
}

PROBE_CODE = """
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print("CHIP_OK", float((x @ x).sum()))
d = jax.local_devices()[0]
try:
    print("HBM_LIMIT", d.memory_stats().get("bytes_limit", 0))
except Exception:
    pass
"""


def log(msg: str) -> None:
    print(f"[chip_queue {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def probe_chip(timeout_s: float = 420.0):
    """Bounded liveness probe (backend init on a dead tunnel hangs in C++,
    so it must run in a killable subprocess). Returns HBM bytes_limit (or 0)
    when alive, None when down.

    The timeout is deliberately generous: measured 2026-08-19, backend init
    from a daemonized/detached parent takes 2-3.5 minutes even while the
    same probe from an interactive shell connects in seconds — a 240s
    timeout produced false "chip down" verdicts against a healthy chip."""
    try:
        out = subprocess.run(
            [sys.executable, "-c", PROBE_CODE], capture_output=True,
            text=True, timeout=timeout_s, cwd=REPO,
        )
    except subprocess.TimeoutExpired:
        return None
    if out.returncode != 0 or "CHIP_OK" not in out.stdout:
        return None
    m = re.search(r"HBM_LIMIT (\d+)", out.stdout)
    return int(m.group(1)) if m else 0


def wait_for_chip(wait_hours: float):
    deadline = time.time() + wait_hours * 3600.0
    while True:
        hbm = probe_chip()
        if hbm is not None:
            return hbm
        if time.time() >= deadline:
            return None
        log("chip down; next probe in 240s")
        time.sleep(240)


def run_step(name, cmd, env_extra, out_dir, timeout_s):
    """Run one queue step as a subprocess, tee output to <out>/<name>.log."""
    log(f"step {name}: {' '.join(cmd)}"
        + (f"  env={env_extra}" if env_extra else ""))
    env = dict(os.environ, **{k: str(v) for k, v in (env_extra or {}).items()})
    # PREPEND the repo (don't setdefault): the ambient environment already
    # sets PYTHONPATH (e.g. /root/.axon_site), and tools/*.py scripts run
    # with sys.path[0]=tools/ — round 4's first ladder run lost all 8 cases
    # to ModuleNotFoundError because setdefault kept the ambient value.
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    t0 = time.time()
    try:
        out = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout_s,
            cwd=REPO, env=env,
        )
        text, rc = out.stdout + out.stderr, out.returncode
    except subprocess.TimeoutExpired as e:
        text = ((e.stdout or b"").decode(errors="replace")
                + (e.stderr or b"").decode(errors="replace"))
        rc = -1
        text += f"\n[chip_queue] TIMEOUT after {timeout_s}s"
    with open(os.path.join(out_dir, f"{name}.log"), "w") as f:
        f.write(text)
    log(f"step {name}: rc={rc} in {time.time() - t0:.0f}s")
    return rc, text


def parse_bench(text):
    """bench.py JSON lines -> {"primary": {...}, "muon": {...}}."""
    res = {}
    for line in text.splitlines():
        if not line.startswith("{"):
            continue
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "error" in rec:
            res["error"] = rec
        elif "Muon" in rec.get("metric", ""):
            res["muon"] = rec
        else:
            res["primary"] = rec
    return res


def parse_probe(text):
    """probe_split_memory report lines -> {"accum": GiB, "update": GiB}."""
    peaks = {}
    for m in re.finditer(
        r"^(accum|update)\s*\[.*?\].*?peak\(args\+temp\+unaliased-out\)\s*"
        r"([\d.]+)\s*GiB", text, re.M,
    ):
        peaks[m.group(1)] = float(m.group(2))
    return peaks


def parse_ladder(text):
    """RESULT lines -> {case: {"step_ms": x, "audio_hps": y, ...}}."""
    cases = {}
    for line in text.splitlines():
        # bench_remat_ladder emits 'batch=N  accum=M  peak_hbm=...'; the
        # accum field is optional here for older logs (round-4 regression:
        # a regex pinned to the old format silently dropped every case and
        # rule 2 never fired).
        m = re.match(
            r"RESULT (\S+): step=([\d.]+) ms\s+audio-h/s=([\d.]+)"
            r"\s+batch=(\d+)(?:\s+accum=(\d+))?\s+peak_hbm=([\d.]+|None) GiB",
            line,
        )
        if m:
            cases[m.group(1)] = {
                "step_ms": float(m.group(2)),
                "audio_hps": float(m.group(3)),
                "batch": int(m.group(4)),
                "accum": int(m.group(5) or 1),
                "peak_hbm_gib": (
                    None if m.group(6) == "None" else float(m.group(6))
                ),
            }
        else:
            m = re.match(r"RESULT (\S+): FAILED (.*)", line)
            if m:
                cases[m.group(1)] = {"failed": m.group(2)}
    return cases


def persist_queue_echo(updates: dict) -> None:
    """Merge measurements into docs/logs/chip_queue_bench.json (the file
    bench.py's stale-echo reads): if the tunnel dies again before the
    driver's end-of-round bench, the round artifact carries THESE numbers
    instead of an older round's. Called after every bench-ish step so a
    mid-queue death still persists everything gathered so far."""
    rounds = [
        int(m.group(1))
        for p in os.listdir(REPO)
        if (m := re.match(r"BENCH_r(\d+)\.json$", p))
    ]
    dest = os.path.join(REPO, "docs", "logs", "chip_queue_bench.json")
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    try:
        with open(dest) as f:
            doc = json.load(f)
    except (OSError, json.JSONDecodeError):
        doc = {}
    doc.update(updates)
    doc["after_round"] = max(rounds, default=0)
    with open(dest, "w") as f:
        json.dump(doc, f, indent=2)
    log(f"measurements persisted to {dest} (commit it)")


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--wait-hours", type=float, default=0.0,
                    help="poll budget while the chip is down (default: one "
                    "probe, exit 3 if dead)")
    ap.add_argument("--out", default="/tmp/chip_queue_run")
    ap.add_argument("--skip", action="append", default=[],
                    choices=["bench", "probes", "precast-bench", "ladder",
                             "dma", "accum8", "turbo", "lora", "e2e"])
    ap.add_argument("--ladder-cases",
                    default=",".join(DEFAULT_LADDER_CASES))
    ap.add_argument("--headroom-gib", type=float, default=1.0,
                    help="rule-1 minimum free HBM for the precast flip")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    hbm_bytes = wait_for_chip(args.wait_hours)
    if hbm_bytes is None:
        log("chip never came back inside the wait budget")
        sys.exit(3)
    hbm_gib = hbm_bytes / 2**30 if hbm_bytes else 15.75  # v5e 16G default
    log(f"chip alive, HBM limit {hbm_gib:.2f} GiB")

    report = {"hbm_gib": round(hbm_gib, 2), "steps": {},
              "recommendations": []}

    # Generous sub-probe budgets for bench.py's own liveness probe and
    # mid-run deadline: under a detached parent, backend init alone can
    # take minutes (see probe_chip), and the first cold compile of the
    # split Muon programs has measured >15 min.
    bench_env = {"WFT_BENCH_PROBE_TIMEOUT": 300,
                 "WFT_BENCH_BACKEND_TRIES": 2,
                 "WFT_BENCH_DEADLINE_S": 4800}
    bench_res = {}
    if "bench" not in args.skip:
        # WFT_BENCH_MUON_STEPS=10: widen the flagship steady-state window
        # (round-4's 7.124 s rested on a 3-step window — VERDICT weak 7).
        rc, text = run_step("bench", [sys.executable, "bench.py"],
                            dict(bench_env, WFT_BENCH_MUON_STEPS=10),
                            args.out, 5400)
        bench_res = parse_bench(text)
        report["steps"]["bench"] = {"rc": rc, **bench_res}
        if bench_res.get("primary"):
            persist_queue_echo({"primary": bench_res["primary"],
                                "muon": bench_res.get("muon")})

    # Host<->device DMA bandwidth (fast; informs the offload-ladder
    # arithmetic — tools/probe_host_dma.py docstring).
    if "dma" not in args.skip:
        rc, text = run_step(
            "dma_probe", [sys.executable, "tools/probe_host_dma.py"],
            {}, args.out, 1800)
        report["steps"]["dma_probe"] = {
            "rc": rc,
            "lines": [ln for ln in text.splitlines()
                      if ln.startswith("RESULT")],
        }

    # First measured step time for the primary at the reference's training
    # semantics (accum_grad_steps: 8, split/manual — VERDICT weak 4; the
    # fit was proven in round 4 at batch 6, docs/perf_round4.md).
    # JAX_LOG_COMPILES surfaces any second-executable build behind the
    # ~98 s first-post-compile split-step call (VERDICT weak 5).
    if "accum8" not in args.skip:
        rc, text = run_step(
            "bench_primary_accum8", [sys.executable, "bench.py"],
            # batch 5, not 6/8: the round-4 "batch 8 fits" was an abstract
            # compile analysis (args+temp 15.20 of 15.75 GiB) and the live
            # bench process OOM'd at batch 6 (r5 queue) — the process's
            # extra residents eat the margin. tools/run_chip_followup.py
            # steps down 5 -> 4 automatically.
            dict(bench_env, WFT_BENCH_ONLY="primary",
                 WFT_BENCH_PRIMARY_ACCUM=8, WFT_BENCH_PRIMARY_SPLIT=1,
                 WFT_BENCH_PRIMARY_BATCH=5, JAX_LOG_COMPILES=1),
            args.out, 7200)
        res = parse_bench(text)
        report["steps"]["bench_primary_accum8"] = {
            "rc": rc, **res,
            "n_compile_log_lines": sum(
                1 for ln in text.splitlines() if "Compiling" in ln),
        }
        if res.get("primary"):
            persist_queue_echo({"primary_accum8": res["primary"]})

    # One committed number each for the other BASELINE.json config
    # families (VERDICT r4 item 8).
    for line in ("turbo", "lora"):
        if line in args.skip:
            continue
        rc, text = run_step(
            f"bench_{line}", [sys.executable, "bench.py"],
            dict(bench_env, WFT_BENCH_ONLY=line), args.out, 3600)
        res = parse_bench(text)
        report["steps"][f"bench_{line}"] = {"rc": rc, **res}
        if res.get("primary"):
            persist_queue_echo({line: res["primary"]})

    peaks = {}
    if "probes" not in args.skip:
        rc1, t1 = run_step(
            "memprobe_manual", [sys.executable, "tools/probe_split_memory.py"],
            {"WFT_MANUAL": 1}, args.out, 3000)
        rc2, t2 = run_step(
            "memprobe_precast", [sys.executable, "tools/probe_split_memory.py"],
            {"WFT_MANUAL": 1, "WFT_MANUAL_PRECAST": 1}, args.out, 3000)
        peaks = {"manual": parse_probe(t1), "manual_precast": parse_probe(t2)}
        report["steps"]["probes"] = {
            "rc": [rc1, rc2], **peaks,
        }

    # Rule 1 (inverted since precast became the shipped default, round 4):
    # the baseline bench's Muon line already runs PRECAST; the contrast run
    # forces slice-cast (WFT_BENCH_MUON_PRECAST=0). Recommend flipping the
    # default OFF only if slice-cast measures faster.
    pre = peaks.get("manual_precast") or {}
    precast_fits = bool(pre) and all(
        v <= hbm_gib - args.headroom_gib for v in pre.values()
    )
    report["precast_fits_with_headroom"] = precast_fits
    if "precast-bench" not in args.skip:
        rc, text = run_step(
            "bench_muon_slicecast", [sys.executable, "bench.py"],
            dict(bench_env, WFT_BENCH_ONLY="muon", WFT_BENCH_MUON_PRECAST=0),
            args.out, 3600)
        pc = parse_bench(text)
        report["steps"]["bench_muon_slicecast"] = {"rc": rc, **pc}
        base_muon = bench_res.get("muon")
        if (base_muon and pc.get("muon")
                and pc["muon"]["step_time_s"] < base_muon["step_time_s"]):
            report["recommendations"].append({
                "rule": 1,
                "action": "slice-cast beat the precast default: set "
                "training.manual_precast_weights: false in "
                "configs/config_large_v3_best_muon_1chip.yaml and default "
                "WFT_BENCH_MUON_PRECAST=0 in bench.py's Muon line",
                "slice_cast_step_s": pc["muon"]["step_time_s"],
                "precast_step_s": base_muon["step_time_s"],
            })

    ladder = {}
    if "ladder" not in args.skip:
        cases = [c for c in args.ladder_cases.split(",") if c]
        rc, text = run_step(
            "ladder", [sys.executable, "tools/bench_remat_ladder.py", *cases],
            {}, args.out, 18000)
        ladder = parse_ladder(text)
        report["steps"]["ladder"] = {"rc": rc, "cases": ladder}

    # Rule 2: best ladder case vs the primary line's measured step.
    primary = bench_res.get("primary")
    timed = {k: v for k, v in ladder.items() if "step_ms" in v}
    if primary and timed:
        # Rank per-SAMPLE: a ladder step processes batch*accum samples
        # (b8_accum2 runs two microbatches per step).
        best = min(timed, key=lambda k: timed[k]["step_ms"] /
                   max(timed[k]["batch"] * timed[k].get("accum", 1), 1))
        best_hps = timed[best]["audio_hps"]
        if best_hps > primary["value"]:
            over, batch, extra_env = LADDER_TO_BENCH.get(best, ({}, 6, {}))
            report["recommendations"].append({
                "rule": 2,
                "action": "bake this fcfg into bench.py's primary line "
                "(and the 1chip YAML remat/attention keys)",
                "case": best,
                "audio_hps": best_hps,
                "primary_audio_hps": primary["value"],
                "env": {
                    "WFT_BENCH_PRIMARY_OVERRIDES": json.dumps(over),
                    "WFT_BENCH_PRIMARY_BATCH": batch,
                    **extra_env,
                },
            })

    # End-to-end throughput through the real driver (loader -> H2D -> step;
    # VERDICT r4 item 5): tools/bench_e2e.py runs scripts/finetune.py on a
    # synthetic dataset and reports host feed rate vs device step rate.
    if "e2e" not in args.skip:
        rc, text = run_step(
            "e2e_driver", [sys.executable, "tools/bench_e2e.py"],
            {"WFT_ALLOW_RANDOM_INIT": 1}, args.out, 7200)
        e2e = {}
        for ln in text.splitlines():
            if ln.startswith("RESULT e2e "):
                try:
                    e2e = json.loads(ln[len("RESULT e2e "):])
                except json.JSONDecodeError:
                    pass
        report["steps"]["e2e_driver"] = {"rc": rc, **e2e}
        if e2e:
            persist_queue_echo({"e2e": e2e})

    path = os.path.join(args.out, "report.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    log(f"report written to {path}")
    print(json.dumps({"report": path,
                      "recommendations": report["recommendations"]}))


if __name__ == "__main__":
    main()
