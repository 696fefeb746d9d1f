"""Chip measurement queue: wait for the accelerator, run the queued
probes + ladder + bench in order, apply the perf decision rules, and
write one JSON report — so any session (or the driver) resumes the
round-3/4 measurement debt with a single command.

The queue (docs/perf_round3.md "Chip-measurement status"):

  1. ``python bench.py``                      — both headline lines
  2. ``WFT_MANUAL=1 tools/probe_split_memory.py``             (slice-cast)
  3. ``WFT_MANUAL=1 WFT_MANUAL_PRECAST=1 tools/probe_split_memory.py``
  4. if the precast programs fit with >= 1 GiB HBM headroom: time the Muon
     flagship with ``WFT_BENCH_MUON_PRECAST=1`` (bench.py env knob)
  5. ``tools/bench_remat_ladder.py <cases>``  — post-reduction-CE re-sweep

Decision rules encoded (docs/perf_round3.md:115-131):

  * rule 1 — if manual+precast fits (accum AND update program peaks leave
    >= 1 GiB of the chip's HBM) and its timed Muon step beats the
    slice-cast run, recommend ``training.manual_precast_weights: true``
    (bench.py Muon line + configs/config_large_v3_best_muon_1chip.yaml).
  * rule 2 — if a ladder case beats the primary line's measured step
    time, recommend baking its fcfg into bench.py's primary workload
    (the report carries the exact WFT_BENCH_PRIMARY_OVERRIDES JSON).

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
DEFAULT_LADDER_CASES = [
    "cs_nocast_save_enc_qkv_only",
    "cs_nocast_save_probs",
    "cs_nocast_save_probs_qkv",
    "cs_nocast_save_enc_qkv",
    "cs_nocast_save_enc_ln",
    "cross_splash_nocast",
    "cross_splash_batch7",
    "cross_splash_batch8",
    "cs_nocast_save_enc_qkv_b7",
    "unroll2_cross_splash",
]
# Ladder case name -> (bench primary env overrides, batch). Mirrors
# tools/bench_remat_ladder.py CASES so rule 2's recommendation is
# directly actionable.
LADDER_TO_BENCH = {
    "cs_nocast_save_enc_qkv_only": (
        {"attn_impl_cross": "splash", "precast_weights": False,
         "remat_policy": "save:enc_qkv"}, 6),
    "cs_nocast_save_probs": (
        {"attn_impl_cross": "splash", "precast_weights": False,
         "remat_policy": "save:attn_probs"}, 6),
    "cs_nocast_save_probs_qkv": (
        {"attn_impl_cross": "splash", "precast_weights": False,
         "remat_policy": "save:attn_probs,dec_qkv,dec_mlp_h"}, 6),
    "cs_nocast_save_enc_qkv": (
        {"attn_impl_cross": "splash", "precast_weights": False,
         "remat_policy": "save:enc_qkv,enc_mlp_h"}, 6),
    "cs_nocast_save_enc_ln": (
        {"attn_impl_cross": "splash", "precast_weights": False,
         "remat_policy": "save:enc_ln1,enc_ln2,dec_qkv"}, 6),
    "cross_splash_nocast": (
        {"attn_impl_cross": "splash", "precast_weights": False}, 6),
    "cross_splash_batch7": ({"attn_impl_cross": "splash"}, 7),
    "cross_splash_batch8": ({"attn_impl_cross": "splash"}, 8),
    "cs_nocast_save_enc_qkv_b7": (
        {"attn_impl_cross": "splash", "precast_weights": False,
         "remat_policy": "save:enc_qkv"}, 7),
    "unroll2_cross_splash": ({"attn_impl_cross": "splash"}, 6),
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
        m = re.match(
            r"RESULT (\S+): step=([\d.]+) ms\s+audio-h/s=([\d.]+)"
            r"\s+batch=(\d+)\s+peak_hbm=([\d.]+|None) GiB", line,
        )
        if m:
            cases[m.group(1)] = {
                "step_ms": float(m.group(2)),
                "audio_hps": float(m.group(3)),
                "batch": int(m.group(4)),
                "peak_hbm_gib": (
                    None if m.group(5) == "None" else float(m.group(5))
                ),
            }
        else:
            m = re.match(r"RESULT (\S+): FAILED (.*)", line)
            if m:
                cases[m.group(1)] = {"failed": m.group(2)}
    return cases


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--wait-hours", type=float, default=0.0,
                    help="poll budget while the chip is down (default: one "
                    "probe, exit 3 if dead)")
    ap.add_argument("--out", default="/tmp/chip_queue_run")
    ap.add_argument("--skip", action="append", default=[],
                    choices=["bench", "probes", "precast-bench", "ladder"])
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
        rc, text = run_step("bench", [sys.executable, "bench.py"], bench_env,
                            args.out, 5400)
        bench_res = parse_bench(text)
        report["steps"]["bench"] = {"rc": rc, **bench_res}
        if bench_res.get("primary"):
            # Persist the measurement where bench.py's stale-echo finds it
            # (docs/logs/chip_queue_bench.json): if the tunnel dies again
            # before the driver's end-of-round bench, the round artifact
            # carries THIS number instead of an older round's.
            rounds = [
                int(m.group(1))
                for p in os.listdir(REPO)
                if (m := re.match(r"BENCH_r(\d+)\.json$", p))
            ]
            dest = os.path.join(REPO, "docs", "logs",
                                "chip_queue_bench.json")
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            with open(dest, "w") as f:
                json.dump({
                    "after_round": max(rounds, default=0),
                    "primary": bench_res["primary"],
                    "muon": bench_res.get("muon"),
                }, f, indent=2)
            log(f"bench measurement persisted to {dest} (commit it)")

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

    # Rule 1: precast fits with headroom -> time it, flip if faster.
    pre = peaks.get("manual_precast") or {}
    precast_fits = bool(pre) and all(
        v <= hbm_gib - args.headroom_gib for v in pre.values()
    )
    report["precast_fits_with_headroom"] = precast_fits
    if precast_fits and "precast-bench" not in args.skip:
        rc, text = run_step(
            "bench_muon_precast", [sys.executable, "bench.py"],
            dict(bench_env, WFT_BENCH_ONLY="muon", WFT_BENCH_MUON_PRECAST=1),
            args.out, 3600)
        pc = parse_bench(text)
        report["steps"]["bench_muon_precast"] = {"rc": rc, **pc}
        base_muon = bench_res.get("muon")
        if (base_muon and pc.get("muon")
                and pc["muon"]["step_time_s"] < base_muon["step_time_s"]):
            report["recommendations"].append({
                "rule": 1,
                "action": "set training.manual_precast_weights: true in "
                "configs/config_large_v3_best_muon_1chip.yaml and pass "
                "manual_precast=True in bench.py's Muon line",
                "precast_step_s": pc["muon"]["step_time_s"],
                "slice_cast_step_s": base_muon["step_time_s"],
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
        best = min(timed, key=lambda k: timed[k]["step_ms"] /
                   max(timed[k]["batch"], 1))
        best_hps = timed[best]["audio_hps"]
        if best_hps > primary["value"]:
            over, batch = LADDER_TO_BENCH.get(best, ({}, 6))
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
                },
            })

    path = os.path.join(args.out, "report.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    log(f"report written to {path}")
    print(json.dumps({"report": path,
                      "recommendations": report["recommendations"]}))


if __name__ == "__main__":
    main()
