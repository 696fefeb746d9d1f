"""Round-5 follow-up chip queue: the targeted remainder after the full
tools/run_chip_queue.py pass (2026-08-19, /tmp/chip_queue_r5).

  1. ``python bench.py``            — live validation of the newly-baked
                                      primary defaults (batch 8 +
                                      xla_tpu_scoped_vmem_limit_kib=32768)
  2. accum-8 primary at batch 5     — the queue's batch-6 attempt OOM'd at
     (then 4 on OOM)                  runtime (the round-4 "fit" was an
                                      abstract compile analysis with only
                                      ~0.5 GiB margin); weak #4 needs ANY
                                      measured accum-8 number
  3. ``tools/probe_second_call.py`` — small shape, then the flagship
                                      shape: per-call times + XLA compile
                                      counts for the ~98 s first-call
                                      anomaly (weak #5)
  4. ``tools/bench_e2e.py``         — re-run after the split-mode
                                      histogram fix (the first run OOM'd
                                      on the hist-in-cond accum program)

Usage: python tools/run_chip_followup.py [--wait-hours H] [--out DIR]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from run_chip_queue import (  # noqa: E402
    REPO,
    log,
    parse_bench,
    persist_queue_echo,
    run_step,
    wait_for_chip,
)


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--wait-hours", type=float, default=10.0)
    ap.add_argument("--out", default="/tmp/chip_followup_r5")
    ap.add_argument("--skip", action="append", default=[],
                    help="step names to skip (bench, accum8, secondcall, e2e)")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    hbm = wait_for_chip(args.wait_hours)
    if hbm is None:
        log("wait budget expired with the chip down")
        sys.exit(3)
    log(f"chip alive, HBM limit {hbm / 2**30:.2f} GiB")

    report = {"started": time.strftime("%Y-%m-%d %H:%M:%S"), "steps": {}}
    bench_env = {"WFT_BENCH_PROBE_TIMEOUT": 300, "WFT_BENCH_BACKEND_TRIES": 2,
                 "WFT_BENCH_DEADLINE_S": 4800}

    if "bench" not in args.skip:
        rc, text = run_step("bench", [sys.executable, "bench.py"],
                            bench_env, args.out, 5400)
        res = parse_bench(text)
        report["steps"]["bench"] = {"rc": rc, **res}
        updates = {k: v for k, v in res.items() if k in ("primary", "muon")}
        if updates:
            persist_queue_echo(updates)

    if "accum8" not in args.skip:
        for batch in (5, 4):
            rc, text = run_step(
                f"bench_primary_accum8_b{batch}",
                [sys.executable, "bench.py"],
                dict(bench_env, WFT_BENCH_ONLY="primary",
                     WFT_BENCH_PRIMARY_ACCUM=8, WFT_BENCH_PRIMARY_SPLIT=1,
                     WFT_BENCH_PRIMARY_BATCH=batch),
                args.out, 5400)
            res = parse_bench(text)
            report["steps"][f"accum8_b{batch}"] = {"rc": rc, **res}
            if res.get("primary", {}).get("value"):
                persist_queue_echo({"primary_accum8": res["primary"]})
                break
            log(f"accum-8 at batch {batch} did not produce a number; "
                + ("retrying smaller" if batch != 4 else "giving up"))

    if "secondcall" not in args.skip:
        rc, text = run_step(
            "secondcall_small",
            [sys.executable, "tools/probe_second_call.py"],
            {"WFT_CALLS": 5}, args.out, 3600)
        report["steps"]["secondcall_small"] = {"rc": rc}
        rc, text = run_step(
            "secondcall_flagship",
            [sys.executable, "tools/probe_second_call.py"],
            {"WFT_PRESET": "large-v3", "WFT_ACCUM": 8, "WFT_BATCH": 6,
             "WFT_CALLS": 3}, args.out, 5400)
        report["steps"]["secondcall_flagship"] = {"rc": rc}

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
        if e2e.get("audio_hours_per_sec_e2e"):
            persist_queue_echo({"e2e": e2e})

    path = os.path.join(args.out, "report.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    log(f"report written to {path}")
    print(json.dumps({"report": path}))


if __name__ == "__main__":
    main()
