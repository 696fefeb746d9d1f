"""bench.py must stay parseable when the accelerator is down.

Round-3's BENCH artifact was rc=124/parsed=null because in-process backend
retries consumed the driver's harness budget. The contract now: one bounded
subprocess probe; on failure, ONE JSON line with the error and the last
committed measurement echoed as stale, exit 0, well inside a minute.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_json_when_backend_unavailable():
    env = dict(os.environ, WFT_BENCH_FORCE_PROBE_FAIL="1")
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=60, env=env, cwd=REPO,
    )
    elapsed = time.time() - t0
    assert out.returncode == 0, out.stderr
    assert elapsed < 60
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert len(lines) == 1, out.stdout
    record = json.loads(lines[0])
    assert record["error"] == "bench did not run"
    assert "forced probe failure" in record["reason"]
    # The committed round-2 measurement must be echoed, marked stale.
    stale = record["stale"]
    assert stale["stale"] is True
    assert stale["unit"] == "audio-hours/sec/chip"
    assert stale["value"] > 0
