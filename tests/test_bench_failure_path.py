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


def test_stale_result_prefers_newer_chip_queue_measurement(tmp_path):
    """A mid-round measurement persisted by tools/run_chip_queue.py
    (docs/logs/chip_queue_bench.json) outranks the driver rounds it names
    in after_round, but an older queue file loses to a newer driver
    artifact."""
    sys.path.insert(0, REPO)
    from bench import _load_stale_result

    (tmp_path / "BENCH_r02.json").write_text(json.dumps(
        {"n": 2, "parsed": {"value": 0.05, "unit": "audio-hours/sec/chip"}}))
    rec, src = _load_stale_result(str(tmp_path))
    assert (rec["value"], src) == (0.05, "BENCH_r02.json")

    qdir = tmp_path / "docs" / "logs"
    qdir.mkdir(parents=True)
    queue = qdir / "chip_queue_bench.json"
    queue.write_text(json.dumps(
        {"after_round": 2, "primary": {"value": 0.061}}))
    rec, src = _load_stale_result(str(tmp_path))
    assert (rec["value"], src) == (0.061, "chip_queue_bench.json")

    # A later driver round supersedes the queue measurement.
    (tmp_path / "BENCH_r04.json").write_text(json.dumps(
        {"n": 4, "parsed": {"value": 0.058}}))
    rec, src = _load_stale_result(str(tmp_path))
    assert (rec["value"], src) == (0.058, "BENCH_r04.json")


def test_stale_result_skips_or_unwraps_failure_envelopes(tmp_path):
    """Round-4 regression: a driver artifact can itself be a failure
    envelope ({"error": ..., "stale": {...}}) from a tunnel-down round.
    It must never be echoed verbatim (unit-less nested garbage); the
    nested measurement is unwrapped, and a pure-error record (no nested
    stale) is skipped in favor of the newest real measurement."""
    sys.path.insert(0, REPO)
    from bench import _load_stale_result

    (tmp_path / "BENCH_r02.json").write_text(json.dumps(
        {"n": 2, "parsed": {"value": 0.05, "unit": "audio-hours/sec/chip"}}))
    # Failure envelope with a nested stale measurement: unwrap it (it is
    # the newest round, so it wins over r02).
    (tmp_path / "BENCH_r04.json").write_text(json.dumps(
        {"n": 4, "parsed": {"error": "bench did not run",
                            "stale": {"value": 0.0525,
                                      "unit": "audio-hours/sec/chip"}}}))
    rec, src = _load_stale_result(str(tmp_path))
    assert (rec["value"], rec["unit"], src) == (
        0.0525, "audio-hours/sec/chip", "BENCH_r04.json")

    # A pure error record with nothing to unwrap is skipped entirely.
    (tmp_path / "BENCH_r05.json").write_text(json.dumps(
        {"n": 5, "parsed": {"error": "bench did not run",
                            "reason": "tunnel down"}}))
    rec, src = _load_stale_result(str(tmp_path))
    assert (rec["value"], src) == (0.0525, "BENCH_r04.json")
