"""tools/run_chip_queue.py: the committed measurement-queue tool.

The tool orchestrates chip-only work (probes + ladder + bench) so its
parsers and its decision-rule tables are what CAN be tested off-chip:
the output formats it parses are produced by code in this repo, so each
parser is tested against the exact writer's format, and the ladder->bench
override table is pinned to tools/bench_remat_ladder.py's CASES dict so
the two cannot drift apart silently.
"""

import json

from tools.run_chip_queue import (
    DEFAULT_LADDER_CASES,
    LADDER_TO_BENCH,
    parse_bench,
    parse_ladder,
    parse_probe,
)


def test_parse_bench_two_lines_and_failure():
    text = "\n".join([
        "# some log noise",
        json.dumps({"metric": "fine-tune audio-hours/sec/chip (large-v3 "
                    "full fine-tune (8-bit state, bf16 accum), fused "
                    "on-device featurize)", "value": 0.0514,
                    "unit": "audio-hours/sec/chip", "step_time_s": 0.972}),
        json.dumps({"metric": "fine-tune audio-hours/sec/chip (large-v3 "
                    "Muon flagship, accum 8, fused on-device featurize)",
                    "value": 0.045, "step_time_s": 8.9}),
    ])
    res = parse_bench(text)
    assert res["primary"]["value"] == 0.0514
    assert res["muon"]["step_time_s"] == 8.9

    res = parse_bench(json.dumps(
        {"error": "bench did not run", "reason": "probe failed"}))
    assert res["error"]["reason"] == "probe failed"
    assert "primary" not in res


def test_parse_probe_matches_probe_split_memory_format():
    # exact format of tools/probe_split_memory.py report()
    text = (
        "accum  [accum=8 B=6 manual=1 mprecast=0]: args 8.86 GiB, out 2.91, "
        "alias 2.91, temp 5.95, peak(args+temp+unaliased-out) 11.90 GiB\n"
        "update [accum=8 B=6 manual=1 mprecast=0]: args 11.77 GiB, "
        "out 8.86, alias 8.86, temp 1.31, "
        "peak(args+temp+unaliased-out) 13.08 GiB\n"
    )
    peaks = parse_probe(text)
    assert peaks == {"accum": 11.90, "update": 13.08}


def test_parse_ladder_matches_bench_remat_ladder_format():
    # exact format of tools/bench_remat_ladder.py bench_case()
    text = (
        "RESULT cross_splash_nocast: step=941.2 ms  audio-h/s=0.0531  "
        "batch=6  peak_hbm=14.91 GiB  (setup+compile 142s)\n"
        "RESULT cs_nocast_save_probs: FAILED XlaRuntimeError: Exceeded hbm "
        "capacity\n"
    )
    cases = parse_ladder(text)
    assert cases["cross_splash_nocast"]["step_ms"] == 941.2
    assert cases["cross_splash_nocast"]["audio_hps"] == 0.0531
    assert cases["cross_splash_nocast"]["batch"] == 6
    assert cases["cross_splash_nocast"]["peak_hbm_gib"] == 14.91
    assert "Exceeded hbm" in cases["cs_nocast_save_probs"]["failed"]


def test_ladder_to_bench_table_pinned_to_ladder_cases():
    """Rule 2's recommendation env must reproduce exactly the ladder case
    that won: the override dict and batch are pinned to the ladder's CASES
    so editing one without the other fails here."""
    from tools.bench_remat_ladder import CASES

    for name in DEFAULT_LADDER_CASES:
        assert name in CASES, name
        assert name in LADDER_TO_BENCH, name
        over, batch = LADDER_TO_BENCH[name]
        case = CASES[name]
        assert batch == case[0], name
        assert over == case[1], name
