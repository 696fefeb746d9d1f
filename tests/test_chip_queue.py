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
    # exact format of tools/bench_remat_ladder.py bench_case(), which
    # inserts 'accum=N' between batch and peak_hbm (round-4 regression:
    # the parser's regex predated the accum field and silently dropped
    # every successful case, so rule 2 never fired)
    text = (
        "RESULT cross_splash_nocast: step=941.2 ms  audio-h/s=0.0531  "
        "batch=6  accum=1  peak_hbm=14.91 GiB  (setup+compile 142s)\n"
        "RESULT b8_accum2: step=2510.0 ms  audio-h/s=0.0531  "
        "batch=8  accum=2  peak_hbm=14.20 GiB  (setup+compile 142s)\n"
        "RESULT cs_nocast_save_probs: FAILED XlaRuntimeError: Exceeded hbm "
        "capacity\n"
        # pre-accum-field format (older committed logs) still parses
        "RESULT old_format_case: step=900.0 ms  audio-h/s=0.0500  "
        "batch=6  peak_hbm=None GiB\n"
    )
    cases = parse_ladder(text)
    assert cases["cross_splash_nocast"]["step_ms"] == 941.2
    assert cases["cross_splash_nocast"]["audio_hps"] == 0.0531
    assert cases["cross_splash_nocast"]["batch"] == 6
    assert cases["cross_splash_nocast"]["accum"] == 1
    assert cases["cross_splash_nocast"]["peak_hbm_gib"] == 14.91
    assert cases["b8_accum2"]["accum"] == 2
    assert "Exceeded hbm" in cases["cs_nocast_save_probs"]["failed"]
    assert cases["old_format_case"]["accum"] == 1
    assert cases["old_format_case"]["peak_hbm_gib"] is None


def test_rule2_ranking_normalizes_by_batch_times_accum():
    """b8_accum2 processes 16 samples/step; ranking by step_ms/batch alone
    scored it 2x too slow (advisor, round 4)."""
    timed = {
        "cross_splash_batch8": {"step_ms": 1000.0, "batch": 8, "accum": 1},
        "b8_accum2": {"step_ms": 1900.0, "batch": 8, "accum": 2},
    }
    best = min(timed, key=lambda k: timed[k]["step_ms"] /
               max(timed[k]["batch"] * timed[k].get("accum", 1), 1))
    assert best == "b8_accum2"


def test_ladder_to_bench_table_pinned_to_ladder_cases():
    """Rule 2's recommendation env must reproduce exactly the ladder case
    that won: the override dict and batch are pinned to the ladder's CASES
    so editing one without the other fails here."""
    from tools.bench_remat_ladder import CASES

    for name in DEFAULT_LADDER_CASES:
        assert name in CASES, name
        assert name in LADDER_TO_BENCH, name
        over, batch, extra_env = LADDER_TO_BENCH[name]
        case = CASES[name]
        assert batch == case[0], name
        assert over == case[1], name
        extras = case[3] if len(case) > 3 else {}
        # env-knob cases (vmem ceilings) must carry the same env in the
        # bench recommendation; ladder-level accum maps to the bench's
        # WFT_BENCH_PRIMARY_ACCUM knob
        if "env" in extras:
            for k, v in extras["env"].items():
                assert extra_env.get(k) == v, name
        if extras.get("accum", 1) != 1:
            assert extra_env.get("WFT_BENCH_PRIMARY_ACCUM") == str(
                extras["accum"]), name
