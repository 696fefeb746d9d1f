"""Logit-filter tests: whisper's SuppressTokens / SuppressBlank /
ApplyTimestampRules semantics (openai-whisper whisper/decoding.py) verified
against hand-built logit cases, plus structural checks on a real greedy
decode with the rules active."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_finetune_tpu.models import ForwardConfig, ModelDimensions, init_params
from whisper_finetune_tpu.models.decoding import DecodeFilters, greedy_decode

# small synthetic vocabulary: ids 0-7 text, 8 = eot, 9 = <|notimestamps|>,
# 10.. = timestamps
V = 16
EOT = 8
TSB = 10

FILTERS = DecodeFilters(
    timestamp_rules=True,
    timestamp_begin=TSB,
    eot=EOT,
    max_initial_timestamp_index=3,
)


def _apply(logits, prev1, prev2, max_ts, n_sampled, filters=FILTERS):
    out = filters.apply(
        jnp.asarray(logits, jnp.float32),
        jnp.asarray(prev1, jnp.int32),
        jnp.asarray(prev2, jnp.int32),
        jnp.asarray(max_ts, jnp.int32),
        n_sampled,
    )
    return np.asarray(out)


def test_first_token_must_be_initial_timestamp():
    logits = np.zeros((1, V), np.float32)
    out = _apply(logits, [0], [0], [0], 0)
    # all text (ids < TSB) masked; timestamps allowed only within
    # [TSB, TSB + max_initial_timestamp_index]
    assert np.all(np.isneginf(out[0, :TSB]))
    assert np.all(np.isfinite(out[0, TSB : TSB + 4]))
    assert np.all(np.isneginf(out[0, TSB + 4 :]))


def test_lone_timestamp_forces_timestamp_or_eot():
    # sampled so far: [text, <|ts_11|>] -> next must be a timestamp >= 11
    # or eot (whisper: "cannot be normal text tokens"); eot kept dominant so
    # the separate sum-of-timestamp-probability rule stays out of the way
    logits = np.zeros((1, V), np.float32)
    logits[0, EOT] = 10.0
    out = _apply(logits, [11], [3], [11], 2)
    assert np.all(np.isneginf(out[0, :EOT]))  # text masked
    assert np.isfinite(out[0, EOT])  # eot allowed
    assert np.isneginf(out[0, TSB])  # monotonicity: ts < last masked
    assert np.all(np.isfinite(out[0, 11:]))  # ts >= last allowed


def test_closed_pair_forbids_immediate_timestamp():
    # sampled: [<|ts_11|>, <|ts_12|>] (a closed pair) -> no timestamp next
    logits = np.zeros((1, V), np.float32)
    logits[0, :EOT] = 10.0  # keep text dominant so the sum rule stays off
    out = _apply(logits, [12], [11], [12], 3)
    assert np.all(np.isneginf(out[0, TSB:]))
    assert np.all(np.isfinite(out[0, :EOT]))


def test_timestamp_probability_sum_rule():
    # timestamps' total probability above the best text token -> text masked
    logits = np.zeros((1, V), np.float32)  # uniform: 6 ts ids vs 1/16 text
    out = _apply(logits, [3], [2], [0], 2)
    assert np.all(np.isneginf(out[0, :TSB]))
    assert np.all(np.isfinite(out[0, TSB:]))
    # and with one text token dominant, nothing is masked by the sum rule
    logits2 = np.zeros((1, V), np.float32)
    logits2[0, 5] = 8.0
    out2 = _apply(logits2, [3], [2], [0], 2)
    assert np.isfinite(out2[0, 5])
    assert np.all(np.isfinite(out2[0, TSB:]))


def test_suppress_and_blank():
    filters = DecodeFilters(suppress=(1, 9), blank=(2, EOT))
    logits = np.zeros((2, V), np.float32)
    first = _apply(logits, [0, 0], [0, 0], [0, 0], 0, filters)
    assert np.all(np.isneginf(first[:, [1, 9]]))  # always suppressed
    assert np.all(np.isneginf(first[:, [2, EOT]]))  # blank at position 0
    later = _apply(logits, [3, 4], [2, 2], [0, 0], 5, filters)
    assert np.all(np.isneginf(later[:, [1, 9]]))
    assert np.all(np.isfinite(later[:, [2, EOT]]))


def test_greedy_decode_respects_timestamp_rules():
    """Structural invariants on a random tiny model: first sampled token is
    a timestamp in the initial window, timestamps never decrease, suppressed
    ids never appear."""
    dims = ModelDimensions(
        n_mels=16, n_audio_ctx=32, n_audio_state=32, n_audio_head=2,
        n_audio_layer=2, n_vocab=128, n_text_ctx=24, n_text_head=2,
        n_text_state=32, n_text_layer=2,
    )
    eot, tsb = 96, 100
    filters = DecodeFilters(
        suppress=(7, 13), timestamp_rules=True, timestamp_begin=tsb,
        eot=eot, max_initial_timestamp_index=5,
    )
    params = init_params(jax.random.PRNGKey(0), dims)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(
        rng.standard_normal((2, dims.n_mels, dims.n_audio_ctx * 2)).astype(
            np.float32
        )
    )
    init = jnp.asarray([[90, 91], [90, 91]], jnp.int32)
    tokens, _ = greedy_decode(
        params, mel, init, eot, dims, ForwardConfig(compute_dtype="float32"),
        max_len=18, filters=filters,
    )
    tokens = np.asarray(tokens)
    for row in tokens:
        assert tsb <= row[0] <= tsb + 5, row  # initial timestamp window
        ts_seen = [int(t) for t in row if t >= tsb]
        assert ts_seen == sorted(ts_seen), row  # monotone timestamps
        gen = [int(t) for t in row if t != eot]
        assert 7 not in gen and 13 not in gen, row  # suppressed ids
