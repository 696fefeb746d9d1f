"""Autoregressive decoding with a KV cache: greedy, temperature sampling,
and beam search, plus whisper's temperature-fallback heuristic.

The reference never generates during training (evaluation is teacher-forced,
evaluator.py:69-73) and delegates inference to CT2/faster-whisper. This
module adds an on-TPU transcription path anyway — one jitted program per
(batch, max_len[, beam]) shape:

* the audio encoder runs once; every decoder layer's cross-attention K/V are
  precomputed in one batched einsum over the stacked layer axis,
* the token loop is a ``lax.scan`` over positions; each step updates the
  (L, B[, K], max_len, d) self-attention cache with ``dynamic_update_slice``
  and attends over a position-masked static window (no dynamic shapes),
* finished sequences are frozen at ``eot``,
* beam search flattens beams into the batch axis and reorders the caches
  with one gather per step; sequences are selected by summed log-prob
  (optional length normalization), matching whisper's BeamSearchDecoder
  selection rule,
* ``transcribe_batch`` applies whisper's decode fallback: greedy-or-beam at
  temperature 0, retried per-sample at increasing temperatures when the
  zlib compression ratio or average log-prob trips the thresholds.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from whisper_finetune_tpu.models.dims import ModelDimensions
from whisper_finetune_tpu.models.whisper import (
    ForwardConfig,
    Params,
    _dense,
    encoder_forward,
    layer_norm,
)


# ---------------------------------------------------------------------------
# Logit filters (whisper decoding.LogitFilter semantics, traced)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DecodeFilters:
    """Static logit-filter configuration for the jitted decoders — the
    openai-whisper filter stack (whisper/decoding.py SuppressTokens,
    SuppressBlank, ApplyTimestampRules) as trace-time constants.

    ``suppress``: ids masked to -inf at every step (non-speech symbols +
    task/special tokens — whisper ``_get_suppress_tokens``).
    ``blank``: ids masked only at the first sampled position (" " and eot —
    whisper SuppressBlank).
    ``timestamp_rules``: enable ApplyTimestampRules (pairing, monotonicity,
    initial-timestamp window, timestamp-probability override).
    """

    suppress: Tuple[int, ...] = ()
    blank: Tuple[int, ...] = ()
    timestamp_rules: bool = False
    timestamp_begin: int = 0
    eot: int = 0
    max_initial_timestamp_index: Optional[int] = None

    def apply(self, logits, prev1, prev2, max_ts, n_sampled):
        """Filter fp32 logits (N, V). ``prev1``/``prev2`` (N,) are the last
        two sampled token ids (garbage when out of range — gated by
        ``n_sampled``, the number of tokens sampled so far, a traced
        scalar). ``max_ts`` (N,) is the largest timestamp token sampled so
        far (any value < timestamp_begin means none)."""
        if self.suppress:
            logits = logits.at[:, jnp.asarray(self.suppress)].set(-jnp.inf)
        if self.blank:
            blanked = logits.at[:, jnp.asarray(self.blank)].set(-jnp.inf)
            logits = jnp.where(n_sampled == 0, blanked, logits)
        if self.timestamp_rules:
            logits = self._timestamp_rules(
                logits, prev1, prev2, max_ts, n_sampled
            )
        return logits

    def _timestamp_rules(self, logits, prev1, prev2, max_ts, n_sampled):
        """openai-whisper ApplyTimestampRules.apply, as masks:

        * timestamps come in pairs, except directly before eot: after a
          lone timestamp only a timestamp (or eot) may follow; after a
          completed pair a timestamp may not immediately follow,
        * timestamps are non-decreasing (whisper masks below the *last*
          timestamp; under the pairing rules the last is the max, which is
          what's tracked here),
        * the first sampled token must be a timestamp, within
          ``max_initial_timestamp_index`` of <|0.00|>,
        * when the total timestamp probability exceeds the most likely
          text token's, only timestamps may be sampled.
        """
        tsb = self.timestamp_begin
        V = logits.shape[-1]
        ids = jnp.arange(V)
        is_ts = ids >= tsb
        neg = jnp.float32(-jnp.inf)

        last_was = (prev1 >= tsb) & (n_sampled >= 1)
        penult_was = (prev2 >= tsb) | (n_sampled < 2)
        sup_ts = last_was & penult_was  # pair complete -> text next
        sup_text = last_was & ~penult_was  # lone timestamp -> ts/eot only
        mask = jnp.where(sup_ts[:, None] & is_ts[None, :], neg, 0.0)
        mask = mask + jnp.where(
            sup_text[:, None] & (ids < self.eot)[None, :], neg, 0.0
        )

        # monotonicity: mask timestamp ids below the last timestamp
        # (strictly below when mid-pair, at-or-below once the pair closed)
        have_ts = max_ts >= tsb
        ts_last = jnp.where(sup_text, max_ts, max_ts + 1)
        mono = (
            have_ts[:, None]
            & is_ts[None, :]
            & (ids[None, :] < ts_last[:, None])
        )
        mask = mask + jnp.where(mono, neg, 0.0)

        # first sampled token: timestamps only, within the initial window
        init_blocked = ~is_ts
        if self.max_initial_timestamp_index is not None:
            init_blocked = init_blocked | (
                ids > tsb + self.max_initial_timestamp_index
            )
        mask = mask + jnp.where(
            (n_sampled == 0) & init_blocked[None, :], neg, 0.0
        )
        logits = logits + mask

        # if sum-of-timestamp probability beats the best text token,
        # sample only timestamps
        logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ts_lp = jax.nn.logsumexp(
            jnp.where(is_ts[None, :], logprobs, -jnp.inf), axis=-1
        )
        max_text_lp = jnp.max(
            jnp.where(is_ts[None, :], -jnp.inf, logprobs), axis=-1
        )
        force_ts = ts_lp > max_text_lp
        return jnp.where(force_ts[:, None] & ~is_ts[None, :], neg, logits)


def default_filters(
    tokenizer,
    without_timestamps: bool = True,
    suppress_blank: bool = True,
    suppress_tokens: bool = True,
    max_initial_timestamp: Optional[float] = 1.0,
) -> DecodeFilters:
    """The whisper DecodingTask filter stack for this tokenizer
    (whisper/decoding.py ``_get_suppress_tokens`` + ``_get_initial_tokens``
    defaults): non-speech symbols and task/special tokens always suppressed,
    blank suppressed at the first position, timestamp rules active unless
    ``without_timestamps``."""
    suppress: Tuple[int, ...] = ()
    if suppress_tokens:
        ids = set(tokenizer.non_speech_tokens)
        ids.update(
            (
                tokenizer.transcribe,
                tokenizer.translate,
                tokenizer.sot,
                tokenizer.sot_prev,
                tokenizer.sot_lm,
            )
        )
        try:
            ids.add(tokenizer.no_speech)
        except KeyError:
            pass
        if not without_timestamps:
            # ApplyTimestampRules also pins <|notimestamps|> to -inf
            ids.add(tokenizer.no_timestamps)
        suppress = tuple(sorted(ids))
    blank: Tuple[int, ...] = ()
    if suppress_blank:
        blank = tuple(tokenizer.encode(" ")) + (tokenizer.eot,)
    max_init_idx = None
    if not without_timestamps and max_initial_timestamp is not None:
        max_init_idx = round(max_initial_timestamp / 0.02)
    return DecodeFilters(
        suppress=suppress,
        blank=blank,
        timestamp_rules=not without_timestamps,
        timestamp_begin=tokenizer.timestamp_begin,
        eot=tokenizer.eot,
        max_initial_timestamp_index=max_init_idx,
    )


def _attn_qkv(x, p, dtype):
    q = _dense(x, p["q_w"], p["q_b"], dtype)
    k = _dense(x, p["k_w"], None, dtype)
    v = _dense(x, p["v_w"], p["v_b"], dtype)
    return q, k, v


def _single_query_attention(q, k, v, n_head, dtype, mask=None):
    """q (B, d); k/v (B, S, d) -> (B, d). fp32 scores/softmax."""
    B, d = q.shape
    S = k.shape[1]
    d_head = d // n_head
    scale = float(d_head) ** -0.25
    qh = (q * scale).reshape(B, n_head, d_head)
    kh = (k * scale).reshape(B, S, n_head, d_head)
    vh = v.reshape(B, S, n_head, d_head)
    scores = jnp.einsum("bhd,bshd->bhs", qh, kh, preferred_element_type=jnp.float32)
    if mask is not None:
        scores = scores + mask[:, None, :]
    w = jax.nn.softmax(scores, axis=-1).astype(dtype)
    return jnp.einsum("bhs,bshd->bhd", w, vh).reshape(B, d)


def _eval_fcfg(fcfg: ForwardConfig) -> ForwardConfig:
    """Inference ForwardConfig for the encoder pass: keep the math-relevant
    fields incl. the per-site attention mix (the 1500-frame encoder forward
    is where the measured splash win lands; the decoder itself runs the
    KV-cached single-query path below, not block attention), strip
    train-only features."""
    return ForwardConfig(
        compute_dtype=fcfg.compute_dtype,
        remat_encoder=False,
        remat_decoder=False,
        lora_scale=fcfg.lora_scale,
        attn_impl=fcfg.attn_impl,
        attn_impl_encoder=fcfg.attn_impl_encoder,
        attn_impl_decoder=fcfg.attn_impl_decoder,
        attn_impl_cross=fcfg.attn_impl_cross,
    )


def _make_run_token(params, dims, dtype, cross_k, cross_v, max_len):
    """Closure: one decoder forward for one position over any batch size.

    ``token`` (N,), ``pos`` scalar, caches (L, N, max_len, d) ->
    (fp32 logits (N, V), new caches). ``cross_k``/``cross_v`` must carry the
    same batch N."""
    dec = params["decoder"]
    blocks = dec["blocks"]
    n_head = dims.n_text_head
    L = dims.n_text_layer

    def run_token(token, pos, cache_k, cache_v):
        x = dec["tok_emb"][token] + dec["pos_emb"][pos]
        x = x.astype(dtype)  # (N, d)
        N = x.shape[0]

        new_k, new_v = [], []
        for layer in range(L):
            bp = jax.tree_util.tree_map(lambda a: a[layer], blocks)
            x_ln = layer_norm(x, bp["attn_ln"])
            q, k_t, v_t = _attn_qkv(x_ln, bp["attn"], dtype)
            ck = jax.lax.dynamic_update_slice(
                cache_k[layer], k_t[:, None, :], (0, pos, 0)
            )
            cv = jax.lax.dynamic_update_slice(
                cache_v[layer], v_t[:, None, :], (0, pos, 0)
            )
            new_k.append(ck)
            new_v.append(cv)
            valid = jnp.arange(max_len) <= pos
            mask = jnp.where(valid, 0.0, -jnp.inf).astype(jnp.float32)[None, :]
            mask = jnp.broadcast_to(mask, (N, max_len))
            attn = _single_query_attention(q, ck, cv, n_head, dtype, mask)
            x = x + _dense(attn, bp["attn"]["o_w"], bp["attn"]["o_b"], dtype)

            xc_ln = layer_norm(x, bp["cross_attn_ln"])
            qc = _dense(xc_ln, bp["cross_attn"]["q_w"], bp["cross_attn"]["q_b"], dtype)
            cattn = _single_query_attention(
                qc, cross_k[layer], cross_v[layer], n_head, dtype
            )
            x = x + _dense(
                cattn, bp["cross_attn"]["o_w"], bp["cross_attn"]["o_b"], dtype
            )

            m_ln = layer_norm(x, bp["mlp_ln"])
            h = _dense(m_ln, bp["mlp"]["fc1_w"], bp["mlp"]["fc1_b"], dtype)
            h = jax.nn.gelu(h, approximate=False)
            x = x + _dense(h, bp["mlp"]["fc2_w"], bp["mlp"]["fc2_b"], dtype)

        x = layer_norm(x, dec["ln"])
        logits = jnp.matmul(
            x.astype(dtype), dec["tok_emb"].T.astype(dtype),
            preferred_element_type=jnp.float32,
        )
        return logits, jnp.stack(new_k), jnp.stack(new_v)

    return run_token


def _cross_caches(params, xa, dtype):
    """(L, B, S, d) cross-attention K/V for all layers in two einsums."""
    blocks = params["decoder"]["blocks"]
    cross_k = jnp.einsum(
        "bsd,lde->lbse", xa, blocks["cross_attn"]["k_w"].astype(dtype)
    )
    cross_v = (
        jnp.einsum("bsd,lde->lbse", xa, blocks["cross_attn"]["v_w"].astype(dtype))
        + blocks["cross_attn"]["v_b"].astype(dtype)[:, None, None, :]
    )
    return cross_k, cross_v


def _prefill(run_token, initial_tokens, cache_k, cache_v, n_vocab):
    """Teacher-force the prompt positions; returns (caches, last logits)."""
    B, T0 = initial_tokens.shape

    def body(carry, i):
        cache_k, cache_v, _ = carry
        logits, cache_k, cache_v = run_token(
            initial_tokens[:, i], i, cache_k, cache_v
        )
        return (cache_k, cache_v, logits), None

    (cache_k, cache_v, logits), _ = jax.lax.scan(
        body, (cache_k, cache_v, jnp.zeros((B, n_vocab), jnp.float32)),
        jnp.arange(T0),
    )
    return cache_k, cache_v, logits


@partial(
    jax.jit,
    static_argnames=("dims", "fcfg", "max_len", "temperature", "filters"),
)
def greedy_decode(
    params: Params,
    mel: jnp.ndarray,
    initial_tokens: jnp.ndarray,
    eot: int,
    dims: ModelDimensions,
    fcfg: ForwardConfig,
    max_len: int = 224,
    temperature: float = 0.0,
    rng: Optional[jax.Array] = None,
    filters: Optional[DecodeFilters] = None,
):
    """mel (B, n_mels, 3000), initial_tokens (B, T0) -> (token ids
    (B, max_len-T0) with everything after ``eot`` frozen to ``eot``,
    avg log-prob per generated token (B,)).

    ``temperature > 0`` samples categorically (whisper's GreedyDecoder with
    temperature); 0 is argmax. ``filters`` applies whisper's logit-filter
    stack (suppression, blank, timestamp rules) to every step's logits
    before selection."""
    eval_fcfg = _eval_fcfg(fcfg)
    dtype = eval_fcfg.dtype
    B, T0 = initial_tokens.shape
    L, d = dims.n_text_layer, dims.n_text_state

    xa = encoder_forward(params, mel, dims, eval_fcfg, train=False).astype(dtype)
    cross_k, cross_v = _cross_caches(params, xa, dtype)
    run_token = _make_run_token(params, dims, dtype, cross_k, cross_v, max_len)

    cache_k = jnp.zeros((L, B, max_len, d), dtype)
    cache_v = jnp.zeros((L, B, max_len, d), dtype)
    cache_k, cache_v, logits = _prefill(
        run_token, initial_tokens, cache_k, cache_v, dims.n_vocab
    )

    if rng is None:
        rng = jax.random.PRNGKey(0)

    def flt(logits, prev1, prev2, max_ts, n_sampled):
        if filters is None:
            return logits
        return filters.apply(logits, prev1, prev2, max_ts, n_sampled)

    def upd_max_ts(max_ts, tok):
        if filters is None or not filters.timestamp_rules:
            return max_ts
        return jnp.maximum(
            max_ts, jnp.where(tok >= filters.timestamp_begin, tok, 0)
        )

    def select(logits, key):
        if temperature > 0:
            tok = jax.random.categorical(key, logits / temperature, axis=-1)
        else:
            tok = jnp.argmax(logits, axis=-1)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return tok.astype(jnp.int32), jnp.take_along_axis(
            logp, tok[:, None], axis=-1
        )[:, 0]

    zeros_i = jnp.zeros((B,), jnp.int32)
    logits = flt(logits, zeros_i, zeros_i, zeros_i, 0)
    first_tok, first_lp = select(logits, jax.random.fold_in(rng, 0))

    def generate(carry, i):
        (cache_k, cache_v, token, tok_lp, prev_tok, max_ts, finished,
         lp_sum, count) = carry
        token = jnp.where(finished, eot, token)
        out_token = token
        # accumulate the log-prob of each ACCEPTED (written) token
        lp_sum = lp_sum + jnp.where(finished, 0.0, tok_lp)
        count = count + jnp.where(finished, 0, 1)
        logits, cache_k, cache_v = run_token(token, T0 + i, cache_k, cache_v)
        max_ts = upd_max_ts(max_ts, token)
        logits = flt(logits, token, prev_tok, max_ts, i + 1)
        nxt, nxt_lp = select(logits, jax.random.fold_in(rng, i + 1))
        finished = finished | (token == eot)
        return (
            cache_k, cache_v, nxt, nxt_lp, token, max_ts, finished,
            lp_sum, count,
        ), out_token

    n_gen = max_len - T0
    carry0 = (
        cache_k, cache_v, first_tok, first_lp, zeros_i, zeros_i,
        jnp.zeros((B,), bool), jnp.zeros((B,), jnp.float32),
        jnp.zeros((B,), jnp.int32),
    )
    (_, _, _, _, _, _, _, lp_sum, count), out_tokens = jax.lax.scan(
        generate, carry0, jnp.arange(n_gen)
    )
    avg_logprob = lp_sum / jnp.maximum(count, 1)
    return jnp.swapaxes(out_tokens, 0, 1), avg_logprob  # (B, n_gen), (B,)


@partial(
    jax.jit,
    static_argnames=(
        "dims", "fcfg", "max_len", "beam_size", "length_penalty", "filters"
    ),
)
def beam_decode(
    params: Params,
    mel: jnp.ndarray,
    initial_tokens: jnp.ndarray,
    eot: int,
    dims: ModelDimensions,
    fcfg: ForwardConfig,
    max_len: int = 224,
    beam_size: int = 5,
    length_penalty: Optional[float] = None,
    filters: Optional[DecodeFilters] = None,
):
    """Beam search over the KV-cache decoder.

    Beams ride the batch axis (B*K) so every step is one batched decoder
    forward; each step reorders the caches and token history with a single
    gather on the surviving beam index. Finished beams freeze: their only
    candidate continuation is ``eot`` at zero added score. Sequences are
    ranked like whisper's MaximumLikelihoodRanker — summed log-prob divided
    by the GNMT length penalty ``((5+len)/6)**p`` of the generated-token
    count (eot excluded, exactly whisper's ranking length), or by plain
    length when ``length_penalty`` is None; the returned avg log-prob keeps
    whisper's ``sum / (len + 1)`` convention (the +1 is the eot). ``filters``
    applies whisper's logit-filter stack before each step's softmax.
    Returns (tokens (B, max_len-T0), avg log-prob per token of the winning
    beam (B,)).
    """
    eval_fcfg = _eval_fcfg(fcfg)
    dtype = eval_fcfg.dtype
    B, T0 = initial_tokens.shape
    K = beam_size
    L, d = dims.n_text_layer, dims.n_text_state
    V = dims.n_vocab
    n_gen = max_len - T0

    xa = encoder_forward(params, mel, dims, eval_fcfg, train=False).astype(dtype)
    cross_k, cross_v = _cross_caches(params, xa, dtype)

    # prefill at batch B, then tile caches beam-wise
    run_token_b = _make_run_token(params, dims, dtype, cross_k, cross_v, max_len)
    cache_k = jnp.zeros((L, B, max_len, d), dtype)
    cache_v = jnp.zeros((L, B, max_len, d), dtype)
    cache_k, cache_v, logits = _prefill(
        run_token_b, initial_tokens, cache_k, cache_v, V
    )

    def tile(c):  # (L, B, M, d) -> (L, B*K, M, d), beams contiguous per batch
        return jnp.repeat(c, K, axis=1)

    cache_k, cache_v = tile(cache_k), tile(cache_v)
    cross_k_bk = jnp.repeat(cross_k, K, axis=1)
    cross_v_bk = jnp.repeat(cross_v, K, axis=1)
    run_token = _make_run_token(
        params, dims, dtype, cross_k_bk, cross_v_bk, max_len
    )

    def flt(lg, prev1, prev2, max_ts, n_sampled):
        if filters is None:
            return lg
        return filters.apply(lg, prev1, prev2, max_ts, n_sampled)

    def upd_max_ts(max_ts, tok):
        if filters is None or not filters.timestamp_rules:
            return max_ts
        return jnp.maximum(
            max_ts, jnp.where(tok >= filters.timestamp_begin, tok, 0)
        )

    zeros_b = jnp.zeros((B,), jnp.int32)
    logits = flt(logits, zeros_b, zeros_b, zeros_b, 0)
    logp0 = jax.nn.log_softmax(logits, axis=-1)  # (B, V)
    scores, cur_tok = jax.lax.top_k(logp0, K)  # (B, K) each
    cur_tok = cur_tok.astype(jnp.int32)

    # eot-only continuation row for finished beams
    eot_only = jnp.full((V,), -jnp.inf, jnp.float32).at[eot].set(0.0)

    hist0 = jnp.full((B, K, n_gen), eot, jnp.int32)
    finished0 = jnp.zeros((B, K), bool)
    prev0 = jnp.zeros((B, K), jnp.int32)
    ts0 = jnp.zeros((B, K), jnp.int32)

    def step(carry, i):
        (cache_k, cache_v, cur_tok, prev_tok, max_ts, scores, finished,
         hist) = carry
        tok_in = jnp.where(finished, eot, cur_tok)  # (B, K)
        hist = jax.lax.dynamic_update_index_in_dim(hist, tok_in, i, axis=2)

        logits, cache_k, cache_v = run_token(
            tok_in.reshape(B * K), T0 + i, cache_k, cache_v
        )
        max_ts = upd_max_ts(max_ts, tok_in)
        logits = flt(
            logits,
            tok_in.reshape(B * K),
            prev_tok.reshape(B * K),
            max_ts.reshape(B * K),
            i + 1,
        )
        logp = jax.nn.log_softmax(logits, axis=-1).reshape(B, K, V)
        cand = scores[:, :, None] + jnp.where(
            finished[:, :, None], eot_only[None, None, :], logp
        )

        new_scores, flat_idx = jax.lax.top_k(cand.reshape(B, K * V), K)
        beam_src = (flat_idx // V).astype(jnp.int32)  # (B, K)
        new_tok = (flat_idx % V).astype(jnp.int32)

        # reorder everything beam-indexed by the surviving source beam
        hist = jnp.take_along_axis(hist, beam_src[:, :, None], axis=1)
        finished = jnp.take_along_axis(finished, beam_src, axis=1)
        prev_tok = jnp.take_along_axis(tok_in, beam_src, axis=1)
        max_ts = jnp.take_along_axis(max_ts, beam_src, axis=1)
        gather = beam_src[None, :, :, None, None]  # over (L,B,K,M,d)

        def reorder(c):
            c = c.reshape(L, B, K, max_len, d)
            c = jnp.take_along_axis(c, gather, axis=2)
            return c.reshape(L, B * K, max_len, d)

        cache_k, cache_v = reorder(cache_k), reorder(cache_v)
        finished = finished | (new_tok == eot)
        return (
            cache_k, cache_v, new_tok, prev_tok, max_ts, new_scores,
            finished, hist,
        ), None

    (_, _, _, _, _, scores, _, hist), _ = jax.lax.scan(
        step,
        (cache_k, cache_v, cur_tok, prev0, ts0, scores, finished0, hist0),
        jnp.arange(n_gen),
    )

    # rank beams (whisper MaximumLikelihoodRanker semantics): the penalty
    # length counts generated non-eot tokens; the +1 (the eot) enters only
    # the returned avg_logprob, exactly whisper's
    # ``sum_logprobs / (len(tokens) + 1)``.
    gen_len = jnp.sum(hist != eot, axis=2)  # (B, K) non-eot tokens
    if length_penalty is None:
        norm = jnp.maximum(gen_len, 1).astype(jnp.float32)
    else:
        norm = ((5.0 + gen_len.astype(jnp.float32)) / 6.0) ** length_penalty
    ranked = scores / norm
    best = jnp.argmax(ranked, axis=1)  # (B,)
    tokens = jnp.take_along_axis(hist, best[:, None, None], axis=1)[:, 0]
    best_scores = jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0]
    best_len = jnp.take_along_axis(gen_len + 1, best[:, None], axis=1)[:, 0]
    avg_logprob = best_scores / jnp.maximum(best_len, 1).astype(jnp.float32)
    return tokens, avg_logprob


def _compression_ratio(text: str) -> float:
    """zlib compression ratio — whisper's repetition detector."""
    import zlib

    data = text.encode("utf-8")
    if not data:
        return 0.0
    return len(data) / len(zlib.compress(data))


def transcribe_batch(
    params: Params,
    dims: ModelDimensions,
    audio_batch: np.ndarray,
    tokenizer,
    fcfg: Optional[ForwardConfig] = None,
    language: Optional[str] = None,
    max_len: int = 224,
    beam_size: Optional[int] = None,
    temperatures: Sequence[float] = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
    compression_ratio_threshold: Optional[float] = 2.4,
    logprob_threshold: Optional[float] = -1.0,
    length_penalty: Optional[float] = None,
    without_timestamps: bool = True,
    filters: Optional[DecodeFilters] = None,
) -> Sequence[str]:
    """Raw 30s audio (B, 480000) -> transcripts, with whisper's decode
    fallback: temperature 0 uses beam search (``beam_size``, whisper's
    ``decode_with_fallback``) or greedy, and any sample whose zlib
    compression ratio exceeds ``compression_ratio_threshold`` (repetition
    loop) or whose average log-prob falls below ``logprob_threshold`` is
    re-decoded at the next temperature with categorical sampling.

    whisper's logit-filter stack (non-speech suppression, first-position
    blank suppression, and — when ``without_timestamps=False`` — the
    timestamp rules) is applied at every step via :func:`default_filters`;
    pass ``filters`` to override.

    Retry rungs decode only the still-failing rows, gathered into a
    power-of-two bucket (one compiled specialization per bucket size per
    temperature; pad rows repeat a failing row), so a single repetition
    loop in a large batch no longer pays full-batch re-decodes."""
    from whisper_finetune_tpu.ops.spec_augment import FeaturizeConfig, featurize_impl

    fcfg = fcfg or ForwardConfig()
    B = audio_batch.shape[0]
    mel = featurize_impl(
        jnp.asarray(audio_batch),
        jnp.full((B,), 3000, jnp.int32),
        None,
        FeaturizeConfig(n_mels=dims.n_mels),
        train=False,
    )
    if filters is None:
        filters = default_filters(
            tokenizer, without_timestamps=without_timestamps
        )
    sot_seq = list(tokenizer.sot_sequence)
    if language is not None:
        sot_seq[1] = tokenizer.special_tokens[f"<|{language}|>"]
    if without_timestamps:
        sot_seq.append(tokenizer.no_timestamps)
    init = jnp.asarray([sot_seq] * B, jnp.int32)

    def decode_text(row) -> str:
        ids = []
        for t in row.tolist():
            if t == tokenizer.eot:
                break
            ids.append(int(t))
        return tokenizer.decode(ids)

    texts: list = [None] * B
    needs = np.ones((B,), bool)
    for t_idx, temp in enumerate(temperatures):
        # Retry rungs re-decode only the still-failing rows, gathered into a
        # power-of-two bucket (bounded jit specializations: one compiled
        # program per bucket size per temperature) and padded by repeating
        # the first failing row; the first rung runs the full batch.
        idx = np.nonzero(needs)[0]
        if t_idx == 0 or len(idx) == B:
            sel = np.arange(B)
        else:
            bucket = min(B, 1 << max(0, int(len(idx) - 1).bit_length()))
            sel = np.concatenate(
                [idx, np.repeat(idx[:1], bucket - len(idx))]
            )
        mel_r, init_r = mel[sel], init[sel]
        if temp == 0.0 and beam_size is not None:
            tokens, avg_lp = beam_decode(
                params, mel_r, init_r, tokenizer.eot, dims, fcfg,
                max_len=max_len, beam_size=beam_size,
                length_penalty=length_penalty, filters=filters,
            )
        else:
            tokens, avg_lp = greedy_decode(
                params, mel_r, init_r, tokenizer.eot, dims, fcfg,
                max_len=max_len, temperature=float(temp),
                rng=jax.random.PRNGKey(t_idx), filters=filters,
            )
        tokens = np.asarray(tokens)
        avg_lp = np.asarray(avg_lp)
        last = temp == temperatures[-1]
        # only the first len(idx) rows of sel are real (the rest are pad)
        for j, i in enumerate(sel[: len(idx)]):
            text = decode_text(tokens[j])
            ok = True
            if (
                compression_ratio_threshold is not None
                and _compression_ratio(text) > compression_ratio_threshold
            ):
                ok = False
            if (
                logprob_threshold is not None
                and float(avg_lp[j]) < logprob_threshold
            ):
                ok = False
            if ok or last:
                texts[i] = text
                needs[i] = False
        if not needs.any():
            break
    return texts
