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

from functools import partial
from typing import Optional, Sequence

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
    return ForwardConfig(
        compute_dtype=fcfg.compute_dtype,
        remat_encoder=False,
        remat_decoder=False,
        lora_scale=fcfg.lora_scale,
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


@partial(jax.jit, static_argnames=("dims", "fcfg", "max_len", "temperature"))
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
):
    """mel (B, n_mels, 3000), initial_tokens (B, T0) -> (token ids
    (B, max_len-T0) with everything after ``eot`` frozen to ``eot``,
    avg log-prob per generated token (B,)).

    ``temperature > 0`` samples categorically (whisper's GreedyDecoder with
    temperature); 0 is argmax."""
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

    def select(logits, key):
        if temperature > 0:
            tok = jax.random.categorical(key, logits / temperature, axis=-1)
        else:
            tok = jnp.argmax(logits, axis=-1)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return tok.astype(jnp.int32), jnp.take_along_axis(
            logp, tok[:, None], axis=-1
        )[:, 0]

    first_tok, first_lp = select(logits, jax.random.fold_in(rng, 0))

    def generate(carry, i):
        cache_k, cache_v, token, tok_lp, finished, lp_sum, count = carry
        token = jnp.where(finished, eot, token)
        out_token = token
        # accumulate the log-prob of each ACCEPTED (written) token
        lp_sum = lp_sum + jnp.where(finished, 0.0, tok_lp)
        count = count + jnp.where(finished, 0, 1)
        logits, cache_k, cache_v = run_token(token, T0 + i, cache_k, cache_v)
        nxt, nxt_lp = select(logits, jax.random.fold_in(rng, i + 1))
        finished = finished | (token == eot)
        return (cache_k, cache_v, nxt, nxt_lp, finished, lp_sum, count), out_token

    n_gen = max_len - T0
    carry0 = (
        cache_k, cache_v, first_tok, first_lp,
        jnp.zeros((B,), bool), jnp.zeros((B,), jnp.float32),
        jnp.zeros((B,), jnp.int32),
    )
    (_, _, _, _, _, lp_sum, count), out_tokens = jax.lax.scan(
        generate, carry0, jnp.arange(n_gen)
    )
    avg_logprob = lp_sum / jnp.maximum(count, 1)
    return jnp.swapaxes(out_tokens, 0, 1), avg_logprob  # (B, n_gen), (B,)


@partial(
    jax.jit,
    static_argnames=("dims", "fcfg", "max_len", "beam_size", "length_penalty"),
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
):
    """Beam search over the KV-cache decoder.

    Beams ride the batch axis (B*K) so every step is one batched decoder
    forward; each step reorders the caches and token history with a single
    gather on the surviving beam index. Finished beams freeze: their only
    candidate continuation is ``eot`` at zero added score. Sequences are
    ranked like whisper's MaximumLikelihoodRanker — summed log-prob divided
    by the GNMT length penalty ``((5+len)/6)**p``, or by plain length when
    ``length_penalty`` is None. Returns (tokens (B, max_len-T0),
    avg log-prob per token of the winning beam (B,)).
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

    logp0 = jax.nn.log_softmax(logits, axis=-1)  # (B, V)
    scores, cur_tok = jax.lax.top_k(logp0, K)  # (B, K) each
    cur_tok = cur_tok.astype(jnp.int32)

    # eot-only continuation row for finished beams
    eot_only = jnp.full((V,), -jnp.inf, jnp.float32).at[eot].set(0.0)

    hist0 = jnp.full((B, K, n_gen), eot, jnp.int32)
    finished0 = jnp.zeros((B, K), bool)

    def step(carry, i):
        cache_k, cache_v, cur_tok, scores, finished, hist = carry
        tok_in = jnp.where(finished, eot, cur_tok)  # (B, K)
        hist = jax.lax.dynamic_update_index_in_dim(hist, tok_in, i, axis=2)

        logits, cache_k, cache_v = run_token(
            tok_in.reshape(B * K), T0 + i, cache_k, cache_v
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
        gather = beam_src[None, :, :, None, None]  # over (L,B,K,M,d)

        def reorder(c):
            c = c.reshape(L, B, K, max_len, d)
            c = jnp.take_along_axis(c, gather, axis=2)
            return c.reshape(L, B * K, max_len, d)

        cache_k, cache_v = reorder(cache_k), reorder(cache_v)
        finished = finished | (new_tok == eot)
        return (cache_k, cache_v, new_tok, new_scores, finished, hist), None

    (_, _, _, scores, _, hist), _ = jax.lax.scan(
        step, (cache_k, cache_v, cur_tok, scores, finished0, hist0),
        jnp.arange(n_gen),
    )

    # rank beams (whisper MaximumLikelihoodRanker semantics)
    lengths = jnp.sum(hist != eot, axis=2) + 1  # tokens incl. the final eot
    if length_penalty is None:
        norm = lengths.astype(jnp.float32)
    else:
        norm = ((5.0 + lengths.astype(jnp.float32)) / 6.0) ** length_penalty
    ranked = scores / norm
    best = jnp.argmax(ranked, axis=1)  # (B,)
    tokens = jnp.take_along_axis(hist, best[:, None, None], axis=1)[:, 0]
    best_scores = jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0]
    best_len = jnp.take_along_axis(lengths, best[:, None], axis=1)[:, 0]
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
) -> Sequence[str]:
    """Raw 30s audio (B, 480000) -> transcripts, with whisper's decode
    fallback: temperature 0 uses beam search (``beam_size``, whisper's
    ``decode_with_fallback``) or greedy, and any sample whose zlib
    compression ratio exceeds ``compression_ratio_threshold`` (repetition
    loop) or whose average log-prob falls below ``logprob_threshold`` is
    re-decoded at the next temperature with categorical sampling."""
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
    sot_seq = list(tokenizer.sot_sequence)
    if language is not None:
        sot_seq[1] = tokenizer.special_tokens[f"<|{language}|>"]
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
        if temp == 0.0 and beam_size is not None:
            tokens, avg_lp = beam_decode(
                params, mel, init, tokenizer.eot, dims, fcfg,
                max_len=max_len, beam_size=beam_size,
                length_penalty=length_penalty,
            )
        else:
            tokens, avg_lp = greedy_decode(
                params, mel, init, tokenizer.eot, dims, fcfg,
                max_len=max_len, temperature=float(temp),
                rng=jax.random.PRNGKey(t_idx),
            )
        tokens = np.asarray(tokens)
        avg_lp = np.asarray(avg_lp)
        last = temp == temperatures[-1]
        for i in range(B):
            if not needs[i]:
                continue
            text = decode_text(tokens[i])
            ok = True
            if (
                compression_ratio_threshold is not None
                and _compression_ratio(text) > compression_ratio_threshold
            ):
                ok = False
            if (
                logprob_threshold is not None
                and float(avg_lp[i]) < logprob_threshold
            ):
                ok = False
            if ok or last:
                texts[i] = text
                needs[i] = False
        if not needs.any():
            break
    return texts
