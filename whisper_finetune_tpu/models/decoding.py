"""Greedy autoregressive decoding with a KV cache.

The reference never generates during training (evaluation is teacher-forced,
evaluator.py:69-73) and delegates inference to CT2/faster-whisper. This
module adds an on-TPU transcription path anyway — one jitted program per
(batch, max_len) shape:

* the audio encoder runs once; every decoder layer's cross-attention K/V are
  precomputed in one batched einsum over the stacked layer axis,
* the token loop is a ``lax.scan`` over positions; each step updates the
  (L, B, max_len, d) self-attention cache with ``dynamic_update_slice`` and
  attends over a position-masked static window (no dynamic shapes),
* finished sequences are frozen at ``eot``.

Greedy only (temperature 0) — the sampling/beam/timestamp heuristics of
whisper's DecodingTask are out of scope for the training framework.
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


@partial(jax.jit, static_argnames=("dims", "fcfg", "max_len"))
def greedy_decode(
    params: Params,
    mel: jnp.ndarray,
    initial_tokens: jnp.ndarray,
    eot: int,
    dims: ModelDimensions,
    fcfg: ForwardConfig,
    max_len: int = 224,
) -> jnp.ndarray:
    """mel (B, n_mels, 3000), initial_tokens (B, T0) -> token ids
    (B, max_len) with everything after ``eot`` frozen to ``eot``."""
    eval_fcfg = ForwardConfig(
        compute_dtype=fcfg.compute_dtype,
        remat_encoder=False,
        remat_decoder=False,
        lora_scale=fcfg.lora_scale,
    )
    dtype = eval_fcfg.dtype
    dec = params["decoder"]
    blocks = dec["blocks"]
    n_head = dims.n_text_head
    L = dims.n_text_layer
    B, T0 = initial_tokens.shape
    d = dims.n_text_state

    xa = encoder_forward(params, mel, dims, eval_fcfg, train=False).astype(dtype)

    # Cross-attention K/V for all layers in two batched einsums.
    cross_k = jnp.einsum(
        "bsd,lde->lbse", xa, blocks["cross_attn"]["k_w"].astype(dtype)
    )
    cross_v = (
        jnp.einsum("bsd,lde->lbse", xa, blocks["cross_attn"]["v_w"].astype(dtype))
        + blocks["cross_attn"]["v_b"].astype(dtype)[:, None, None, :]
    )

    cache_k = jnp.zeros((L, B, max_len, d), dtype)
    cache_v = jnp.zeros((L, B, max_len, d), dtype)

    def run_token(token, pos, cache_k, cache_v):
        """One decoder forward for one position; returns (logits, caches)."""
        x = dec["tok_emb"][token] + dec["pos_emb"][pos]
        x = x.astype(dtype)  # (B, d)

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
            mask = jnp.broadcast_to(mask, (B, max_len))
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

    # Prefill the prompt positions (teacher-forced), then generate.
    def prefill(carry, i):
        cache_k, cache_v, _ = carry
        logits, cache_k, cache_v = run_token(initial_tokens[:, i], i, cache_k, cache_v)
        return (cache_k, cache_v, logits), None

    (cache_k, cache_v, logits), _ = jax.lax.scan(
        prefill, (cache_k, cache_v, jnp.zeros((B, dims.n_vocab), jnp.float32)),
        jnp.arange(T0),
    )

    first_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def generate(carry, i):
        cache_k, cache_v, token, finished = carry
        token = jnp.where(finished, eot, token)
        out_token = token
        logits, cache_k, cache_v = run_token(token, T0 + i, cache_k, cache_v)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        finished = finished | (token == eot)
        return (cache_k, cache_v, nxt, finished), out_token

    n_gen = max_len - T0
    finished0 = jnp.zeros((B,), bool)
    (_, _, _, _), out_tokens = jax.lax.scan(
        generate, (cache_k, cache_v, first_tok, finished0), jnp.arange(n_gen)
    )
    return jnp.swapaxes(out_tokens, 0, 1)  # (B, n_gen)


def transcribe_batch(
    params: Params,
    dims: ModelDimensions,
    audio_batch: np.ndarray,
    tokenizer,
    fcfg: Optional[ForwardConfig] = None,
    language: Optional[str] = None,
    max_len: int = 224,
) -> Sequence[str]:
    """Convenience path: raw 30s audio (B, 480000) -> transcripts."""
    from whisper_finetune_tpu.ops.spec_augment import FeaturizeConfig, featurize_impl

    fcfg = fcfg or ForwardConfig()
    mel = featurize_impl(
        jnp.asarray(audio_batch),
        jnp.full((audio_batch.shape[0],), 3000, jnp.int32),
        None,
        FeaturizeConfig(n_mels=dims.n_mels),
        train=False,
    )
    sot_seq = list(tokenizer.sot_sequence)
    if language is not None:
        sot_seq[1] = tokenizer.special_tokens[f"<|{language}|>"]
    sot_seq.append(tokenizer.no_timestamps)
    init = jnp.asarray([sot_seq] * audio_batch.shape[0], jnp.int32)

    tokens = np.asarray(
        greedy_decode(params, mel, init, tokenizer.eot, dims, fcfg, max_len=max_len)
    )
    texts = []
    for row in tokens:
        ids = []
        for t in row.tolist():
            if t == tokenizer.eot:
                break
            ids.append(t)
        texts.append(tokenizer.decode(ids))
    return texts
