"""Hand-written gradient-accumulating backward for the full fine-tune path.

Why this exists — the HBM arithmetic of ``jax.grad`` inside a microbatch
loop on one 16 GB chip (large-v3, the reference's
config_large_v3_best_muon.yaml flagship workload):

* ``lax.scan``-over-microbatches around ``jax.value_and_grad`` needs, at the
  same time, (1) the per-microbatch gradient COTANGENT tree the scan
  transpose materializes (param-sized: 2.9 GB in bf16, 5.8 GB in fp32) and
  (2) the running gradient-SUM carry (another 2.9 GB), on top of the fp32
  master weights (5.8 GB), the bf16 weight shadow the compute dtype needs
  (2.9 GB, as a precast tree or as the equivalent fp32 cotangent
  when casting per slice — measured identical), the optimizer state
  (1.7 GB) and the activation workspace. That is ~17.6 GB however the
  programs are split — structurally over a 16 GB chip at any batch size,
  because every oversized buffer is parameter-shaped, not batch-shaped.

* This module merges (1) and (2): the backward is written as explicit
  reverse ``lax.scan``s over the stacked layer axis, and each layer's
  weight-gradient slice is added straight into the DONATED gradient
  accumulator with an in-place ``.at[i].add`` on the scan carry. No
  whole-tree cotangent ever exists, and the weight slices are cast to the
  compute dtype per layer behind an ``optimization_barrier`` (see
  ``models.whisper._cast_block_slice``), so no bf16 weight tree exists
  either. Measured result: the accumulation program drops from 16.0 GB to
  ~11.9 GB at batch 6, which is what fits the full large-v3 Muon flagship
  with ``accum_grad_steps`` microbatches (reference optimizer.py:227-228,
  config_large_v3_best_muon.yaml) on ONE 16 GB chip.

The math is identical to the automatic path: forward scans emit each
layer's input (exactly the residuals full-remat keeps), and the backward
replays one layer at a time through ``jax.vjp`` of the very same block
functions (``models.whisper._encoder_block`` / ``_decoder_block`` wrapped in
the same stochastic-depth/deep-SpecAugment plumbing), with the same RNG
derivation. ``tests/test_manual_grad.py`` pins loss and gradient parity
against ``jax.grad`` of ``forward_impl``.

Scope: full fine-tuning only (no LoRA materialization, no frozen leaves) —
the configurations whose memory actually needs this. Everything else keeps
the automatic backward.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from whisper_finetune_tpu.models.dims import ModelDimensions
from whisper_finetune_tpu.models.whisper import (
    ForwardConfig,
    _decoder_block,
    _encoder_block,
    _stochastic_wrap,
    conv_stem,
    decoder_embed,
    decoder_step_rng,
    dsa_layer_flags,
    encoder_step_rng,
    layer_norm,
)

Params = Dict[str, Any]


def _slice_cast(bp: Params, tie):
    """Cast one layer's weight matrices to bf16 behind an optimization
    barrier tied to ``tie`` (the scan carry), so XLA cannot hoist the casts
    into a full-tree convert. fp32 vectors (layer-norm gains, biases) pass
    through — ``_dense`` casts them at use, exactly like the automatic
    path."""
    bp, tie = jax.lax.optimization_barrier((bp, tie))
    bp = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if (a.dtype == jnp.float32 and a.ndim >= 2)
        else a,
        bp,
    )
    return bp, tie


def _maybe_slice_cast(bp: Params, tie, dtype):
    if dtype == jnp.float32:
        return bp, tie
    return _slice_cast(bp, tie)


def _accum_slice(buf: Params, i, grads: Params) -> Params:
    """``buf[i] += grads`` per leaf, in place on the scan carry."""
    return jax.tree_util.tree_map(
        lambda b, g: b.at[i].add(g.astype(b.dtype)), buf, grads
    )


def _accum_leaf(buf_leaf, g):
    return buf_leaf + g.astype(buf_leaf.dtype)


def make_manual_accumulator(
    dims: ModelDimensions,
    fcfg: ForwardConfig,
    loss_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    feat_cfg=None,
    precast: bool = False,
) -> Callable:
    """Build ``accumulate(params, batch, micro_rngs, grad_buf) ->
    (grad_buf, loss_sum)``.

    ``batch`` leaves are (accum_local, local_B, ...); ``grad_buf`` is a
    donated params-shaped tree in the accumulator dtype whose content is
    added to (pass zeros for a fresh step). RNG derivation per microbatch
    matches ``train.step``'s automatic path exactly.

    ``precast=True`` casts each block stack to the compute dtype ONCE per
    microbatch (a resident ~2.9 GB bf16 shadow on large-v3, but the four
    layer scans then stream half the weight bytes and skip the per-slice
    casts); the default re-casts one layer's slices behind a barrier in
    every scan body, trading weight-read bandwidth for the 2.9 GB — the
    fit that matters at the 16 GB accumulation-program budget. Same math
    either way: the cast is linear, so the bf16 weight cotangents are
    identical before they land in the accumulator."""
    if fcfg.lora_scale:
        raise ValueError("manual backward does not support LoRA runs")
    dtype = fcfg.dtype
    nh_e, nh_d = dims.n_audio_head, dims.n_text_head
    L_e, L_d = dims.n_audio_layer, dims.n_text_layer
    precast = bool(precast) and dtype != jnp.float32

    def _precast_blocks(blocks: Params) -> Params:
        return jax.tree_util.tree_map(
            lambda a: a.astype(dtype)
            if (a.dtype == jnp.float32 and a.ndim >= 3)  # stacked matrices
            else a,
            blocks,
        )

    def _scan_cast(bp: Params, tie):
        """Per-scan-body weight cast: identity under ``precast`` (the
        blocks arrive already in the compute dtype)."""
        if precast:
            return bp, tie
        return _maybe_slice_cast(bp, tie, dtype)

    # ---------------- per-segment forward functions --------------------
    # The stem/embed math and the RNG layouts are the SHARED
    # models.whisper segment helpers (conv_stem, decoder_embed,
    # encoder_step_rng, decoder_step_rng) — this module only re-wires the
    # scan topology around them, so the forward numerics cannot drift from
    # encoder_forward/decoder_forward.

    def stem(conv1: Params, conv2: Params, mel):
        """Conv stem + positional embedding (encoder_forward's prologue),
        parameterized by the conv leaves so jax.vjp can differentiate
        w.r.t. them alone."""
        return conv_stem(
            {"conv1": conv1, "conv2": conv2}, mel, dims, dtype
        )

    def enc_layer(x, bp, keys, flag, dsa_gate):
        dsa_on = jnp.logical_and(dsa_gate, flag)

        def run(x):
            return _encoder_block(x, bp, fcfg, nh_e, dsa_on, keys[1], True)

        return _stochastic_wrap(x, run, keys[0], fcfg.sd_encoder, True)

    def enc_head(ln_post: Params, x):
        # encoder_forward's epilogue + decoder_forward's xa cast, fused so
        # the backward chain re-enters in one vjp
        return layer_norm(x, ln_post).astype(jnp.float32).astype(dtype)

    def dec_embed(tok_emb, pos_emb, tokens):
        return decoder_embed(
            {"tok_emb": tok_emb, "pos_emb": pos_emb}, tokens, dtype
        )

    def dec_layer(x, bp, xa, keys):
        def run(x):
            return _decoder_block(x, bp, xa, fcfg, nh_d)

        return _stochastic_wrap(x, run, keys[0], fcfg.sd_decoder, True)

    def head_loss(ln: Params, tok_emb, x, targets):
        x = layer_norm(x, ln)
        logits = jnp.matmul(
            x.astype(dtype), tok_emb.T.astype(dtype),
            preferred_element_type=dtype,
        ).astype(jnp.float32)
        return loss_fn(logits, targets)

    # ---------------- one microbatch: forward + manual backward --------

    def microbatch(params: Params, buf: Params, mb, mrng):
        enc, dec = params["encoder"], params["decoder"]
        enc_blocks = _precast_blocks(enc["blocks"]) if precast else enc["blocks"]
        dec_blocks = _precast_blocks(dec["blocks"]) if precast else dec["blocks"]
        if feat_cfg is not None:
            from whisper_finetune_tpu.ops.spec_augment import featurize_impl

            feat_rng, mrng = jax.random.split(mrng)
            # Featurization has no trainable parameters: forward only.
            mel = featurize_impl(
                mb["audio"], mb["crop_frames"], feat_rng, feat_cfg, train=True
            )
        else:
            mel = mb["mel"]
        enc_rng, dec_rng = jax.random.split(mrng)

        # ===== forward =====
        # Shared RNG layout (identical to encoder_forward by construction).
        dsa_gate, enc_keys = encoder_step_rng(enc_rng, L_e, fcfg)
        dsa_flags = jnp.asarray(dsa_layer_flags(fcfg, L_e))

        x0 = stem(enc["conv1"], enc["conv2"], mel)

        def enc_fwd(x, xs):
            bp, keys, flag = xs
            bp, x = _scan_cast(bp, x)
            return enc_layer(x, bp, keys, flag, dsa_gate), x  # emit input

        x_enc, enc_inputs = jax.lax.scan(
            enc_fwd, x0, (enc_blocks, enc_keys, dsa_flags)
        )

        xa = enc_head(enc["ln_post"], x_enc)

        dec_keys = decoder_step_rng(dec_rng, L_d)
        xd0 = dec_embed(dec["tok_emb"], dec["pos_emb"], mb["dec_input"])

        def dec_fwd(x, xs):
            bp, keys = xs
            bp, x = _scan_cast(bp, x)
            return dec_layer(x, bp, xa, keys), x

        x_dec, dec_inputs = jax.lax.scan(
            dec_fwd, xd0, (dec_blocks, dec_keys)
        )

        # ===== backward =====
        # Head + loss: one vjp seeds the whole chain.
        loss, head_vjp = jax.vjp(
            lambda ln, te, x: head_loss(ln, te, x, mb["dec_output"]),
            dec["ln"], dec["tok_emb"], x_dec,
        )
        d_ln, d_tok_head, dx = head_vjp(jnp.float32(1.0))

        # Decoder reverse scan: replay one layer via vjp, push its weight
        # grads into the buffer slice in place, chain dx and accumulate dxa.
        def dec_bwd(carry, xs):
            dx, dxa, buf_blocks = carry
            x_i, bp32, keys, i = xs
            bp, dx = _scan_cast(bp32, dx)
            _, vjp = jax.vjp(lambda x, w, a: dec_layer(x, w, a, keys), x_i, bp, xa)
            dx, dw, dxa_i = vjp(dx)
            return (dx, dxa + dxa_i, _accum_slice(buf_blocks, i, dw)), None

        (dx, dxa, buf_dec_blocks), _ = jax.lax.scan(
            dec_bwd,
            (dx, jnp.zeros_like(xa), buf["decoder"]["blocks"]),
            (dec_inputs, dec_blocks, dec_keys, jnp.arange(L_d)),
            reverse=True,
        )

        # Decoder embedding grads (tok_emb gets the head's tied-projection
        # contribution plus the gather's scatter-add, summed in fp32 like
        # the automatic path).
        _, emb_vjp = jax.vjp(
            lambda te, pe: dec_embed(te, pe, mb["dec_input"]),
            dec["tok_emb"], dec["pos_emb"],
        )
        d_tok_gather, d_pos = emb_vjp(dx)

        # Encoder head.
        _, enc_head_vjp = jax.vjp(
            lambda lp, x: enc_head(lp, x), enc["ln_post"], x_enc
        )
        d_ln_post, dxe = enc_head_vjp(dxa)

        def enc_bwd(carry, xs):
            dx, buf_blocks = carry
            x_i, bp32, keys, flag, i = xs
            bp, dx = _scan_cast(bp32, dx)
            _, vjp = jax.vjp(
                lambda x, w: enc_layer(x, w, keys, flag, dsa_gate), x_i, bp
            )
            dx, dw = vjp(dx)
            return (dx, _accum_slice(buf_blocks, i, dw)), None

        (dx0, buf_enc_blocks), _ = jax.lax.scan(
            enc_bwd,
            (dxe, buf["encoder"]["blocks"]),
            (enc_inputs, enc_blocks, enc_keys, dsa_flags, jnp.arange(L_e)),
            reverse=True,
        )

        # Stem (replayed — its activations were not saved).
        _, stem_vjp = jax.vjp(
            lambda c1, c2: stem(c1, c2, mel), enc["conv1"], enc["conv2"]
        )
        d_conv1, d_conv2 = stem_vjp(dx0)

        # Assemble the new buffer: blocks were updated in place above; the
        # small unstacked leaves add in whole.
        new_buf = {
            "encoder": {
                "conv1": jax.tree_util.tree_map(
                    _accum_leaf, buf["encoder"]["conv1"], d_conv1
                ),
                "conv2": jax.tree_util.tree_map(
                    _accum_leaf, buf["encoder"]["conv2"], d_conv2
                ),
                "blocks": buf_enc_blocks,
                "ln_post": jax.tree_util.tree_map(
                    _accum_leaf, buf["encoder"]["ln_post"], d_ln_post
                ),
            },
            "decoder": {
                "tok_emb": _accum_leaf(
                    buf["decoder"]["tok_emb"], d_tok_head + d_tok_gather
                ),
                "pos_emb": _accum_leaf(buf["decoder"]["pos_emb"], d_pos),
                "blocks": buf_dec_blocks,
                "ln": jax.tree_util.tree_map(
                    _accum_leaf, buf["decoder"]["ln"], d_ln
                ),
            },
        }
        return loss, new_buf

    def accumulate(params: Params, batch, micro_rngs, grad_buf: Params):
        accum_local = micro_rngs.shape[0]
        data_keys = tuple(batch.keys())
        if accum_local == 1:
            mb = {k: batch[k][0] for k in data_keys}
            loss, buf = microbatch(params, grad_buf, mb, micro_rngs[0])
            return buf, loss

        def body(carry, xs):
            buf, loss_sum = carry
            mb, mrng = xs
            loss, buf = microbatch(params, buf, mb, mrng)
            return (buf, loss_sum + loss), None

        (buf, loss_sum), _ = jax.lax.scan(
            body,
            (grad_buf, jnp.zeros((), jnp.float32)),
            ({k: batch[k] for k in data_keys}, micro_rngs),
        )
        return buf, loss_sum

    return accumulate
