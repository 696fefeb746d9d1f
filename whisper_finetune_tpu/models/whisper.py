"""Whisper encoder-decoder, TPU-first.

A pure-functional JAX re-design of the capabilities of the reference's model
layer (openai-whisper modules wrapped by
src/whisper_finetune/model/model_utils.py): parameters are a plain pytree,
layers are stacked on a leading axis and executed with ``lax.scan`` (one
compiled block body regardless of depth — 4-layer tiny and 32-layer large-v3
compile in the same time and XLA pipelines the weight fetches), and the
training-time behaviours the reference implements as module subclasses and
hooks are first-class traced features here:

* gradient checkpointing (reference ``CheckpointedStochastic*`` modules,
  model_utils.py:253-327)      -> ``jax.checkpoint`` over the scanned body,
* stochastic depth (model_utils.py:220-250) -> per-layer scalar Bernoulli
  drawn from the step key, whole-layer ``lax.cond`` skip with the reference's
  ``x + (block(x) - x) / keep_prob`` residual rescale,
* deep SpecAugment (model_utils.py:382-431) -> time+feature masking of the
  ``attn_ln`` output inside flagged encoder layers, gated by one
  per-forward Bernoulli so "checkpoint recompute sees the same decision"
  holds by construction (randomness is an explicit input, not module state).

Precision policy replaces torch AMP/autocast: parameters are fp32, matmuls
and convs run in ``compute_dtype`` (bf16 on TPU), layer norms and softmax in
fp32, and the final logits are fp32 via the tied embedding (matching the
reference's fp32 logit cast at model_utils.py:325).

Weight layout: linear kernels are stored (in, out) — transposed from
torch's (out, in) — so the forward pass is pure right-multiplication on the
MXU; conv kernels are (width, in, out) for NWC convolutions.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from whisper_finetune_tpu.models.dims import ModelDimensions

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Static forward configuration
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ForwardConfig:
    """Hashable, trace-time-static switches for the model forward."""

    compute_dtype: str = "bfloat16"
    remat_encoder: bool = True
    remat_encoder_last_only: bool = False
    remat_decoder: bool = True
    # Rematerialization policy: "full" recomputes everything inside a block
    # on the backward pass (minimum memory, ~1/3 extra FLOPs);
    # "dots" keeps matmul outputs resident (XLA's
    # dots_with_no_batch_dims_saveable) — faster when HBM allows;
    # "attn" keeps only the named attention probabilities (both
    # "attn_probs" self-attention and "cross_attn_probs" sites);
    # "save:<name>[,<name>...]" keeps exactly the listed checkpoint_name
    # sites resident — the tunable middle ground between "full" and
    # "dots"; "offload:<names>" stages the listed sites to pinned host
    # RAM instead (DMA instead of HBM or recompute), and '+'-separated
    # segments mix both, e.g. "save:attn_probs+offload:enc_qkv".
    # Named sites in the model: attn_probs, cross_attn_probs
    # (ops/attention.py), enc_qkv/dec_qkv (self-attention projections),
    # cross_q/cross_kv (cross-attention projections), enc_mlp_h/dec_mlp_h
    # (fc1 outputs, the gelu inputs), enc_ln1/enc_ln2/dec_ln1/
    # dec_ln_cross/dec_ln2 (pre-sublayer layer norms).
    remat_policy: str = "full"
    # Whole-layer drop probability, per side: the reference zeroes stochastic
    # depth on a frozen encoder/decoder in train_only_* runs
    # (finetune.py:423-425).
    stochastic_depth: float = 0.0
    stochastic_depth_encoder: Optional[float] = None
    stochastic_depth_decoder: Optional[float] = None
    # Deep SpecAugment (encoder-internal masking of normalized activations).
    dsa_apply: bool = False
    dsa_time_mask_param: int = 100
    dsa_freq_mask_param: int = 27
    dsa_p: float = 1.0
    # Per-encoder-layer application flags; None = reference default
    # (every block except the last, model_utils.py:419-431).
    dsa_layer_indices: Optional[Tuple[int, ...]] = None
    # LoRA: alpha/rank scale folded into per-layer kernels inside the scan
    # body (see models/lora.py). 0.0 = adapters (if any) are inert.
    lora_scale: float = 0.0
    lora_dropout: float = 0.0
    # Attention implementation: "xla" (reference-faithful einsum),
    # "flash" (legacy Pallas kernel), "splash" (fused fwd+bwd Pallas
    # kernels), or "flash_fwd" (flash fwd + XLA bwd) — see ops/attention.py.
    # Per-site overrides fall back to attn_impl when None; the measured
    # fastest mix on v5e is splash for the 1500-frame encoder self-attention
    # with xla elsewhere (tools/bench_attention.py).
    attn_impl: str = "xla"
    attn_impl_encoder: Optional[str] = None
    attn_impl_decoder: Optional[str] = None
    attn_impl_cross: Optional[str] = None
    # Pre-cast stacked block weights to the compute dtype outside the scan
    # (see _cast_blocks_once): trades ~half the weight bytes per pass for a
    # resident bf16 copy of the block tree (~3.1GB for large-v3). Turn off
    # to fund bigger ``save:`` remat policies from the same HBM.
    precast_weights: bool = True

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)

    @property
    def sd_encoder(self) -> float:
        return (
            self.stochastic_depth
            if self.stochastic_depth_encoder is None
            else self.stochastic_depth_encoder
        )

    @property
    def sd_decoder(self) -> float:
        return (
            self.stochastic_depth
            if self.stochastic_depth_decoder is None
            else self.stochastic_depth_decoder
        )

    @property
    def enc_attn(self) -> str:
        return self.attn_impl_encoder or self.attn_impl

    @property
    def dec_attn(self) -> str:
        return self.attn_impl_decoder or self.attn_impl

    @property
    def cross_attn(self) -> str:
        return self.attn_impl_cross or self.attn_impl


def _remat(fn, fcfg: ForwardConfig):
    policy = None
    if fcfg.remat_policy == "dots":
        policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    elif fcfg.remat_policy == "attn":
        # Keep only the softmaxed attention probabilities resident: the
        # backward pass then skips recomputing the (B, H, T, T) fp32 score +
        # softmax pipeline (the HBM-heaviest part of a block) at the cost of
        # one bf16 probability tensor per layer. Both per-call-site names
        # participate (self- and cross-attention), preserving this policy's
        # pre-renaming behaviour.
        policy = jax.checkpoint_policies.save_only_these_names(
            "attn_probs", "cross_attn_probs"
        )
    elif fcfg.remat_policy.startswith(("save:", "offload:")):
        # Grammar: '+'-separated segments, each 'save:<names>' or
        # 'offload:<names>' (comma-separated checkpoint_name sites).
        # 'save' keeps the site resident in HBM; 'offload' DMAs it to
        # pinned host RAM on the forward pass and back for the backward —
        # trading HBM for PCIe/DMA bandwidth instead of recompute FLOPs
        # (the round-5 remat ladder measures which wins per site).
        saved: list = []
        offloaded: list = []
        for seg in fcfg.remat_policy.split("+"):
            if seg.startswith("save:"):
                dst = saved
                body = seg[len("save:"):]
            elif seg.startswith("offload:"):
                dst = offloaded
                body = seg[len("offload:"):]
            else:
                raise ValueError(
                    f"remat_policy segment {seg!r}: expected 'save:...' or"
                    " 'offload:...'"
                )
            dst.extend(n.strip() for n in body.split(",") if n.strip())
        if not saved and not offloaded:
            raise ValueError(
                "remat_policy 'save:'/'offload:' needs at least one name"
            )
        if offloaded:
            policy = jax.checkpoint_policies.save_and_offload_only_these_names(
                names_which_can_be_saved=tuple(saved),
                names_which_can_be_offloaded=tuple(offloaded),
                offload_src="device",
                offload_dst="pinned_host",
            )
        else:
            policy = jax.checkpoint_policies.save_only_these_names(*saved)
    elif fcfg.remat_policy != "full":
        raise ValueError(f"Unknown remat_policy: {fcfg.remat_policy}")
    return jax.checkpoint(fn, prevent_cse=False, policy=policy)


def dsa_layer_flags(fcfg: ForwardConfig, n_layers: int) -> np.ndarray:
    """Boolean per-layer flags for deep SpecAugment, last layer always off."""
    flags = np.zeros((n_layers,), dtype=bool)
    if not fcfg.dsa_apply:
        return flags
    if fcfg.dsa_layer_indices is None:
        flags[: max(n_layers - 1, 0)] = True
        return flags
    for idx in fcfg.dsa_layer_indices:
        if idx >= n_layers:
            raise ValueError(f"deep_spec_augment layer index {idx} out of range")
        if idx == n_layers - 1:
            continue  # reference skips the final block silently
        flags[idx] = True
    return flags


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------

def sinusoids(length: int, channels: int, max_timescale: float = 10000.0) -> np.ndarray:
    """Sinusoidal position embedding, identical recipe to openai-whisper."""
    assert channels % 2 == 0
    log_timescale_increment = np.log(max_timescale) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled_time), np.cos(scaled_time)], axis=1).astype(
        np.float32
    )


def _linear_init(key, fan_in: int, shape) -> jnp.ndarray:
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def _init_attn(key, d: int) -> Params:
    ks = jax.random.split(key, 7)
    return {
        "q_w": _linear_init(ks[0], d, (d, d)),
        "q_b": jnp.zeros((d,), jnp.float32),
        "k_w": _linear_init(ks[1], d, (d, d)),
        "v_w": _linear_init(ks[2], d, (d, d)),
        "v_b": jnp.zeros((d,), jnp.float32),
        "o_w": _linear_init(ks[3], d, (d, d)),
        "o_b": jnp.zeros((d,), jnp.float32),
    }


def _init_ln(d: int) -> Params:
    return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


def _init_block(key, d: int, cross: bool) -> Params:
    ks = jax.random.split(key, 4)
    block = {
        "attn": _init_attn(ks[0], d),
        "attn_ln": _init_ln(d),
        "mlp": {
            "fc1_w": _linear_init(ks[1], d, (d, 4 * d)),
            "fc1_b": jnp.zeros((4 * d,), jnp.float32),
            "fc2_w": _linear_init(ks[2], 4 * d, (4 * d, d)),
            "fc2_b": jnp.zeros((d,), jnp.float32),
        },
        "mlp_ln": _init_ln(d),
    }
    if cross:
        block["cross_attn"] = _init_attn(ks[3], d)
        block["cross_attn_ln"] = _init_ln(d)
    return block


def _stack_blocks(blocks) -> Params:
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *blocks)


def init_params(key: jax.Array, dims: ModelDimensions) -> Params:
    """Random initialization (torch-Linear-style uniform) for all weights.

    Production runs load pretrained OpenAI checkpoints via
    :mod:`whisper_finetune_tpu.models.checkpoint`; random init backs tests and
    from-scratch experiments.
    """
    d_a, d_t = dims.n_audio_state, dims.n_text_state
    keys = jax.random.split(key, 6)

    enc_blocks = [
        _init_block(k, d_a, cross=False)
        for k in jax.random.split(keys[0], dims.n_audio_layer)
    ]
    dec_blocks = [
        _init_block(k, d_t, cross=True)
        for k in jax.random.split(keys[1], dims.n_text_layer)
    ]

    conv_keys = jax.random.split(keys[2], 2)
    encoder = {
        "conv1": {
            "w": _linear_init(conv_keys[0], dims.n_mels * 3, (3, dims.n_mels, d_a)),
            "b": jnp.zeros((d_a,), jnp.float32),
        },
        "conv2": {
            "w": _linear_init(conv_keys[1], d_a * 3, (3, d_a, d_a)),
            "b": jnp.zeros((d_a,), jnp.float32),
        },
        "blocks": _stack_blocks(enc_blocks),
        "ln_post": _init_ln(d_a),
    }
    decoder = {
        "tok_emb": jax.random.normal(keys[3], (dims.n_vocab, d_t), jnp.float32) * 0.02,
        "pos_emb": jax.random.normal(keys[4], (dims.n_text_ctx, d_t), jnp.float32)
        * 0.01,
        "blocks": _stack_blocks(dec_blocks),
        "ln": _init_ln(d_t),
    }
    return {"encoder": encoder, "decoder": decoder}


# ---------------------------------------------------------------------------
# Core ops
# ---------------------------------------------------------------------------

def layer_norm(x: jnp.ndarray, p: Params, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm computed in fp32, result cast back to x.dtype (whisper's
    LayerNorm subclass semantics)."""
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(orig_dtype)


def _dense(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray], dtype) -> jnp.ndarray:
    y = jnp.matmul(x.astype(dtype), w.astype(dtype))
    if b is not None:
        y = y + b.astype(dtype)
    return y


def multi_head_attention(
    x: jnp.ndarray,
    kv: jnp.ndarray,
    p: Params,
    n_head: int,
    dtype,
    causal: bool = False,
    impl: str = "xla",
    probs_name: str = "attn_probs",
    site: str = "enc",
) -> jnp.ndarray:
    """Whisper-convention MHA (q and k each effectively scaled by
    d_head**-0.25, fp32 softmax — openai-whisper ``qkv_attention``
    semantics), dispatched to the XLA einsum path or the fused Pallas flash
    kernel (ops/attention.py). The q/k/v projections carry per-site
    checkpoint names (``{site}_qkv`` / ``cross_q``+``cross_kv``) so a
    ``save:`` remat policy can pin them resident — cross-attention k/v are
    separable because their 1500-frame projections are the most expensive
    decoder-side tensors to recompute."""
    from jax.ad_checkpoint import checkpoint_name

    from whisper_finetune_tpu.ops.attention import attention

    B, T, d = x.shape
    S = kv.shape[1]
    d_head = d // n_head

    q = _dense(x, p["q_w"], p["q_b"], dtype).reshape(B, T, n_head, d_head)
    k = _dense(kv, p["k_w"], None, dtype).reshape(B, S, n_head, d_head)
    v = _dense(kv, p["v_w"], p["v_b"], dtype).reshape(B, S, n_head, d_head)
    if site == "cross":
        q = checkpoint_name(q, "cross_q")
        k = checkpoint_name(k, "cross_kv")
        v = checkpoint_name(v, "cross_kv")
    else:
        q = checkpoint_name(q, f"{site}_qkv")
        k = checkpoint_name(k, f"{site}_qkv")
        v = checkpoint_name(v, f"{site}_qkv")

    o = attention(
        q.transpose(0, 2, 1, 3),
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        causal=causal,
        sm_scale=float(d_head) ** -0.5,
        impl=impl,
        probs_name=probs_name,
    )
    o = o.transpose(0, 2, 1, 3).reshape(B, T, d).astype(dtype)
    return _dense(o, p["o_w"], p["o_b"], dtype)


def _mlp(x: jnp.ndarray, p: Params, dtype, site: str = "enc") -> jnp.ndarray:
    from jax.ad_checkpoint import checkpoint_name

    h = _dense(x, p["fc1_w"], p["fc1_b"], dtype)
    # fc1's output is the single biggest-FLOP recompute chokepoint in a
    # block's backward replay; name it so a save: policy can pin it.
    h = checkpoint_name(h, f"{site}_mlp_h")
    h = jax.nn.gelu(h, approximate=False)
    return _dense(h, p["fc2_w"], p["fc2_b"], dtype)


def _axis_mask(key: jax.Array, size: int, mask_param: int) -> jnp.ndarray:
    """torchaudio-style axis masking: width ~ U[0, mask_param), start
    ~ U[0, size - width); returns a {0,1} keep-vector of length ``size``."""
    k1, k2 = jax.random.split(key)
    width = jax.random.uniform(k1) * mask_param
    start = jax.random.uniform(k2) * (size - width)
    idx = jnp.arange(size, dtype=jnp.float32)
    masked = (idx >= start) & (idx < start + width)
    return jnp.where(masked, 0.0, 1.0)


def _deep_spec_augment(x: jnp.ndarray, key: jax.Array, fcfg: ForwardConfig) -> jnp.ndarray:
    """Mask a random time span and a random feature span of (B, T, d)
    activations — the reference's per-block hook applies TimeMasking then
    FrequencyMasking on the (B, d, T) permutation with a batch-shared mask
    (model_utils.py:404-417)."""
    B, T, d = x.shape
    kt, kf = jax.random.split(key)
    time_keep = _axis_mask(kt, T, fcfg.dsa_time_mask_param).astype(x.dtype)
    feat_keep = _axis_mask(kf, d, fcfg.dsa_freq_mask_param).astype(x.dtype)
    return x * time_keep[None, :, None] * feat_keep[None, None, :]


# ---------------------------------------------------------------------------
# Transformer blocks (scan bodies)
# ---------------------------------------------------------------------------

def _encoder_block(
    x: jnp.ndarray,
    bp: Params,
    fcfg: ForwardConfig,
    n_head: int,
    dsa_on: jnp.ndarray,
    dsa_key: jax.Array,
    train: bool,
) -> jnp.ndarray:
    from jax.ad_checkpoint import checkpoint_name

    dtype = fcfg.dtype
    x_ln = layer_norm(x, bp["attn_ln"])
    if train and fcfg.dsa_apply:
        masked = _deep_spec_augment(x_ln, dsa_key, fcfg)
        x_ln = jnp.where(dsa_on, masked, x_ln)
    x_ln = checkpoint_name(x_ln, "enc_ln1")
    x = x + multi_head_attention(
        x_ln, x_ln, bp["attn"], n_head, dtype, impl=fcfg.enc_attn, site="enc"
    )
    x_ln2 = checkpoint_name(layer_norm(x, bp["mlp_ln"]), "enc_ln2")
    x = x + _mlp(x_ln2, bp["mlp"], dtype, site="enc")
    return x


def _decoder_block(
    x: jnp.ndarray,
    bp: Params,
    xa: jnp.ndarray,
    fcfg: ForwardConfig,
    n_head: int,
) -> jnp.ndarray:
    from jax.ad_checkpoint import checkpoint_name

    dtype = fcfg.dtype
    x_ln = checkpoint_name(layer_norm(x, bp["attn_ln"]), "dec_ln1")
    x = x + multi_head_attention(
        x_ln, x_ln, bp["attn"], n_head, dtype, causal=True,
        impl=fcfg.dec_attn, site="dec",
    )
    x_lnc = checkpoint_name(layer_norm(x, bp["cross_attn_ln"]), "dec_ln_cross")
    x = x + multi_head_attention(
        x_lnc, xa, bp["cross_attn"], n_head, dtype,
        impl=fcfg.cross_attn, probs_name="cross_attn_probs", site="cross",
    )
    x_ln2 = checkpoint_name(layer_norm(x, bp["mlp_ln"]), "dec_ln2")
    x = x + _mlp(x_ln2, bp["mlp"], dtype, site="dec")
    return x


def _cast_blocks_once(blocks: Params, fcfg: ForwardConfig, train: bool) -> Params:
    """Pre-cast stacked block weights to the compute dtype OUTSIDE the
    rematted scan body.

    ``_dense`` casts at use, so under full remat every forward/recompute/
    backward pass re-reads the fp32 tree from HBM (6.2GB x ~4 passes for
    large-v3 — ~90ms at the measured 276GB/s). Hoisting the cast makes the
    bf16 copy a scan input: saved once, read at half the bytes each pass.
    Numerically identical (same cast, moved earlier): only ndim>=2 kernels
    are cast — exactly the leaves ``_dense`` casts at use. 1-D leaves stay
    fp32 (LayerNorm gains/biases are consumed in fp32 math and must not be
    quantized). Skipped for LoRA runs so adapter deltas still apply to fp32
    base weights, and in fp32 compute where it would be a no-op."""
    dtype = fcfg.dtype
    if (
        not train
        or not fcfg.precast_weights
        or fcfg.lora_scale
        or dtype == jnp.float32
    ):
        return blocks
    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype)
        if (a.dtype == jnp.float32 and a.ndim >= 3)  # stacked (L, in, out)
        else a,
        blocks,
    )


def _cast_block_slice(bp: Params, x, fcfg: ForwardConfig, train: bool):
    """The ``precast_weights=False`` counterpart of :func:`_cast_blocks_once`:
    cast ONE layer's weight matrices to the compute dtype *inside* the scan
    body, behind an ``optimization_barrier`` tied to the carry.

    The barrier is the load-bearing part: without it XLA rewrites
    ``convert(dynamic_slice(W, i))`` into ``dynamic_slice(convert(W), i)``
    and hoists the convert out of the loop, materializing the full bf16
    tree anyway (measured on large-v3: 17.7 GB used — *more* than
    precasting). Barriered, only one layer's bf16 slices (~90-180 MB) are
    ever live, trading the 2.9 GB resident shadow for re-reading fp32
    weights each pass (~+10 ms/microbatch at the measured 276 GB/s) — the
    difference between fitting and OOMing the split-update Muon flagship's
    accumulation program on one 16 GB chip. Same numerics and the same
    leaf set (the ndim>=2 matrices ``_dense`` casts at use) as
    :func:`_cast_blocks_once`."""
    dtype = fcfg.dtype
    if (
        not train
        or fcfg.precast_weights
        or fcfg.lora_scale
        or dtype == jnp.float32
    ):
        return bp, x
    bp, x = jax.lax.optimization_barrier((bp, x))
    bp = jax.tree_util.tree_map(
        lambda a: a.astype(dtype)
        if (a.dtype == jnp.float32 and a.ndim >= 2)  # per-layer (in, out)
        else a,
        bp,
    )
    return bp, x


def _stochastic_wrap(x, run_block, sd_key, p: float, train: bool):
    """Reference stochastic-depth semantics (model_utils.py:226-250): with
    probability p skip the block entirely; otherwise rescale the residual
    delta by 1/(1-p). One scalar coin per (layer, step), shared across the
    batch. ``lax.cond`` ensures the skipped branch costs nothing at runtime.
    """
    if not train or p <= 0.0:
        return run_block(x)
    keep_prob = 1.0 - p
    skip = jax.random.uniform(sd_key) < p

    def skipped(x):
        return x

    def kept(x):
        out = run_block(x)
        return x + (out - x) / keep_prob

    return jax.lax.cond(skip, skipped, kept, x)


# ---------------------------------------------------------------------------
# Shared forward segments
#
# These are the pieces of encoder_forward/decoder_forward that
# train.manual_grad replays one segment at a time (its hand-written
# accumulating backward). They live HERE, not as copies in manual_grad, so
# the two paths cannot drift: any change to the stem/embed math or to the
# per-step RNG layout is automatically shared (parity is additionally
# pinned by tests/test_manual_grad.py).
# ---------------------------------------------------------------------------

def conv_stem(enc: Params, mel: jnp.ndarray, dims: ModelDimensions, dtype) -> jnp.ndarray:
    """Conv1 -> GELU -> conv2(stride 2) -> GELU -> +sinusoidal positions.

    mel (B, n_mels, 3000) -> (B, n_audio_ctx, d) in the compute dtype."""
    x = jnp.swapaxes(mel, -1, -2).astype(dtype)  # (B, T_samples/hop, n_mels)
    x = jax.lax.conv_general_dilated(
        x, enc["conv1"]["w"].astype(dtype), window_strides=(1,),
        padding=((1, 1),), dimension_numbers=("NWC", "WIO", "NWC"),
    ) + enc["conv1"]["b"].astype(dtype)
    x = jax.nn.gelu(x, approximate=False)
    x = jax.lax.conv_general_dilated(
        x, enc["conv2"]["w"].astype(dtype), window_strides=(2,),
        padding=((1, 1),), dimension_numbers=("NWC", "WIO", "NWC"),
    ) + enc["conv2"]["b"].astype(dtype)
    x = jax.nn.gelu(x, approximate=False)
    pos = jnp.asarray(sinusoids(dims.n_audio_ctx, dims.n_audio_state))
    return (x + pos.astype(dtype)[None, : x.shape[1]]).astype(dtype)


def decoder_embed(dec: Params, tokens: jnp.ndarray, dtype) -> jnp.ndarray:
    """Token + learned positional embedding -> (B, T, d) in compute dtype."""
    T = tokens.shape[-1]
    return (dec["tok_emb"][tokens] + dec["pos_emb"][:T]).astype(dtype)


def encoder_step_rng(rng: jax.Array, L: int, fcfg: ForwardConfig):
    """Per-forward encoder RNG layout: one deep-SpecAugment gate Bernoulli
    (reference forward-pre-hook, model_utils.py:404-407) plus (L, 3) layer
    keys — [0] stochastic depth, [1] DSA masks, [2] LoRA dropout."""
    gate_key, layers_key = jax.random.split(rng)
    layer_keys = jax.random.split(layers_key, L * 3).reshape(L, 3, 2)
    dsa_gate = jax.random.uniform(gate_key) < fcfg.dsa_p
    return dsa_gate, layer_keys


def decoder_step_rng(rng: jax.Array, L: int) -> jax.Array:
    """(L, 2) decoder layer keys — [0] stochastic depth, [1] LoRA dropout."""
    return jax.random.split(rng, L * 2).reshape(L, 2, 2)


# ---------------------------------------------------------------------------
# Encoder / decoder forwards
# ---------------------------------------------------------------------------

def encoder_forward(
    params: Params,
    mel: jnp.ndarray,
    dims: ModelDimensions,
    fcfg: ForwardConfig,
    rng: Optional[jax.Array] = None,
    train: bool = False,
) -> jnp.ndarray:
    """mel (B, n_mels, 3000) -> audio features (B, n_audio_ctx, d), fp32."""
    enc = params["encoder"]
    dtype = fcfg.dtype
    n_head = dims.n_audio_head
    L = dims.n_audio_layer

    x = conv_stem(enc, mel, dims, dtype)

    if rng is None:
        rng = jax.random.PRNGKey(0)
    dsa_gate, layer_keys = encoder_step_rng(rng, L, fcfg)
    dsa_flags = jnp.asarray(dsa_layer_flags(fcfg, L))

    def body(x, scanned):
        bp, keys, flag = scanned
        bp, x = _cast_block_slice(bp, x, fcfg, train)
        dsa_on = jnp.logical_and(dsa_gate, flag)
        if fcfg.lora_scale:
            from whisper_finetune_tpu.models.lora import materialize_block_lora

            bp = materialize_block_lora(
                bp, fcfg.lora_scale, fcfg.lora_dropout, keys[2], train
            )

        def run(x):
            return _encoder_block(x, bp, fcfg, n_head, dsa_on, keys[1], train)

        x = _stochastic_wrap(x, run, keys[0], fcfg.sd_encoder, train)
        return x, None

    scan_body = body
    if fcfg.remat_encoder:
        scan_body = _remat(body, fcfg)

    blocks = _cast_blocks_once(enc["blocks"], fcfg, train)
    if fcfg.remat_encoder_last_only and not fcfg.remat_encoder and L > 1:
        head = jax.tree_util.tree_map(lambda a: a[:-1], blocks)
        tail = jax.tree_util.tree_map(lambda a: a[-1], blocks)
        x, _ = jax.lax.scan(body, x, (head, layer_keys[:-1], dsa_flags[:-1]))
        rematted = _remat(body, fcfg)
        x, _ = rematted(x, (tail, layer_keys[-1], dsa_flags[-1]))
    else:
        x, _ = jax.lax.scan(scan_body, x, (blocks, layer_keys, dsa_flags))

    return layer_norm(x, enc["ln_post"]).astype(jnp.float32)


def decoder_forward(
    params: Params,
    tokens: jnp.ndarray,
    xa: jnp.ndarray,
    dims: ModelDimensions,
    fcfg: ForwardConfig,
    rng: Optional[jax.Array] = None,
    train: bool = False,
) -> jnp.ndarray:
    """tokens (B, T) int32, xa (B, S, d) -> logits (B, T, n_vocab) fp32."""
    dec = params["decoder"]
    dtype = fcfg.dtype
    n_head = dims.n_text_head
    L = dims.n_text_layer

    x = decoder_embed(dec, tokens, dtype)
    xa = xa.astype(dtype)

    if rng is None:
        rng = jax.random.PRNGKey(0)
    layer_keys = decoder_step_rng(rng, L)

    def body(x, scanned):
        bp, keys = scanned
        bp, x = _cast_block_slice(bp, x, fcfg, train)
        if fcfg.lora_scale:
            from whisper_finetune_tpu.models.lora import materialize_block_lora

            bp = materialize_block_lora(
                bp, fcfg.lora_scale, fcfg.lora_dropout, keys[1], train
            )

        def run(x):
            return _decoder_block(x, bp, xa, fcfg, n_head)

        x = _stochastic_wrap(x, run, keys[0], fcfg.sd_decoder, train)
        return x, None

    scan_body = body
    if fcfg.remat_decoder:
        scan_body = _remat(body, fcfg)

    x, _ = jax.lax.scan(
        scan_body, x, (_cast_blocks_once(dec["blocks"], fcfg, train), layer_keys)
    )

    x = layer_norm(x, dec["ln"])
    # Tied output embedding, fp32 logits (model_utils.py:325 semantics: the
    # reference's autocast computes this matmul in half precision and casts
    # ``.float()`` after — so the matmul output is stored in the compute
    # dtype here (fp32 MXU accumulation) and upcast for the loss, halving
    # the (B, T, vocab) HBM write in bf16 runs).
    logits = jnp.matmul(
        x.astype(dtype), dec["tok_emb"].T.astype(dtype),
        preferred_element_type=dtype,
    )
    return logits.astype(jnp.float32)


def forward_impl(
    params: Params,
    mel: jnp.ndarray,
    tokens: jnp.ndarray,
    dims: ModelDimensions,
    fcfg: ForwardConfig,
    rng: Optional[jax.Array] = None,
    train: bool = False,
) -> jnp.ndarray:
    """Full teacher-forced forward: (mel, decoder tokens) -> fp32 logits."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    enc_rng, dec_rng = jax.random.split(rng)
    xa = encoder_forward(params, mel, dims, fcfg, enc_rng, train)
    return decoder_forward(params, tokens, xa, dims, fcfg, dec_rng, train)


forward = partial(jax.jit, static_argnames=("dims", "fcfg", "train"))(forward_impl)
