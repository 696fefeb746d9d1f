"""Fused (flash) attention for the transformer hot path.

The reference's attention materializes the full (B, H, T_q, T_k) score
matrix in fp32 (openai-whisper ``qkv_attention``); at Whisper's 1500-frame
encoder context that is ~180MB per layer per microbatch of HBM traffic in
each direction. This wrapper drives the Pallas TPU flash-attention kernel
(jax.experimental.pallas.ops.tpu.flash_attention — forward and custom-VJP
backward, fp32 accumulation inside VMEM, nothing materialized in HBM),
handling Whisper's shapes:

* sequence lengths 1500 / 448 are padded to the kernel's block multiples
  (1536 / 512) with segment-id masking so padded keys are unreachable,
* Whisper's symmetric q/k scaling (d**-0.25 each) folds into the kernel's
  ``sm_scale = d**-0.5`` (identical math, fp32 inside the kernel).

``attention(...)`` falls back to the plain XLA einsum path off-TPU, so the
model runs identically (within bf16 tolerance) on CPU test meshes.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def _pad_to(x: jnp.ndarray, length: int, axis: int) -> jnp.ndarray:
    pad = length - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _round_up(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def _block(size: int, cap: int = 512) -> int:
    """Largest 128-multiple divisor of ``size`` not exceeding ``cap``
    (size itself is always a 128-multiple here)."""
    best = 128
    for candidate in range(128, cap + 1, 128):
        if size % candidate == 0:
            best = candidate
    return best


def flash_mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    causal: bool = False,
    sm_scale: float = 1.0,
) -> jnp.ndarray:
    """q (B, H, Tq, D), k/v (B, H, Tk, D) -> (B, H, Tq, D) via the Pallas
    TPU flash kernel, with automatic padding to block multiples.

    Block sizes are tuned for Whisper's shapes: measured on v5e, 512-blocks
    run the padded 1536-frame encoder attention ~1.45x faster than the XLA
    einsum path (the kernel's defaults are ~2x slower — always set blocks).
    """
    if jax.devices()[0].platform == "cpu":
        # The legacy kernel has no interpreter path; keep CPU test meshes
        # running on identical math via the XLA implementation.
        return xla_mha(q, k, v, causal=causal, sm_scale=sm_scale)

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    B, H, Tq, D = q.shape
    Tk = k.shape[2]
    Tq_pad = _round_up(Tq, 128)
    Tk_pad = _round_up(Tk, 128)
    bq = _block(Tq_pad)
    bk = _block(Tk_pad)
    block_sizes = BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=bk,
        block_q_dkv=bq, block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
    )

    qp = _pad_to(q, Tq_pad, 2)
    kp = _pad_to(k, Tk_pad, 2)
    vp = _pad_to(v, Tk_pad, 2)

    segment_ids = None
    if Tq_pad != Tq or Tk_pad != Tk:
        # valid positions get segment 1, padding 0 -> padded keys are
        # unreachable from valid queries (and padded query rows are sliced
        # off below).
        q_seg = (jnp.arange(Tq_pad) < Tq).astype(jnp.int32)[None, :].repeat(B, 0)
        kv_seg = (jnp.arange(Tk_pad) < Tk).astype(jnp.int32)[None, :].repeat(B, 0)
        segment_ids = SegmentIds(q=q_seg, kv=kv_seg)

    out = flash_attention(
        qp, kp, vp,
        segment_ids=segment_ids,
        causal=causal,
        sm_scale=sm_scale,
        block_sizes=block_sizes,
    )
    return out[:, :, :Tq, :]


def xla_mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    causal: bool = False,
    sm_scale: float = 1.0,
    mask: Optional[jnp.ndarray] = None,
    probs_name: str = "attn_probs",
) -> jnp.ndarray:
    """Reference-faithful XLA path: scores stored in the compute dtype with
    fp32 MXU accumulation, softmax in fp32 — exactly whisper's fp16-autocast
    behaviour (``qk`` computed in half precision, ``qk.float()`` before the
    softmax). Storing bf16 scores instead of fp32 cuts the dominant HBM
    tensor of the 1500-frame encoder in half (~15% faster forward)."""
    dtype = q.dtype
    Tq, Tk = q.shape[2], k.shape[2]
    scale = sm_scale ** 0.5  # apply symmetrically like whisper (d**-0.25 each)
    qk = jnp.einsum(
        "bhtd,bhsd->bhts", q * scale, k * scale,
        preferred_element_type=dtype,
    ).astype(jnp.float32)
    if causal:
        cm = jnp.triu(jnp.full((Tq, Tk), -jnp.inf, jnp.float32), k=1)
        qk = qk + cm[None, None]
    if mask is not None:
        qk = qk + mask[None, None, :Tq, :Tk]
    w = jax.nn.softmax(qk, axis=-1).astype(dtype)
    from jax.ad_checkpoint import checkpoint_name

    # named per call site so remat policies can save e.g. only the decoder
    # self-attention probabilities (48MB/layer) without also pinning the
    # 3.4x-larger cross-attention tensors
    w = checkpoint_name(w, probs_name)
    return jnp.einsum("bhts,bhsd->bhtd", w, v)


# ---------------------------------------------------------------------------
# Splash attention (the production TPU kernel: fused fwd + Pallas bwd)
# ---------------------------------------------------------------------------

SPLASH_VARIANTS = ("default", "fused_bwd")

_SPLASH_CACHE: dict = {}


def _splash_kernel(n_heads, Tq_pad, Tk_pad, Tq, Tk, causal, variant):
    """Build (and cache) a SplashAttentionKernel for a static shape+mask.

    The mask is static: keys beyond ``Tk`` are never attendable, queries
    beyond ``Tq`` are garbage rows sliced off by the caller (they get one
    attendable key so every softmax row stays well-formed)."""
    env_variant = os.environ.get("WFT_SPLASH_VARIANT")
    if env_variant:
        # Benchmarking override (see WFT_SPLASH_BQ/BKV below): validate and
        # announce it, so a stray exported variable can't silently swap the
        # production kernel or fail with a confusing downstream error.
        if env_variant not in SPLASH_VARIANTS:
            raise ValueError(
                f"WFT_SPLASH_VARIANT={env_variant!r} is not one of "
                f"{SPLASH_VARIANTS}"
            )
        if env_variant != variant and not _SPLASH_CACHE:
            print(
                f"WFT_SPLASH_VARIANT override active: splash kernels use "
                f"{env_variant!r} (benchmarking knob)"
            )
        variant = env_variant
    key = (n_heads, Tq_pad, Tk_pad, Tq, Tk, causal, variant)
    if key in _SPLASH_CACHE:
        return _SPLASH_CACHE[key]
    import numpy as np
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk,
        splash_attention_mask as sm,
    )

    valid = np.zeros((Tq_pad, Tk_pad), dtype=bool)
    valid[:Tq, :Tk] = (
        np.tril(np.ones((Tq, Tk), dtype=bool)) if causal else True
    )
    valid[Tq:, 0] = True  # keep padded query rows well-formed
    mask = sm.MultiHeadMask([sm.NumpyMask(valid) for _ in range(n_heads)])

    # Measured on v5e (B=6, H=20, D=64, T=1536): the full KV extent in one
    # inner pass (block_kv=1536) beats 512-blocks by ~14% on the fused
    # fwd+bwd round-trip — fewer online-softmax rescale passes.
    # WFT_SPLASH_BQ/BKV are benchmarking overrides (tools/
    # bench_remat_ladder.py sweeps block sizes through the full train
    # step); they are read at trace time, so set them only in dedicated
    # benchmark processes.
    bq = int(os.environ.get("WFT_SPLASH_BQ", 0)) or min(512, Tq_pad)
    bkv = int(os.environ.get("WFT_SPLASH_BKV", 0)) or min(1536, Tk_pad)
    bq = min(bq, Tq_pad)
    bkv = min(bkv, Tk_pad)
    if variant == "fused_bwd":
        block_sizes = sk.BlockSizes(
            block_q=bq, block_kv=bkv,
            block_q_dkv=bq, block_kv_dkv=bkv,
            use_fused_bwd_kernel=True,
        )
    elif variant == "default":
        block_sizes = sk.BlockSizes(
            block_q=bq, block_kv=bkv,
            block_q_dkv=bq, block_kv_dkv=bkv,
            block_q_dq=bq, block_kv_dq=bkv,
        )
    else:
        raise ValueError(f"Unknown splash variant: {variant}")

    # Construction happens eagerly even when first reached inside a jit
    # trace: the kernel's mask-info constants must be concrete (they're
    # cached and reused across traces). Off-TPU the kernel runs in
    # interpreter mode so numerics tests execute on the CPU mesh.
    interpret = jax.devices()[0].platform == "cpu"
    with jax.ensure_compile_time_eval():
        kernel = sk.make_splash_mha(
            mask, block_sizes=block_sizes, head_shards=1, q_seq_shards=1,
            interpret=interpret,
        )
    _SPLASH_CACHE[key] = kernel
    return kernel


def splash_mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    causal: bool = False,
    sm_scale: float = 1.0,
    variant: str = "fused_bwd",
) -> jnp.ndarray:
    """q (B, H, Tq, D), k/v (B, H, Tk, D) -> (B, H, Tq, D) via splash
    attention (jax.experimental.pallas.ops.tpu.splash_attention): fused
    flash forward AND Pallas backward kernels with a built-in custom VJP —
    nothing (Tq, Tk)-shaped ever materializes in HBM in either direction.

    Splash takes per-example (H, T, D) with q pre-scaled, so whisper's
    symmetric d**-0.25 scaling folds into one q multiply and the batch axis
    is vmapped."""
    B, H, Tq, D = q.shape
    Tk = k.shape[2]
    Tq_pad = _round_up(Tq, 128)
    Tk_pad = _round_up(Tk, 128)
    kernel = _splash_kernel(H, Tq_pad, Tk_pad, Tq, Tk, causal, variant)

    qp = _pad_to(q * sm_scale, Tq_pad, 2)
    kp = _pad_to(k, Tk_pad, 2)
    vp = _pad_to(v, Tk_pad, 2)
    out = jax.vmap(kernel)(qp, kp, vp)
    return out[:, :, :Tq, :].astype(q.dtype)


# ---------------------------------------------------------------------------
# Split-direction variant: flash forward, XLA backward
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_fwd_xla_bwd(q, k, v, causal, sm_scale):
    return flash_mha(q, k, v, causal=causal, sm_scale=sm_scale)


def _ffxb_fwd(q, k, v, causal, sm_scale):
    return flash_mha(q, k, v, causal=causal, sm_scale=sm_scale), (q, k, v)


def _ffxb_bwd(causal, sm_scale, residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(
        lambda q, k, v: xla_mha(q, k, v, causal=causal, sm_scale=sm_scale),
        q, k, v,
    )
    return vjp(g)


_flash_fwd_xla_bwd.defvjp(_ffxb_fwd, _ffxb_bwd)


def flash_fwd_xla_bwd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    causal: bool = False,
    sm_scale: float = 1.0,
) -> jnp.ndarray:
    """Pallas flash kernel on the forward pass, XLA einsum math on the
    backward (the measured round-1 combination: flash fwd was 1.45x faster
    than XLA but the legacy Pallas bwd lost more than the fwd gained)."""
    return _flash_fwd_xla_bwd(q, k, v, causal, sm_scale)


def resolve_auto_impls() -> dict:
    """ForwardConfig attention fields for ``attn_impl: auto``: the measured
    fastest mix on TPU, and plain XLA off-TPU (Pallas TPU kernels can't run
    there). Measured on the full large-v3 train step (v5e,
    tools/bench_remat_ladder.py, docs/perf_round3.md):

    * encoder self-attention -> splash: fused fwd+bwd kernels beat XLA by
      ~19% per layer round-trip at the 1500-frame context,
    * decoder cross-attention -> splash: 955.4 vs 973.2 ms/step — the
      (448, 1500) probs (161 MB bf16/layer) were the decoder's largest
      HBM tensors and splash materializes nothing in either direction,
    * decoder self-attention stays XLA: adding splash there measured
      *slower* (961.2 ms) — the 448-token causal shape underfills the
      kernel grid.
    """
    platform = jax.devices()[0].platform
    if platform in ("tpu", "axon"):
        return {
            "attn_impl": "xla",
            "attn_impl_encoder": "splash",
            "attn_impl_cross": "splash",
        }
    return {"attn_impl": "xla"}


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    causal: bool = False,
    sm_scale: float = 1.0,
    impl: str = "xla",
    probs_name: str = "attn_probs",
) -> jnp.ndarray:
    if impl == "flash":
        return flash_mha(q, k, v, causal=causal, sm_scale=sm_scale)
    if impl == "xla":
        return xla_mha(q, k, v, causal=causal, sm_scale=sm_scale,
                       probs_name=probs_name)
    if impl == "splash":
        return splash_mha(q, k, v, causal=causal, sm_scale=sm_scale)
    if impl == "flash_fwd":
        return flash_fwd_xla_bwd(q, k, v, causal=causal, sm_scale=sm_scale)
    raise ValueError(f"Unknown attention impl: {impl}")
