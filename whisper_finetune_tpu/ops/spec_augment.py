"""On-device SpecAugment + the fused featurize stage.

The reference computes mel spectrograms and applies SpecAugment per-sample on
the host CPU inside DataLoader workers
(src/whisper_finetune/data/data_loader.py:273-301, data/utils.py:41-190).
TPU-first, the whole feature path is one jitted, batched stage that runs on
device right after the H2D copy of raw audio:

    audio (B, 480000) --log-mel (MXU matmuls, ops/mel.py)-->
    (B, n_mels, 3000) --partial-segment crop+min-pad-->
    --time warp (Hermite spline, SpecAugment)--> --time mask--> --freq mask-->
    --extremes masking--> model

Per-sample randomness matches the reference's distributions: one
Bernoulli(p) gate per sample (data_loader.py:303-310), warp point
~ U{W, T-W}, warp distance ~ U{-W, W} (data/utils.py:107-113), torchaudio
mask-width conventions, and a single shared ratio for the low/high extremes
bands (data/utils.py:168-183).

The partial-segment crop (reference data_loader.py:253-263, 279-280: if the
text ends with two timestamps, mel frames past the last timestamp are cut and
the spectrogram min-padded back to 3000 frames) arrives as a per-sample frame
count computed by the host tokenizer pass — the device just masks.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from whisper_finetune_tpu.ops.mel import N_FRAMES, log_mel_spectrogram


@dataclasses.dataclass(frozen=True)
class FeaturizeConfig:
    """Static configuration for the fused feature stage."""

    n_mels: int = 80
    spec_augment: bool = False
    time_mask_param: int = 100
    freq_mask_param: int = 43
    time_warp_w: int = 80
    p: float = 1.0
    extremes: bool = False
    low_freq_range: int = 10
    high_freq_range: int = 20


def crop_and_min_pad(mel: jnp.ndarray, crop_frames: jnp.ndarray) -> jnp.ndarray:
    """Mask frames >= crop_frames[i] with the per-sample min over the kept
    region (reference pad_or_trim semantics, data/utils.py:380-404)."""
    B, M, T = mel.shape
    idx = jnp.arange(T)
    valid = idx[None, :] < crop_frames[:, None]  # (B, T)
    inf = jnp.asarray(jnp.inf, mel.dtype)
    min_val = jnp.min(
        jnp.where(valid[:, None, :], mel, inf), axis=(1, 2), keepdims=True
    )
    return jnp.where(valid[:, None, :], mel, min_val)


def _hermite_positions(T: int, warp_p: jnp.ndarray, warp_d: jnp.ndarray) -> jnp.ndarray:
    """Cubic-Hermite warp curve through (0,-1), (warp_p, target), (T-1, 1) in
    normalized [-1, 1] coordinates, evaluated at every output frame — the
    SpecAugment time-warp construction (reference data/utils.py:96-143)."""
    x0 = jnp.zeros_like(warp_p, jnp.float32)
    x1 = warp_p.astype(jnp.float32)
    x2 = jnp.full_like(x1, T - 1.0)
    y0 = jnp.full_like(x1, -1.0)
    y1 = (warp_p - warp_d).astype(jnp.float32) * 2.0 / (T - 1.0) - 1.0
    y2 = jnp.ones_like(x1)

    s0 = (y1 - y0) / (x1 - x0)
    s1 = (y2 - y1) / (x2 - x1)
    m0 = s0
    m1 = (s0 + s1) / 2.0
    m2 = s1

    xs = jnp.arange(T, dtype=jnp.float32)[None, :]  # (1, T)

    def hermite(xa, xb, ya, yb, ma, mb):
        dx = (xb - xa)[:, None]
        t = (xs - xa[:, None]) / dx
        h00 = (1 + 2 * t) * (1 - t) ** 2
        h10 = t * (1 - t) ** 2
        h01 = t**2 * (3 - 2 * t)
        h11 = t**2 * (t - 1)
        return (
            h00 * ya[:, None]
            + h10 * ma[:, None] * dx
            + h01 * yb[:, None]
            + h11 * mb[:, None] * dx
        )

    seg0 = hermite(x0, x1, y0, y1, m0, m1)
    seg1 = hermite(x1, x2, y1, y2, m1, m2)
    return jnp.where(xs < x1[:, None], seg0, seg1)  # (B, T) in [-1, 1]


def time_warp(mel: jnp.ndarray, key: jax.Array, W: int) -> jnp.ndarray:
    """Batched SpecAugment time warp: resample every sample's time axis along
    its Hermite warp curve with bilinear (here: linear-in-time) interpolation
    and zero padding outside the grid — matching grid_sample(align_corners=
    True, padding_mode="zeros") up to interpolation on one axis only (the
    reference's grid is identity along frequency)."""
    B, M, T = mel.shape
    if T <= 2 * W + 1:
        return mel  # warp range would be empty; nothing to do
    kp, kd = jax.random.split(key)
    warp_p = jax.random.randint(kp, (B,), W, T - W)
    warp_d = jax.random.randint(kd, (B,), -W, W)

    ys = _hermite_positions(T, warp_p, warp_d)  # (B, T), normalized
    pos = (ys + 1.0) * (T - 1) / 2.0
    in_range = (ys >= -1.0) & (ys <= 1.0)

    i0 = jnp.clip(jnp.floor(pos), 0, T - 1).astype(jnp.int32)
    i1 = jnp.clip(i0 + 1, 0, T - 1)
    w1 = pos - i0.astype(jnp.float32)
    w0 = 1.0 - w1

    # Gather whole time rows on a time-major layout: a sublane-axis row
    # gather keeps each fetched element a contiguous (n_mels,)-wide vector —
    # orders of magnitude faster on TPU than per-element gathers along the
    # 128-lane (time) axis of the (B, M, T) layout.
    mel_t = jnp.swapaxes(mel, 1, 2)  # (B, T, M)
    g0 = jnp.take_along_axis(mel_t, i0[:, :, None], axis=1)
    g1 = jnp.take_along_axis(mel_t, i1[:, :, None], axis=1)
    warped_t = g0 * w0[:, :, None] + g1 * w1[:, :, None]
    warped_t = jnp.where(in_range[:, :, None], warped_t, 0.0)
    return jnp.swapaxes(warped_t, 1, 2).astype(mel.dtype)


def _axis_masks(key: jax.Array, B: int, size: int, mask_param: int) -> jnp.ndarray:
    """(B, size) multiplicative keep-masks, torchaudio conventions
    (width ~ U[0, mask_param), start ~ U[0, size - width))."""
    k1, k2 = jax.random.split(key)
    width = jax.random.uniform(k1, (B, 1)) * mask_param
    start = jax.random.uniform(k2, (B, 1)) * (size - width)
    idx = jnp.arange(size, dtype=jnp.float32)[None, :]
    masked = (idx >= start) & (idx < start + width)
    return jnp.where(masked, 0.0, 1.0)


def time_and_freq_mask(
    mel: jnp.ndarray, key: jax.Array, time_mask_param: int, freq_mask_param: int
) -> jnp.ndarray:
    B, M, T = mel.shape
    kt, kf = jax.random.split(key)
    tmask = _axis_masks(kt, B, T, time_mask_param).astype(mel.dtype)
    fmask = _axis_masks(kf, B, M, freq_mask_param).astype(mel.dtype)
    return mel * tmask[:, None, :] * fmask[:, :, None]


def extremes_freq_mask(
    mel: jnp.ndarray, key: jax.Array, low_freq_range: int, high_freq_range: int
) -> jnp.ndarray:
    """Zero the lowest/highest mel bins with one shared random ratio per
    sample (reference ExtremesFrequencyMasking, data/utils.py:146-190)."""
    B, M, T = mel.shape
    r = jax.random.uniform(key, (B, 1))
    low_len = jnp.round(r * low_freq_range)
    high_len = jnp.round(r * high_freq_range)
    bins = jnp.arange(M, dtype=jnp.float32)[None, :]
    kill = (bins < low_len) | (bins >= M - high_len)
    return mel * jnp.where(kill, 0.0, 1.0)[:, :, None].astype(mel.dtype)


def featurize_impl(
    audio: jnp.ndarray,
    crop_frames: jnp.ndarray,
    key: Optional[jax.Array],
    cfg: FeaturizeConfig,
    train: bool = False,
) -> jnp.ndarray:
    """audio (B, n_samples) f32 + per-sample crop counts -> augmented log-mel
    (B, n_mels, 3000). The entire stage is one XLA program; under the train
    step it fuses with the encoder's input convolution."""
    mel = log_mel_spectrogram(audio, n_mels=cfg.n_mels)
    mel = crop_and_min_pad(mel, crop_frames)

    if not train:
        return mel

    if key is None:
        key = jax.random.PRNGKey(0)
    k_gate, k_warp, k_mask, k_ext = jax.random.split(key, 4)

    if cfg.spec_augment:
        gate = jax.random.uniform(k_gate, (mel.shape[0],)) < cfg.p
        aug = time_warp(mel, k_warp, cfg.time_warp_w)
        aug = time_and_freq_mask(aug, k_mask, cfg.time_mask_param, cfg.freq_mask_param)
        mel = jnp.where(gate[:, None, None], aug, mel)

    if cfg.extremes:
        mel = extremes_freq_mask(mel, k_ext, cfg.low_freq_range, cfg.high_freq_range)

    return mel


featurize_batch = partial(jax.jit, static_argnames=("cfg", "train"))(featurize_impl)
