"""Log-mel spectrogram, TPU-first.

Functional replacement for ``whisper.audio.log_mel_spectrogram`` (used by the
reference data pipeline at src/whisper_finetune/data/data_loader.py:13,278):
16 kHz audio -> 400-point hann STFT (hop 160, centered/reflect-padded) ->
power spectrum -> slaney-normalized mel filterbank (80 or 128 bins) ->
log10 -> dynamic-range clamp to (max - 8) -> (x + 4) / 4.

Instead of an FFT, the windowed DFT is expressed as two real matmuls against
precomputed cos/sin matrices with the analysis window folded in, followed by
one mel-projection matmul. At Whisper's fixed sizes (frames [3001, 400] x
basis [400, 201] x mel [201, n_mels]) everything tiles onto the MXU and XLA
fuses the square/add/log elementwise tail; this keeps the whole feature
extractor on-device inside the jitted train step rather than on the host CPU
as in the reference.

Numerics are golden-tested against ``transformers.WhisperFeatureExtractor``
(which reproduces openai-whisper's output) in tests/test_mel.py.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_LENGTH = 30
N_SAMPLES = CHUNK_LENGTH * SAMPLE_RATE  # 480000
N_FRAMES = N_SAMPLES // HOP_LENGTH  # 3000
FRAMES_PER_SECOND = SAMPLE_RATE // HOP_LENGTH  # 100


def _hz_to_mel_slaney(freq: np.ndarray) -> np.ndarray:
    """Slaney-style (librosa default) Hz -> mel."""
    freq = np.asarray(freq, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = freq / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = freq >= min_log_hz
    mels = np.where(
        log_region,
        min_log_mel + np.log(np.maximum(freq, min_log_hz) / min_log_hz) / logstep,
        mels,
    )
    return mels


def _mel_to_hz_slaney(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = mels * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = mels >= min_log_mel
    freqs = np.where(
        log_region,
        min_log_hz * np.exp(logstep * (np.maximum(mels, min_log_mel) - min_log_mel)),
        freqs,
    )
    return freqs


@lru_cache(maxsize=4)
def mel_filterbank(n_mels: int, sr: int = SAMPLE_RATE, n_fft: int = N_FFT) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, shape (n_fft//2+1, n_mels).

    Matches ``librosa.filters.mel(sr, n_fft, n_mels)`` (the filters whisper
    ships as a precomputed asset), transposed for right-multiplication.
    """
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0, sr / 2, n_freqs)
    mel_min = _hz_to_mel_slaney(np.array(0.0))
    mel_max = _hz_to_mel_slaney(np.array(sr / 2.0))
    mel_pts = np.linspace(mel_min, mel_max, n_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts.reshape(-1, 1) - fft_freqs.reshape(1, -1)
    lower = -ramps[:-2] / fdiff[:-1].reshape(-1, 1)
    upper = ramps[2:] / fdiff[1:].reshape(-1, 1)
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney area normalization.
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights = weights * enorm.reshape(-1, 1)
    return weights.T.astype(np.float32)  # (n_freqs, n_mels)


@lru_cache(maxsize=1)
def _dft_basis(n_fft: int = N_FFT) -> tuple:
    """Windowed real-DFT cos/sin matrices, each (n_fft, n_fft//2+1)."""
    n_freqs = n_fft // 2 + 1
    window = np.hanning(n_fft + 1)[:-1]  # periodic hann, == torch.hann_window
    k = np.arange(n_freqs).reshape(1, -1)
    n = np.arange(n_fft).reshape(-1, 1)
    angle = 2.0 * np.pi * n * k / n_fft
    cos_mat = (np.cos(angle) * window.reshape(-1, 1)).astype(np.float32)
    sin_mat = (-np.sin(angle) * window.reshape(-1, 1)).astype(np.float32)
    return cos_mat, sin_mat


from functools import partial


@partial(jax.jit, static_argnames=("n_mels",))
def log_mel_spectrogram(audio: jnp.ndarray, n_mels: int = 80) -> jnp.ndarray:
    """Compute Whisper log-mel features on device.

    Args:
        audio: float32 waveform, shape (..., n_samples). The caller pads to
            N_SAMPLES in the audio domain (matching the reference's
            data_loader.py:344-346 zero-pad-before-mel policy).
        n_mels: 80 (v2-era models) or 128 (large-v3 family).

    Returns:
        (..., n_mels, n_samples // HOP_LENGTH) float32 log-mel features.
    """
    cos_np, sin_np = _dft_basis()
    # Framing + windowed DFT as ONE strided convolution: kernel
    # (n_fft, 1, 2*n_freqs) holding [cos | sin] windowed bases, stride = hop.
    # XLA lowers this straight onto the MXU — no strided-gather
    # materialization of the (B, frames, n_fft) tensor.
    n_freqs = cos_np.shape[1]
    basis = jnp.asarray(
        np.concatenate([cos_np, sin_np], axis=1).reshape(N_FFT, 1, 2 * n_freqs)
    )
    filters = jnp.asarray(mel_filterbank(n_mels))

    n_samples = audio.shape[-1]
    # Centered STFT: reflect-pad n_fft//2 on both sides.
    pad = N_FFT // 2
    batch_shape = audio.shape[:-1]
    flat = audio.reshape((-1, n_samples)).astype(jnp.float32)
    padded = jnp.pad(flat, ((0, 0), (pad, pad)), mode="reflect")

    spec = jax.lax.conv_general_dilated(
        padded[:, :, None],
        basis,
        window_strides=(HOP_LENGTH,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        precision=jax.lax.Precision.HIGHEST,
    )  # (B, num_frames, 2*n_freqs)

    # Whisper drops the final frame before the power spectrum.
    spec = spec[:, :-1, :]
    real = spec[..., :n_freqs]
    imag = spec[..., n_freqs:]
    power = real * real + imag * imag  # (B, T, n_freqs)

    hi = jax.lax.Precision.HIGHEST

    mel = jnp.matmul(power, filters, precision=hi)  # (B, T, n_mels)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    max_per_sample = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
    log_spec = jnp.maximum(log_spec, max_per_sample - 8.0)
    log_spec = (log_spec + 4.0) / 4.0

    out = jnp.swapaxes(log_spec, -1, -2)  # (B, n_mels, T)
    return out.reshape(batch_shape + out.shape[1:])
