"""Mel-inversion (Griffin-Lim) tests — data/inverse_mel.py.

The reference's inverse_mel_to_audio (reference data/utils.py:407-444)
wraps librosa; the rebuild is numpy/scipy. These tests pin the pieces
that make the EDA round trip (tools/eda_spec_augment.py, the reference's
_spec_tw_eda.ipynb cells 22-23) meaningful: the NNLS filterbank
inversion actually solves the mel system, Griffin-Lim recovers the
dominant spectral content of a known tone, and the public API keeps the
reference's signature/conventions (elementwise power pre-emphasis,
float32 numpy out, torch tensors accepted).
"""

import numpy as np
import pytest
from scipy.signal import stft

from whisper_finetune_tpu.data.inverse_mel import (
    griffin_lim,
    inverse_mel_to_audio,
    mel_to_stft,
)
from whisper_finetune_tpu.ops.mel import HOP_LENGTH, N_FFT, SAMPLE_RATE, mel_filterbank


def _power_stft(audio: np.ndarray) -> np.ndarray:
    _, _, Z = stft(
        audio,
        fs=1.0,
        window="hann",
        nperseg=N_FFT,
        noverlap=N_FFT - HOP_LENGTH,
        boundary="zeros",
        padded=True,
    )
    return np.abs(Z) ** 2


def _tone(freqs, seconds=1.0):
    t = np.arange(int(seconds * SAMPLE_RATE)) / SAMPLE_RATE
    return sum(a * np.sin(2 * np.pi * f * t) for f, a in freqs).astype(np.float32)


def test_mel_to_stft_solves_the_mel_system():
    audio = _tone([(440.0, 0.5), (1337.0, 0.3)])
    S_true = _power_stft(audio)
    FB = mel_filterbank(128)
    M = FB.T @ S_true
    mag = mel_to_stft(M)
    resid = np.linalg.norm(FB.T @ (mag**2) - M) / np.linalg.norm(M)
    assert resid < 1e-3  # projected gradient converges on the tone system


def test_griffin_lim_recovers_dominant_tone():
    audio = _tone([(440.0, 0.7)])
    mag = np.sqrt(_power_stft(audio))
    out = griffin_lim(mag)
    assert out.dtype == np.float32
    # Expected length: T frames * hop (boundary frames shave one hop).
    assert abs(len(out) - mag.shape[1] * HOP_LENGTH) <= N_FFT
    spec = np.abs(np.fft.rfft(out[HOP_LENGTH * 10 : HOP_LENGTH * 80]))
    peak_hz = np.argmax(spec) * SAMPLE_RATE / (HOP_LENGTH * 70)
    assert abs(peak_hz - 440.0) < 15.0


def test_inverse_mel_to_audio_api_parity():
    torch = pytest.importorskip("torch")
    audio = _tone([(440.0, 0.5)], seconds=0.5)
    FB = mel_filterbank(80)
    M = FB.T @ _power_stft(audio)
    log_mel = (np.log10(np.maximum(M, 1e-10)) + 4.0) / 4.0
    # Same call shape as the reference notebook: a (possibly torch) log-mel
    # with the default power=10 pre-emphasis.
    out_np = inverse_mel_to_audio(log_mel.astype(np.float32))
    out_torch = inverse_mel_to_audio(torch.from_numpy(log_mel.astype(np.float32)))
    assert out_np.dtype == np.float32 and out_np.ndim == 1
    np.testing.assert_allclose(out_np, out_torch, rtol=0, atol=1e-5)
    # NOTE: with the reference's default power=10 ELEMENTWISE pre-emphasis
    # (reference data/utils.py:439), near-silent normalized log-mel bins
    # ((-1.5)**10 ~ 57) legitimately dominate loud ones — kept verbatim, so
    # tone recovery is asserted through the sane power-mel call instead:
    out_sane = inverse_mel_to_audio(M, power=1)
    spec = np.abs(np.fft.rfft(out_sane))
    peak_hz = np.argmax(spec) * SAMPLE_RATE / len(out_sane)
    assert abs(peak_hz - 440.0) < 20.0
