"""Golden tests for the on-device log-mel front end.

``transformers.WhisperFeatureExtractor`` reproduces openai-whisper's
log_mel_spectrogram numerics (same hann STFT, slaney mel filters, log10 and
dynamic-range compression), so it serves as the reference implementation.
"""

import numpy as np
import pytest

from whisper_finetune_tpu.ops import (
    HOP_LENGTH,
    N_FRAMES,
    N_SAMPLES,
    log_mel_spectrogram,
    mel_filterbank,
)


def _golden_mel(audio: np.ndarray, n_mels: int) -> np.ndarray:
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor(feature_size=n_mels)
    out = fe(
        audio,
        sampling_rate=16000,
        padding=False,
        return_tensors="np",
    )
    return out["input_features"][0]


def _make_audio(n_samples: int) -> np.ndarray:
    rng = np.random.default_rng(0)
    t = np.arange(n_samples) / 16000.0
    sig = (
        0.3 * np.sin(2 * np.pi * 440.0 * t)
        + 0.2 * np.sin(2 * np.pi * 1250.0 * t)
        + 0.05 * rng.standard_normal(n_samples)
    )
    return sig.astype(np.float32)


@pytest.fixture(scope="module")
def audio():
    # 2s keeps the (slow, numpy-STFT) golden extractor fast; numerics are
    # frame-local so short audio exercises the same math as 30s.
    return _make_audio(32000)


@pytest.mark.parametrize("n_mels", [80, 128])
def test_matches_whisper_feature_extractor(audio, n_mels):
    ours = np.asarray(log_mel_spectrogram(audio, n_mels=n_mels))
    golden = _golden_mel(audio, n_mels)
    n_frames = audio.shape[0] // HOP_LENGTH
    assert ours.shape == (n_mels, n_frames)
    assert golden.shape == (n_mels, n_frames)
    np.testing.assert_allclose(ours, golden, atol=5e-4, rtol=0)


@pytest.mark.slow
def test_full_30s_matches_golden():
    sig = _make_audio(N_SAMPLES)
    ours = np.asarray(log_mel_spectrogram(sig, n_mels=128))
    golden = _golden_mel(sig, 128)
    assert ours.shape == (128, N_FRAMES)
    np.testing.assert_allclose(ours, golden, atol=5e-4, rtol=0)


def test_batched_matches_single(audio):
    batch = np.stack([audio, np.roll(audio, 1000)])
    batched = np.asarray(log_mel_spectrogram(batch, n_mels=80))
    single0 = np.asarray(log_mel_spectrogram(batch[0], n_mels=80))
    np.testing.assert_allclose(batched[0], single0, atol=1e-6)


def test_filterbank_properties():
    fb = mel_filterbank(80)
    assert fb.shape == (201, 80)
    # Triangles are non-negative and every filter has support.
    assert (fb >= 0).all()
    assert (fb.sum(axis=0) > 0).all()


def test_short_audio_frame_count():
    # 10s of audio -> 1000 frames (partial-segment path feeds unpadded audio).
    sig = np.zeros(160000, dtype=np.float32)
    out = np.asarray(log_mel_spectrogram(sig, n_mels=80))
    assert out.shape == (80, 160000 // HOP_LENGTH)
