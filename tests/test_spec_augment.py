"""Tests for the on-device featurize stage and host audio augmentations."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_finetune_tpu.ops.spec_augment import (
    FeaturizeConfig,
    crop_and_min_pad,
    extremes_freq_mask,
    featurize_batch,
    time_and_freq_mask,
    time_warp,
)


def _mel(B=2, M=8, T=64, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((B, M, T)).astype(np.float32))


def test_crop_and_min_pad():
    mel = _mel()
    crop = jnp.asarray([32, 64])
    out = np.asarray(crop_and_min_pad(mel, crop))
    # sample 0: frames >= 32 replaced by min of kept region
    kept_min = np.asarray(mel)[0, :, :32].min()
    assert np.allclose(out[0, :, 32:], kept_min)
    np.testing.assert_array_equal(out[0, :, :32], np.asarray(mel)[0, :, :32])
    # sample 1: untouched
    np.testing.assert_array_equal(out[1], np.asarray(mel)[1])


def test_time_and_freq_mask_zeroes_spans():
    mel = jnp.abs(_mel()) + 1.0  # strictly positive
    out = np.asarray(time_and_freq_mask(mel, jax.random.PRNGKey(0), 20, 4))
    assert out.shape == mel.shape
    zero_frac = (out == 0).mean()
    assert 0 < zero_frac < 0.8
    # per-sample masks differ (iid over batch)
    z0 = (out[0] == 0).sum()
    z1 = (out[1] == 0).sum()
    assert z0 != z1 or not np.array_equal(out[0] == 0, out[1] == 0)


def test_extremes_freq_mask_edges_only():
    mel = jnp.abs(_mel(M=16)) + 1.0
    out = np.asarray(extremes_freq_mask(mel, jax.random.PRNGKey(1), 4, 6))
    for b in range(out.shape[0]):
        zero_bins = np.where((out[b] == 0).all(axis=-1))[0]
        if len(zero_bins):
            # zeroed bins are contiguous from the edges
            low = zero_bins[zero_bins < 8]
            high = zero_bins[zero_bins >= 8]
            if len(low):
                assert low.max() == len(low) - 1
            if len(high):
                assert high.min() == 16 - len(high)
    # interior untouched
    assert (out[:, 6:10, :] > 0).all()


def test_time_warp_shape_and_energy():
    mel = _mel(T=128)
    out = np.asarray(time_warp(mel, jax.random.PRNGKey(2), W=20))
    assert out.shape == mel.shape
    assert np.isfinite(out).all()
    assert not np.allclose(out, np.asarray(mel))  # actually warped
    # tiny spectrogram: warp disabled instead of crashing
    small = _mel(T=16)
    np.testing.assert_array_equal(
        np.asarray(time_warp(small, jax.random.PRNGKey(0), W=20)), np.asarray(small)
    )


def test_featurize_batch_shapes_and_eval_passthrough():
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((2, 48000)).astype(np.float32) * 0.1)
    crop = jnp.asarray([300, 300])
    cfg = FeaturizeConfig(
        n_mels=80, spec_augment=True, time_mask_param=50, freq_mask_param=20,
        time_warp_w=40, p=1.0, extremes=True, low_freq_range=5, high_freq_range=5,
    )
    eval_out = featurize_batch(audio, crop, None, cfg, train=False)
    assert eval_out.shape == (2, 80, 300)
    plain = featurize_batch(audio, crop, None, FeaturizeConfig(n_mels=80), train=False)
    np.testing.assert_allclose(np.asarray(eval_out), np.asarray(plain), atol=1e-6)

    train_out = featurize_batch(audio, crop, jax.random.PRNGKey(0), cfg, train=True)
    assert train_out.shape == (2, 80, 300)
    assert not np.allclose(np.asarray(train_out), np.asarray(eval_out))


def test_featurize_gate_probability_zero():
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((1, 48000)).astype(np.float32) * 0.1)
    crop = jnp.asarray([300])
    cfg = FeaturizeConfig(n_mels=80, spec_augment=True, p=0.0)
    out = featurize_batch(audio, crop, jax.random.PRNGKey(3), cfg, train=True)
    base = featurize_batch(audio, crop, None, FeaturizeConfig(n_mels=80), train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-6)


# ---------------------------------------------------------------------------
# Host audio augmentations
# ---------------------------------------------------------------------------

def test_audio_augment_pipelines_run():
    from whisper_finetune_tpu.data.augment import (
        get_audio_augments_advanced,
        get_audio_augments_baseline,
        get_audio_augments_office,
    )

    rng = np.random.default_rng(0)
    audio = (0.1 * np.sin(2 * np.pi * 440 * np.arange(32000) / 16000)).astype(
        np.float32
    )

    for name, pipeline in (
        ("office", get_audio_augments_office()),
        ("advanced", get_audio_augments_advanced()),
    ):
        out = pipeline(audio, 16000, rng)
        assert out.dtype == np.float32, name
        assert len(out) == len(audio), name  # length-preserving pipelines
        assert np.isfinite(out).all(), name

    baseline = get_audio_augments_baseline(0.8, 1.25)
    out = baseline(audio, 16000, np.random.default_rng(1))
    assert np.isfinite(out).all()
    # TimeStretch with leave_length_unchanged=False may change the length
    assert abs(len(out) - len(audio)) < len(audio) * 0.35


def test_time_stretch_rate_direction():
    from whisper_finetune_tpu.data.augment import TimeStretch

    audio = np.random.default_rng(0).standard_normal(32000).astype(np.float32)
    slow = TimeStretch(0.5, 0.5, p=1.0).apply(audio, 16000, np.random.default_rng(0))
    fast = TimeStretch(2.0, 2.0, p=1.0).apply(audio, 16000, np.random.default_rng(0))
    assert len(slow) > len(audio) * 1.5
    assert len(fast) < len(audio) * 0.7


def test_transform_probability_gate():
    from whisper_finetune_tpu.data.augment import Gain

    audio = np.ones(1000, dtype=np.float32)
    never = Gain(min_gain_db=6, max_gain_db=6, p=0.0)
    np.testing.assert_array_equal(never(audio, 16000, np.random.default_rng(0)), audio)
    always = Gain(min_gain_db=6, max_gain_db=6, p=1.0)
    out = always(audio, 16000, np.random.default_rng(0))
    assert np.allclose(out, audio * 10 ** (6 / 20), atol=1e-5)


def test_bitcrush_quantizes():
    from whisper_finetune_tpu.data.augment import BitCrush

    audio = np.linspace(-1, 1, 1000).astype(np.float32)
    out = BitCrush(6, 6, p=1.0).apply(audio, 16000, np.random.default_rng(0))
    assert len(np.unique(out)) <= 2**6 + 1
