from whisper_finetune_tpu.ops.attention import attention, flash_mha, xla_mha
from whisper_finetune_tpu.ops.mel import (
    CHUNK_LENGTH,
    FRAMES_PER_SECOND,
    HOP_LENGTH,
    N_FFT,
    N_FRAMES,
    N_SAMPLES,
    SAMPLE_RATE,
    log_mel_spectrogram,
    mel_filterbank,
)
from whisper_finetune_tpu.ops.spec_augment import (
    FeaturizeConfig,
    crop_and_min_pad,
    extremes_freq_mask,
    featurize_batch,
    time_and_freq_mask,
    time_warp,
)

__all__ = [
    "CHUNK_LENGTH",
    "FRAMES_PER_SECOND",
    "FeaturizeConfig",
    "HOP_LENGTH",
    "N_FFT",
    "N_FRAMES",
    "N_SAMPLES",
    "SAMPLE_RATE",
    "attention",
    "crop_and_min_pad",
    "extremes_freq_mask",
    "featurize_batch",
    "flash_mha",
    "log_mel_spectrogram",
    "mel_filterbank",
    "time_and_freq_mask",
    "time_warp",
    "xla_mha",
]
