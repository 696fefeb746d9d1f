from whisper_finetune_tpu.optim.muon import (
    muon_shape_scale,
    newton_schulz_orthogonalize,
    rms_match_scale,
    scale_by_muon,
)
from whisper_finetune_tpu.optim.optimizers import get_optimizer, muon_param_labels
from whisper_finetune_tpu.optim.schedulers import get_schedule

__all__ = [
    "get_optimizer",
    "get_schedule",
    "muon_param_labels",
    "muon_shape_scale",
    "newton_schulz_orthogonalize",
    "rms_match_scale",
    "scale_by_muon",
]
