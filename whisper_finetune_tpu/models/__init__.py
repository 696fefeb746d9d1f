from whisper_finetune_tpu.models.dims import (
    MODEL_PRESETS,
    ModelDimensions,
    get_preset_dims,
)
from whisper_finetune_tpu.models.whisper import (
    ForwardConfig,
    decoder_forward,
    encoder_forward,
    forward,
    init_params,
    sinusoids,
)
from whisper_finetune_tpu.models.checkpoint import (
    load_checkpoint,
    load_model,
    params_to_state_dict,
    save_checkpoint,
    state_dict_to_params,
)
from whisper_finetune_tpu.models.surgery import (
    MODEL_LAYER_PRESETS,
    resize_whisper_layers,
    resolve_model_architecture,
)

__all__ = [
    "MODEL_PRESETS",
    "MODEL_LAYER_PRESETS",
    "ModelDimensions",
    "ForwardConfig",
    "get_preset_dims",
    "decoder_forward",
    "encoder_forward",
    "forward",
    "init_params",
    "sinusoids",
    "load_checkpoint",
    "load_model",
    "params_to_state_dict",
    "save_checkpoint",
    "state_dict_to_params",
    "resize_whisper_layers",
    "resolve_model_architecture",
]
