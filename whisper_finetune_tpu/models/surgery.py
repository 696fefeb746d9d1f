"""Model surgery: encoder/decoder depth resizing.

Capability parity with the reference's ``resize_whisper_layers``
(model_utils.py:138-207): deterministic proportional keep/duplicate of the
block list to hit a target depth, used by the ``whisper-4832`` /
``whisper-3248`` presets (finetune.py:51-54). Because layers are stacked on a
leading axis here, the whole operation is one gather per parameter leaf —
no deepcopy, no module rebuilding.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np

from whisper_finetune_tpu.models.dims import ModelDimensions
from whisper_finetune_tpu.models.whisper import Params

# Layer presets mirroring reference finetune.py:51-54.
MODEL_LAYER_PRESETS = {
    "whisper-4832": {"base_init_name": "large-v3", "encoder_layers": 48, "decoder_layers": 32},
    "whisper-3248": {"base_init_name": "large-v3", "encoder_layers": 32, "decoder_layers": 48},
}


def resample_indices(current_layers: int, target_layers: int) -> np.ndarray:
    """Source-layer index for each target layer under proportional
    keep/duplicate (reference ``_resample_block_list`` semantics:
    repeat(i) = floor((i+1)*T/C) - floor(i*T/C))."""
    if target_layers < 1:
        raise ValueError(f"target_layers must be >= 1, got {target_layers}")
    if current_layers < 1:
        raise ValueError("Cannot resize an empty block list")
    indices = []
    for i in range(current_layers):
        repeat = ((i + 1) * target_layers) // current_layers - (
            i * target_layers
        ) // current_layers
        indices.extend([i] * repeat)
    assert len(indices) == target_layers
    return np.asarray(indices, dtype=np.int32)


def resize_whisper_layers(
    params: Params,
    dims: ModelDimensions,
    target_encoder_layers: Optional[int] = None,
    target_decoder_layers: Optional[int] = None,
) -> Tuple[Params, ModelDimensions, bool]:
    """Resize depth before training. Returns (params, dims, changed)."""
    changed = False

    if (
        target_encoder_layers is not None
        and target_encoder_layers != dims.n_audio_layer
    ):
        idx = resample_indices(dims.n_audio_layer, target_encoder_layers)
        params = dict(params)
        params["encoder"] = dict(params["encoder"])
        params["encoder"]["blocks"] = jax.tree_util.tree_map(
            lambda a: a[idx], params["encoder"]["blocks"]
        )
        print(
            f"Resized encoder layers: {dims.n_audio_layer} -> {target_encoder_layers}"
        )
        dims = dims.replace(n_audio_layer=target_encoder_layers)
        changed = True

    if (
        target_decoder_layers is not None
        and target_decoder_layers != dims.n_text_layer
    ):
        idx = resample_indices(dims.n_text_layer, target_decoder_layers)
        params = dict(params)
        params["decoder"] = dict(params["decoder"])
        params["decoder"]["blocks"] = jax.tree_util.tree_map(
            lambda a: a[idx], params["decoder"]["blocks"]
        )
        print(
            f"Resized decoder layers: {dims.n_text_layer} -> {target_decoder_layers}"
        )
        dims = dims.replace(n_text_layer=target_decoder_layers)
        changed = True

    return params, dims, changed


def default_alignment_heads(n_text_layer: int, n_text_head: int) -> np.ndarray:
    """Default word-alignment head mask after a decoder resize: all heads in
    the upper half of the decoder (reference ``_reset_default_alignment_heads``,
    model_utils.py:171-174). Alignment heads are an inference-time artifact
    (word timestamps) and are not stored in checkpoints — this helper exists
    for downstream consumers of resized models."""
    heads = np.zeros((n_text_layer, n_text_head), dtype=bool)
    heads[n_text_layer // 2 :] = True
    return heads


def resolve_model_architecture(model_config: dict) -> dict:
    """Resolve init/base names and optional layer targets from the ``model``
    config section (reference ``_resolve_model_architecture``,
    finetune.py:64-95, including the accepted ``deocer_layer`` typo key)."""
    init_name = model_config["init_name"]
    preset = MODEL_LAYER_PRESETS.get(init_name)
    if preset is not None:
        base_init_name = preset["base_init_name"]
        encoder_layers = preset["encoder_layers"]
        decoder_layers = preset["decoder_layers"]
    else:
        base_init_name = model_config.get("base_init_name", init_name)
        encoder_layers = model_config.get(
            "encoder_layers", model_config.get("encoder_layer")
        )
        decoder_layers = model_config.get(
            "decoder_layers",
            model_config.get("decoder_layer", model_config.get("deocer_layer")),
        )
    return {
        "init_name": init_name,
        "base_init_name": base_init_name,
        "encoder_layers": encoder_layers,
        "decoder_layers": decoder_layers,
    }
