"""Typed validation layer over the YAML run-config schema.

The reference reads raw YAML and sprinkles ``.get()`` defaults at call sites
(configs/example_config.yaml documents the schema; there is no validation
layer). We keep the identical YAML schema — configs written for the reference
run unmodified here — but normalize it once, up front, into a plain dict with
every default resolved, and warn on unknown keys so typos surface early.
"""

from __future__ import annotations

import copy
import warnings
from typing import Any, Dict, Optional

_KNOWN_SECTIONS = {
    "model",
    "dataset",
    "lr_scheduler",
    "optimizer",
    "training",
    "augmentation",
    "wandb",
    "seed",
    "save_dir",
    "path_to_config",
    "ddp",  # documentation-only block in reference configs; accepted, unused
}

_MODEL_KEYS = {
    "init_name",
    "bfloat16",
    "lora",
    "lora_config",
    "base_init_name",
    "encoder_layers",
    "encoder_layer",
    "decoder_layers",
    "decoder_layer",
    "deocer_layer",  # typo accepted by the reference (finetune.py:70)
    "checkpoint_path",
}

_DATASET_DEFAULTS: Dict[str, Any] = {
    "train_datasets": [],
    "select_n_per_t_ds": [],
    "groupby_col": [],
    "select_language_tag": None,
    "warmup_dataset_idx": None,
    "val_datasets": [],
    "val_dataset_names": None,
    "select_n_per_v_ds": [],
    "train_split_name": "train",
    "valid_split_name": "validation",
    "no_timestamp_training": False,
    "max_prompt_length": 223,
    "prompt_use_rate": 0.5,
    "no_timestamp_rate": 0.5,
    "batch_size": 1,
    "batch_size_eval": 1,
    "train_num_workers": None,
    "eval_num_workers": 0,
    "drop_last": True,
    # Extension: pad decoder tokens to the smallest of these bucket lengths
    # instead of the fixed 448 context (bounded recompilation, less decoder
    # compute on short transcripts). None = fixed 448.
    "decoder_pad_buckets": None,
}

_TRAINING_DEFAULTS: Dict[str, Any] = {
    "accum_grad_steps": 1,
    "label_smoothing": 0.0,
    "train_only_decoder": False,
    "train_only_encoder": False,
    "max_grad_norm": 1.0,
    "stochastic_depth": 0.0,
    "epochs": 1,
    "eval_steps": 0.25,
    "save_all_checkpoints": False,
    "upload_models_to_wandb": False,
    "max_train_loss": 25.0,
    "mixed_precision_training": True,
    "mp_dtype": "bf16",
    "gradient_checkpointing_encoder": True,
    "gradient_checkpointing_encoder_last_only": False,
    "gradient_checkpointing_decoder": True,
    "ddp_find_unused_parameters": None,
    # Extensions beyond the reference (which cannot resume): restore/save the
    # full TrainState (params + optimizer + step) via orbax.
    "resume_from": None,
    "save_train_state": False,
    # Extension: ZeRO-1 — shard optimizer state over the data axis (fits
    # full large-v3 fine-tuning on a v5e-8 pod slice).
    "zero_shard_optimizer": False,
    # Extension: reduced-precision gradient accumulator ("bfloat16" halves
    # the full-gradient HBM tree; None keeps fp32).
    "grad_accum_dtype": None,
    # Extension: compile the optimizer update as its own program instead of
    # fusing it into the accumulation step. "auto" enables it for Muon
    # (whose per-leaf fp32 Newton-Schulz temps otherwise coexist with the
    # fwd/bwd workspace — the single-chip large-v3 OOM); true/false force.
    "split_optimizer_step": "auto",
    # Extension: hand-written gradient-accumulating backward
    # (train/manual_grad.py) — merges the per-microbatch cotangent tree and
    # the gradient accumulator into one donated buffer, the memory shape
    # that fits full-model split-update training with real accum_grad_steps
    # on a 16 GB chip. "auto" enables it when split_optimizer_step is
    # active and the whole tree trains (no LoRA / train_only_*).
    "manual_backward": "auto",
    # Extension: under manual_backward, cast each block stack to the
    # compute dtype once per microbatch (a resident bf16 shadow; faster
    # weight streaming) instead of the default per-layer barriered slice
    # cast (the tightest memory shape). Enable only with HBM headroom.
    "manual_precast_weights": False,
    # Extension: rematerialization policy inside checkpointed blocks
    # (models/whisper.py _remat): "full" (recompute everything), "dots",
    # "attn", "save:<names>", "offload:<names>" (pinned-host DMA instead
    # of HBM/recompute), or '+'-separated save/offload mixes.
    "remat_policy": "full",
    # Extension: attention implementation. "auto" (default) picks the
    # measured-fastest per-site mix for the platform (splash Pallas kernels
    # for encoder self-attention on TPU, XLA everywhere else and off-TPU);
    # explicit values: "xla", "flash", "splash", "flash_fwd".
    "attn_impl": "auto",
    # Extension: per-program XLA compile options for the train-step
    # programs (jit(compiler_options=...) — the only channel that reaches
    # the axon remote compiler). E.g. {xla_tpu_scoped_vmem_limit_kib:
    # 32768} is a measured ~1-4% win on the primary large-v3 batch-8 step
    # (docs/perf_round5.md). None = compiler defaults; the
    # WFT_COMPILER_OPTIONS env JSON overrides this key.
    "compiler_options": None,
}

_AUG_DEFAULTS: Dict[str, Any] = {
    "spec_augment": {
        "apply": False,
        "time_mask_param": 100,
        "freq_mask_param": 43,
        "time_warp_w": 80,
        "p": 1.0,
    },
    "deep_spec_augment": {
        "apply": False,
        "time_mask_param": 100,
        "freq_mask_param": 27,
        "p": 1.0,
        "layer_indices": None,
    },
    "bpe_dropout": 0.0,
    "extremes_spec_augment": {
        "apply": False,
        "low_freq_range": 10,
        "high_freq_range": 20,
    },
    "audio_augment": {
        "apply_baseline_aug": False,
        "apply_office_aug": False,
        "apply_advanced_aug": False,
        "time_stretch": {"min_rate": 0.8, "max_rate": 1.25},
    },
}

_OPTIMIZER_DEFAULTS: Dict[str, Any] = {
    "type": "adamw",
    "8bit": False,
    "muon": None,
    "muon_ndim_threshold": 2,
    "muon_params": {},
    "muon_match_adamw_update_rms": True,
    "muon_match_factor": 0.2,
    # Extension: store Muon momentum in this dtype ("bfloat16" halves it,
    # "int8" stores it blockwise-quantized at ~1 byte/param; None keeps
    # fp32). State size decides whether full large-v3 Muon fits 16GB.
    "muon_momentum_dtype": None,
    # Extension: Newton-Schulz iteration count and coefficient schedule
    # ("classic" repeats the public Muon quintic; "polar_express" walks the
    # per-iteration minimax schedule — lower orthogonality error per
    # matmul, see optim/muon.py).
    "muon_ns_steps": 5,
    "muon_ns_coeffs": "classic",
    # Extension: blockwise 8-bit state for the auxiliary AdamW leaves.
    "muon_aux_8bit": False,
    # Extension: bound (MB) on the fp32 working set of one Muon leaf update;
    # stacked leaves past it are processed as a lax.scan over layer-axis
    # slices (optim/muon.py chunk_temp_mb). null disables chunking.
    "muon_chunk_temp_mb": 128.0,
    "params": {},
}

_SCHEDULER_DEFAULTS: Dict[str, Any] = {
    "type": "linear",
    "warmup_steps": 0,
    "lr_num_cycles": 1,
    "lr_gamma": 1.0,
    "chill_steps": 100,
    "chill_range": 0.02,
}


def _merge_defaults(section: Optional[Dict[str, Any]], defaults: Dict[str, Any]) -> Dict[str, Any]:
    out = copy.deepcopy(defaults)
    if not section:
        return out
    for key, value in section.items():
        if isinstance(value, dict) and isinstance(out.get(key), dict):
            merged = copy.deepcopy(out[key])
            merged.update(value)
            out[key] = merged
        else:
            out[key] = value
    return out


def validate_config(config: Dict[str, Any]) -> Dict[str, Any]:
    """Normalize a raw YAML dict: fill defaults, check types, warn on typos.

    Returns a new dict; the input is not mutated.
    """
    if not isinstance(config, dict):
        raise TypeError(f"Config must be a mapping, got {type(config).__name__}")

    unknown = set(config) - _KNOWN_SECTIONS
    if unknown:
        warnings.warn(f"Unknown top-level config sections ignored: {sorted(unknown)}")

    out: Dict[str, Any] = {}

    model = dict(config.get("model") or {})
    if "init_name" not in model:
        raise ValueError("config.model.init_name is required")
    unknown_model = set(model) - _MODEL_KEYS
    if unknown_model:
        warnings.warn(f"Unknown model config keys ignored: {sorted(unknown_model)}")
    model.setdefault("bfloat16", False)
    model.setdefault("lora", False)
    model.setdefault("lora_config", {})
    out["model"] = model

    out["dataset"] = _merge_defaults(config.get("dataset"), _DATASET_DEFAULTS)
    out["training"] = _merge_defaults(config.get("training"), _TRAINING_DEFAULTS)
    out["augmentation"] = _merge_defaults(config.get("augmentation"), _AUG_DEFAULTS)
    out["optimizer"] = _merge_defaults(config.get("optimizer"), _OPTIMIZER_DEFAULTS)
    out["lr_scheduler"] = _merge_defaults(config.get("lr_scheduler"), _SCHEDULER_DEFAULTS)

    ds = out["dataset"]
    for rate_key in ("prompt_use_rate", "no_timestamp_rate"):
        rate = float(ds[rate_key])
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"dataset.{rate_key} must be in [0, 1], got {rate}")
    if int(ds["batch_size"]) < 1 or int(ds["batch_size_eval"]) < 1:
        raise ValueError("dataset.batch_size/batch_size_eval must be >= 1")

    tr = out["training"]
    if int(tr["accum_grad_steps"]) < 1:
        raise ValueError("training.accum_grad_steps must be >= 1")
    if not 0.0 <= float(tr["stochastic_depth"]) < 1.0:
        raise ValueError("training.stochastic_depth must be in [0, 1)")
    if tr["mp_dtype"] not in ("fp16", "bf16", "bfloat16", "fp32"):
        raise ValueError(f"training.mp_dtype must be fp16/bf16/fp32, got {tr['mp_dtype']}")
    if tr["gradient_checkpointing_encoder"] and tr["gradient_checkpointing_encoder_last_only"]:
        raise ValueError(
            "gradient_checkpointing_encoder_last_only is not supported when "
            "gradient_checkpointing_encoder is enabled"
        )

    if tr["split_optimizer_step"] not in ("auto", True, False):
        raise ValueError(
            "training.split_optimizer_step must be 'auto', true, or false, "
            f"got {tr['split_optimizer_step']!r}"
        )
    if tr["manual_backward"] not in ("auto", True, False):
        raise ValueError(
            "training.manual_backward must be 'auto', true, or false, "
            f"got {tr['manual_backward']!r}"
        )
    if tr["compiler_options"] is not None and not isinstance(
        tr["compiler_options"], dict
    ):
        raise ValueError(
            "training.compiler_options must be a mapping of XLA option "
            f"name -> value, got {type(tr['compiler_options']).__name__}"
        )

    opt = out["optimizer"]
    if int(opt["muon_ns_steps"]) < 1:
        raise ValueError(
            f"optimizer.muon_ns_steps must be >= 1, got {opt['muon_ns_steps']}"
        )
    if opt["muon_ns_coeffs"] not in ("classic", "polar_express"):
        raise ValueError(
            "optimizer.muon_ns_coeffs must be 'classic' or 'polar_express', "
            f"got {opt['muon_ns_coeffs']!r}"
        )

    aug = out["augmentation"]
    for section_name in ("spec_augment", "deep_spec_augment"):
        p = float(aug[section_name].get("p", 1.0))
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"augmentation.{section_name}.p must be in [0, 1], got {p}")
    if not 0.0 <= float(aug["bpe_dropout"]) < 1.0:
        raise ValueError("augmentation.bpe_dropout must be in [0, 1)")

    out["wandb"] = dict(config.get("wandb") or {})
    out["seed"] = int(config.get("seed", 0))
    out["save_dir"] = config.get("save_dir", "output")
    if "path_to_config" in config:
        out["path_to_config"] = config["path_to_config"]
    return out
