"""Driver-level unit tests: LR telemetry dict shape (reference
_build_lr_log_dict, finetune.py:232-307), trainable-mask composition,
forward/featurize config construction, and LoRA hyperparameter key
spellings."""

import jax
import jax.numpy as jnp
import pytest

from whisper_finetune_tpu.config import validate_config
from whisper_finetune_tpu.models import ModelDimensions, init_params
from whisper_finetune_tpu.scripts.finetune import (
    _build_lr_log_dict,
    _lora_hparams,
    build_audio_augment,
    build_featurize_config,
    build_forward_config,
    build_trainable_mask,
)

DIMS = ModelDimensions(
    n_mels=8, n_audio_ctx=16, n_audio_state=16, n_audio_head=2, n_audio_layer=1,
    n_vocab=32, n_text_ctx=8, n_text_head=2, n_text_state=16, n_text_layer=1,
)


def _config(**training):
    cfg = {"model": {"init_name": "tiny"}, "training": training}
    return validate_config(cfg)


def test_lr_log_dict_single_group():
    d = _build_lr_log_dict([{"lr_log_label": "adamw", "base_lr": 1e-3,
                             "base_lr_unscaled": 1e-3}], 0.5, 2.0)
    assert d == {"Train loss": 2.0, "Learning rate": 5e-4}


def test_lr_log_dict_muon_groups():
    meta = [
        {"lr_log_label": "muon", "base_lr": 0.02 * 3.2, "base_lr_unscaled": 0.02},
        {"lr_log_label": "muon", "base_lr": 0.02 * 7.2, "base_lr_unscaled": 0.02},
        {"lr_log_label": "aux_adamw", "base_lr": 3e-4, "base_lr_unscaled": 3e-4},
    ]
    d = _build_lr_log_dict(meta, 0.5, 1.5)
    assert d["Learning rate/schedule_factor"] == 0.5
    assert d["Learning rate/muon"] == pytest.approx(0.02 * 0.5)
    assert d["Learning rate/aux_adamw"] == pytest.approx(3e-4 * 0.5)
    assert d["Learning rate"] == d["Learning rate/muon"]
    assert d["Learning rate/min"] == pytest.approx(3e-4 * 0.5)
    assert "Learning rate/muon_group_0" in d
    assert d["Learning rate/muon_actual_max"] == pytest.approx(0.02 * 7.2 * 0.5)


def test_build_trainable_mask_train_only():
    params = init_params(jax.random.PRNGKey(0), DIMS)
    cfg = _config(train_only_decoder=True)
    mask = build_trainable_mask(params, cfg["training"])
    assert not any(jax.tree_util.tree_leaves(mask["encoder"]))
    assert all(jax.tree_util.tree_leaves(mask["decoder"]))

    cfg2 = _config(train_only_encoder=True)
    mask2 = build_trainable_mask(params, cfg2["training"])
    assert all(jax.tree_util.tree_leaves(mask2["encoder"]))
    assert not any(jax.tree_util.tree_leaves(mask2["decoder"]))


def test_lora_hparams_accepts_both_spellings():
    assert _lora_hparams({"rank": 8, "lora_alpha": 16, "lora_dropout": 0.1}) == {
        "rank": 8, "alpha": 16.0, "dropout": 0.1,
    }
    assert _lora_hparams({"rank": 4, "alpha": 8, "dropout": 0.2}) == {
        "rank": 4, "alpha": 8.0, "dropout": 0.2,
    }
    assert _lora_hparams({}) == {"rank": 16, "alpha": 32.0, "dropout": 0.0}


def test_build_forward_config_mapping():
    cfg = validate_config({
        "model": {"init_name": "tiny", "lora": True,
                  "lora_config": {"rank": 8, "lora_alpha": 16}},
        "training": {"mp_dtype": "bf16", "stochastic_depth": 0.2,
                     "gradient_checkpointing_encoder": False,
                     "gradient_checkpointing_decoder": True},
        "augmentation": {"deep_spec_augment": {"apply": True, "layer_indices": [0, 1]}},
    })
    fcfg = build_forward_config(cfg, is_lora_run=True)
    assert fcfg.compute_dtype == "bfloat16"
    assert fcfg.remat_encoder is False and fcfg.remat_decoder is True
    assert fcfg.stochastic_depth == 0.2
    assert fcfg.dsa_apply and fcfg.dsa_layer_indices == (0, 1)
    assert fcfg.lora_scale == pytest.approx(16 / 8)

    # fp16 maps to bf16 on TPU; fp32 disables mixed precision
    cfg_fp16 = _config(mp_dtype="fp16")
    assert build_forward_config(cfg_fp16, False).compute_dtype == "bfloat16"
    cfg_fp32 = _config(mixed_precision_training=False)
    assert build_forward_config(cfg_fp32, False).compute_dtype == "float32"


def test_build_featurize_config():
    cfg = validate_config({
        "model": {"init_name": "tiny"},
        "augmentation": {
            "spec_augment": {"apply": True, "time_mask_param": 50,
                             "freq_mask_param": 20, "time_warp_w": 40, "p": 0.7},
            "extremes_spec_augment": {"apply": True, "low_freq_range": 3,
                                      "high_freq_range": 5},
        },
    })
    feat = build_featurize_config(cfg, n_mels=80)
    assert feat.n_mels == 80
    assert feat.spec_augment and feat.p == 0.7 and feat.time_warp_w == 40
    assert feat.extremes and feat.low_freq_range == 3


def test_build_audio_augment():
    cfg = validate_config({"model": {"init_name": "tiny"}})
    assert build_audio_augment(cfg) is None
    cfg2 = validate_config({
        "model": {"init_name": "tiny"},
        "augmentation": {"audio_augment": {"apply_baseline_aug": True,
                                           "time_stretch": {"min_rate": 0.9,
                                                            "max_rate": 1.1}}},
    })
    aug = build_audio_augment(cfg2)
    assert aug is not None and len(aug.transforms) == 1


def test_stochastic_depth_zeroed_on_frozen_side():
    cfg = _config(train_only_decoder=True, stochastic_depth=0.3)
    fcfg = build_forward_config(cfg, False)
    assert fcfg.sd_encoder == 0.0 and fcfg.sd_decoder == 0.3
    cfg2 = _config(train_only_encoder=True, stochastic_depth=0.3)
    fcfg2 = build_forward_config(cfg2, False)
    assert fcfg2.sd_encoder == 0.3 and fcfg2.sd_decoder == 0.0


def test_attn_impl_config_key():
    cfg = _config(attn_impl="flash")
    assert build_forward_config(cfg, False).attn_impl == "flash"
    # default is "auto": on the CPU test platform it resolves to plain xla
    # with no per-site overrides (splash needs a TPU)
    fcfg = build_forward_config(_config(), False)
    assert fcfg.attn_impl == "xla"
    assert fcfg.attn_impl_encoder is None
    assert fcfg.enc_attn == "xla" and fcfg.dec_attn == "xla"


def test_param_norms_by_module_skips_frozen():
    import jax
    import jax.numpy as jnp

    from whisper_finetune_tpu.scripts.finetune import _param_norms_by_module

    tree = {
        "encoder": {"conv1": {"w": jnp.ones((4,))}, "blocks": {"q_w": None}},
        "decoder": {"tok_emb": jnp.full((4,), 2.0)},
    }
    out = _param_norms_by_module(tree)
    assert set(out) == {"params/encoder.conv1", "params/decoder.tok_emb"}
    assert abs(out["params/encoder.conv1"] - 2.0) < 1e-6
    assert abs(out["params/decoder.tok_emb"] - 4.0) < 1e-6
