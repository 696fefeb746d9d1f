"""Step math, accumulation mapping, and config validation tests.

Mirrors the numeric coverage of reference tests/test_training_utils.py:102-170
(train/val step math incl. world size and drop_last) and adds coverage for our
typed validation layer (which the reference lacks).
"""

import pytest

from whisper_finetune_tpu.config import validate_config
from whisper_finetune_tpu.utils import (
    calculate_training_steps,
    calculate_val_steps,
    resolve_local_accum_grad_steps,
)


def _cfg(batch_size=4, epochs=2, accum=2):
    return {
        "dataset": {"batch_size": batch_size},
        "training": {"epochs": epochs, "accum_grad_steps": accum},
    }


class TestTrainingSteps:
    def test_basic_drop_last(self):
        # 100 samples, bs 4 -> 25 microbatches/epoch, 2 epochs, accum 2 -> 25
        assert calculate_training_steps(_cfg(), 100) == 25

    def test_drop_last_discards_partial_microbatch(self):
        # 103 samples -> still 25 microbatches per epoch
        assert calculate_training_steps(_cfg(), 103) == 25

    def test_no_drop_last_ceils(self):
        # ceil(103*2/(4*1*2)) = ceil(25.75) = 26
        assert calculate_training_steps(_cfg(), 103, drop_last=False) == 26

    def test_world_size_shards_samples(self):
        # 100 samples over 4 ranks -> 25/rank -> 6 microbatches -> floor(12/2)=6
        assert calculate_training_steps(_cfg(), 100, world_size=4) == 6

    def test_fractional_epochs(self):
        cfg = _cfg(epochs=0.5, accum=1)
        # 100 samples, bs 4 -> 25 mb/epoch * 0.5 = 12.5 -> floor = 12
        assert calculate_training_steps(cfg, 100) == 12

    def test_minimum_one_step(self):
        assert calculate_training_steps(_cfg(), 2) == 1


class TestLocalAccum:
    def test_divides_evenly(self):
        assert resolve_local_accum_grad_steps(8, 4) == 2
        assert resolve_local_accum_grad_steps(8, 1) == 8

    def test_rejects_non_divisible(self):
        with pytest.raises(ValueError):
            resolve_local_accum_grad_steps(6, 4)

    def test_rejects_zero(self):
        with pytest.raises(ValueError):
            resolve_local_accum_grad_steps(0, 1)


class TestValSteps:
    def test_fraction_of_epoch(self):
        cfg = {"training": {"train_steps": 100, "epochs": 2, "eval_steps": 0.1}}
        assert calculate_val_steps(cfg) == 5

    def test_minimum_one(self):
        cfg = {"training": {"train_steps": 1, "epochs": 1, "eval_steps": 0.01}}
        assert calculate_val_steps(cfg) == 1


class TestValidateConfig:
    def _minimal(self):
        return {"model": {"init_name": "tiny"}}

    def test_defaults_filled(self):
        cfg = validate_config(self._minimal())
        assert cfg["training"]["label_smoothing"] == 0.0
        assert cfg["dataset"]["max_prompt_length"] == 223
        assert cfg["augmentation"]["spec_augment"]["apply"] is False
        assert cfg["optimizer"]["type"] == "adamw"

    def test_requires_init_name(self):
        with pytest.raises(ValueError):
            validate_config({"model": {}})

    def test_rejects_bad_rates(self):
        bad = self._minimal()
        bad["dataset"] = {"prompt_use_rate": 1.5}
        with pytest.raises(ValueError):
            validate_config(bad)

    def test_rejects_encoder_last_only_conflict(self):
        bad = self._minimal()
        bad["training"] = {
            "gradient_checkpointing_encoder": True,
            "gradient_checkpointing_encoder_last_only": True,
        }
        with pytest.raises(ValueError):
            validate_config(bad)

    def test_warns_on_unknown_section(self):
        cfg = self._minimal()
        cfg["trainign"] = {}
        with pytest.warns(UserWarning):
            validate_config(cfg)

    def test_nested_merge_preserves_user_values(self):
        cfg = self._minimal()
        cfg["augmentation"] = {"spec_augment": {"apply": True, "time_mask_param": 50}}
        out = validate_config(cfg)
        assert out["augmentation"]["spec_augment"]["apply"] is True
        assert out["augmentation"]["spec_augment"]["time_mask_param"] == 50
        assert out["augmentation"]["spec_augment"]["freq_mask_param"] == 43

    def test_input_not_mutated(self):
        cfg = self._minimal()
        validate_config(cfg)
        assert cfg == {"model": {"init_name": "tiny"}}
