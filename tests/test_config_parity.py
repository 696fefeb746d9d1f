"""Schema parity: every YAML shipped with the reference (top-level and
experiments) must pass our typed validation unmodified — the north-star
config-compatibility requirement — and so must our own configs."""

import glob
import os

import pytest
import yaml

from whisper_finetune_tpu.config import validate_config

REFERENCE_CONFIG_DIR = "/root/reference/configs"
OUR_CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def _yaml_files(root):
    return sorted(
        glob.glob(os.path.join(root, "*.yaml"))
        + glob.glob(os.path.join(root, "experiments", "*.yaml"))
    )


@pytest.mark.parametrize(
    "path",
    _yaml_files(REFERENCE_CONFIG_DIR) if os.path.isdir(REFERENCE_CONFIG_DIR) else [],
    ids=lambda p: os.path.relpath(p, REFERENCE_CONFIG_DIR),
)
def test_reference_config_validates(path):
    with open(path) as f:
        raw = yaml.safe_load(f)
    cfg = validate_config(raw)
    assert cfg["model"]["init_name"]
    assert cfg["dataset"]["batch_size"] >= 1
    assert cfg["training"]["accum_grad_steps"] >= 1


@pytest.mark.parametrize(
    "path", _yaml_files(OUR_CONFIG_DIR), ids=os.path.basename
)
def test_our_config_validates(path):
    with open(path) as f:
        raw = yaml.safe_load(f)
    cfg = validate_config(raw)
    assert cfg["model"]["init_name"]
