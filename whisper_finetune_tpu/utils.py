"""Shared utilities: config IO, step math, seeding.

Capability parity with the reference's ``src/whisper_finetune/utils.py``
(step math at utils.py:14-53, config read at :56-59, seeding at :62-66),
re-expressed for a JAX stack: seeding hands out a root ``jax.random`` key and
seeds the host-side numpy/python RNGs used by the data pipeline.
"""

from __future__ import annotations

import math
import os
import random
from datetime import datetime
from typing import Any, Dict

import numpy as np
import yaml


def calculate_training_steps(
    config: Dict[str, Any],
    num_samples: int,
    world_size: int = 1,
    drop_last: bool = True,
) -> int:
    """Number of optimizer steps for a run.

    Semantics match the reference (utils.py:14-31): with ``drop_last`` each
    rank sees ``samples // world_size`` samples, full microbatches only, and
    the optimizer steps once per ``accum_grad_steps`` microbatches (floor,
    minimum 1). Without ``drop_last`` it is a global ceiling division.

    Note: ``accum_grad_steps`` here is the *local* (per-process) accumulation
    count, i.e. the value after :func:`resolve_local_accum_grad_steps`.
    """
    epochs = config["training"]["epochs"]
    batch_size = config["dataset"]["batch_size"]
    accum_grad_steps = config["training"]["accum_grad_steps"]
    world_size = max(int(world_size), 1)

    if drop_last:
        samples_per_rank = num_samples // world_size
        microbatches_per_epoch = samples_per_rank // batch_size
        steps = math.floor((microbatches_per_epoch * epochs) / accum_grad_steps)
        return max(steps, 1)

    return math.ceil(num_samples * epochs / (batch_size * world_size * accum_grad_steps))


def resolve_local_accum_grad_steps(accum_grad_steps: int, world_size: int = 1) -> int:
    """Map the configured *global* accumulation window to per-process local
    accumulation (reference utils.py:34-48): the global window must divide
    evenly by the number of data-parallel processes."""
    accum_grad_steps = int(accum_grad_steps)
    world_size = max(int(world_size), 1)

    if accum_grad_steps < 1:
        raise ValueError(f"accum_grad_steps must be >= 1, got {accum_grad_steps}.")

    if accum_grad_steps % world_size != 0:
        raise ValueError(
            "training.accum_grad_steps is interpreted as the global accumulation "
            "window and must be divisible by the data-parallel world size. Got "
            f"accum_grad_steps={accum_grad_steps} and world_size={world_size}."
        )

    return accum_grad_steps // world_size


def calculate_val_steps(config: Dict[str, Any]) -> int:
    """Steps between validation runs (reference utils.py:51-53)."""
    val_steps = (
        config["training"]["train_steps"] / config["training"]["epochs"]
    ) * config["training"]["eval_steps"]
    return max(int(val_steps), 1)


def read_config(yaml_file_path: str) -> Dict[str, Any]:
    """Load a YAML run config (same schema as the reference's configs/)."""
    print(f"Reading config {yaml_file_path}")
    with open(yaml_file_path, "r") as file:
        return yaml.safe_load(file)


def apply_platform_env() -> None:
    """Make ``JAX_PLATFORMS`` authoritative for CLI entry points.

    Plugin backends can register themselves ahead of the env selection (the
    axon TPU plugin does — see tests/conftest.py), so ``JAX_PLATFORMS=cpu``
    alone does not keep a subprocess off the TPU. Re-applying the env value
    through ``jax.config`` pins the platform choice, which keeps CPU-only
    runs (tests, docs/wer_parity.md rehearsals, machines where the chip is
    busy or unreachable) from blocking on TPU backend initialization."""
    platforms = os.environ.get("JAX_PLATFORMS")
    if platforms:
        import jax

        jax.config.update("jax_platforms", platforms)


def set_seed(seed: int) -> "np.random.Generator":
    """Seed the host-side RNGs used by the data pipeline.

    Device-side randomness is handled by explicit jax.random keys (see
    whisper_finetune_tpu.train.step); this only covers python/numpy, which
    drive dataset sampling and host-side augmentation. Returns a dedicated
    numpy Generator for callers that prefer explicit RNG objects.
    """
    random.seed(seed)
    np.random.seed(seed)
    return np.random.default_rng(seed)


def get_unique_base_path() -> str:
    """Run directory leaf name: scheduler job id if present, else timestamp
    (reference utils.py:87-88)."""
    return os.getenv("SLURM_JOB_ID", datetime.now().strftime("%Y%m%d_%H%M%S"))


def count_parameters(params) -> int:
    """Total number of scalars in a parameter pytree."""
    import jax

    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def print_trainable_parameters(params, trainable_mask=None) -> None:
    """Report trainable vs total parameter counts (reference utils.py:128-135).

    ``trainable_mask`` is a pytree of booleans congruent with ``params``; when
    None, everything counts as trainable.
    """
    import jax

    total = count_parameters(params)
    if trainable_mask is None:
        trainable = total
    else:
        leaves = zip(
            jax.tree_util.tree_leaves(params),
            jax.tree_util.tree_leaves(trainable_mask),
        )
        trainable = sum(int(np.prod(p.shape)) for p, m in leaves if m)
    print(f"Number of trainable parameters: {trainable:,} out of total {total:,}.")
