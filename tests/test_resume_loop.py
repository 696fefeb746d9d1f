"""Resuming runs only the REMAINING steps on the global step clock.

Round-1 advisor finding: main_loop always iterated 1..train_steps regardless
of the restored state.step, so a resumed run trained train_steps extra steps
(at LR 0 past the schedule horizon) and renumbered checkpoints from 1. These
tests drive main_loop directly with a counting step_fn.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_finetune_tpu.models import ModelDimensions, init_params
from whisper_finetune_tpu.parallel.mesh import get_data_mesh
from whisper_finetune_tpu.scripts.finetune import main_loop
from whisper_finetune_tpu.train.step import TrainState, partition_params

DIMS = ModelDimensions(
    n_mels=8, n_audio_ctx=16, n_audio_state=16, n_audio_head=2, n_audio_layer=1,
    n_vocab=32, n_text_ctx=8, n_text_head=2, n_text_state=16, n_text_layer=1,
)


def _make_state(step: int) -> TrainState:
    params = init_params(jax.random.PRNGKey(0), DIMS)
    trainable, frozen = partition_params(params, None)
    return TrainState(trainable, frozen, (), jnp.asarray(step, jnp.int32))


def _infinite_stream():
    while True:
        yield {"x": np.zeros((8, 1), np.float32)}


def _run(start_step: int, train_steps: int, tmp_path):
    executed = []

    def step_fn(state, batch, rng):
        executed.append(int(jax.device_get(state.step)) + 1)
        return state._replace(step=state.step + 1), jnp.asarray(1.0)

    t_config = {
        "train_steps": train_steps,
        "val_steps": max(train_steps, 1),
        "max_train_loss": 25.0,
        "save_all_checkpoints": False,
        "upload_models_to_wandb": False,
    }
    main_loop(
        state=_make_state(start_step),
        step_fn=step_fn,
        mesh=get_data_mesh(),
        train_stream=_infinite_stream(),
        accum_local=1,
        dev_loaders={},
        eval_step=None,
        dims=DIMS,
        save_dir=str(tmp_path),
        t_config=t_config,
        group_metadata=[{"base_lr": 1e-3}],
        schedule=None,
        tokenizer=None,
        base_rng=jax.random.PRNGKey(0),
    )
    return executed


def test_fresh_run_executes_all_steps(tmp_path):
    assert _run(0, 4, tmp_path) == [1, 2, 3, 4]


def test_resumed_run_executes_remainder_only(tmp_path):
    assert _run(2, 4, tmp_path) == [3, 4]


def test_resumed_past_horizon_trains_zero_steps(tmp_path):
    assert _run(4, 4, tmp_path) == []
