"""Full training-state checkpointing (resume support).

The reference has write-only model checkpointing and cannot resume a run
(SURVEY.md section 5: optimizer/scheduler state is never saved). This module
is the TPU framework's extension beyond parity: the entire
:class:`~whisper_finetune_tpu.train.step.TrainState` (trainable + frozen
params, optimizer state, step counter) round-trips through an
orbax-checkpoint directory, so a preempted TPU job continues exactly where
it stopped. Enabled via the config keys

    training:
      resume_from: <path to a previously written train_state dir>   # restore
      save_train_state: true    # write train_state alongside best/step ckpts

None leaves (the frozen/trainable complement trees) are encoded as sentinel
strings because orbax stores pytrees of arrays.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from whisper_finetune_tpu.train.step import TrainState

_NONE = "__none__"


def _encode(tree: Any) -> Any:
    return jax.tree_util.tree_map(
        lambda x: _NONE if x is None else np.asarray(x),
        tree,
        is_leaf=lambda x: x is None,
    )


def _decode(tree: Any) -> Any:
    return jax.tree_util.tree_map(
        lambda x: None if (isinstance(x, (str, np.str_)) and str(x) == _NONE) else jnp.asarray(x),
        tree,
        is_leaf=lambda x: x is None or isinstance(x, (str, np.str_)),
    )


def save_train_state(path: str, state: TrainState) -> None:
    """Write the full state (atomic directory swap handled by orbax)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    payload = {
        "trainable": _encode(jax.device_get(state.trainable)),
        "frozen": _encode(jax.device_get(state.frozen)),
        "opt_state": _encode(jax.device_get(state.opt_state)),
        "step": np.asarray(state.step),
    }
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)


def load_train_state(path: str, template: TrainState) -> TrainState:
    """Restore into the structure of ``template`` (which supplies the
    optimizer-state pytree layout and None placement)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    template_payload = {
        "trainable": _encode(jax.device_get(template.trainable)),
        "frozen": _encode(jax.device_get(template.frozen)),
        "opt_state": _encode(jax.device_get(template.opt_state)),
        "step": np.asarray(template.step),
    }
    with ocp.PyTreeCheckpointer() as ckptr:
        payload = ckptr.restore(path, item=template_payload)
    return TrainState(
        trainable=_decode(payload["trainable"]),
        frozen=_decode(payload["frozen"]),
        opt_state=_decode(payload["opt_state"]),
        step=jnp.asarray(payload["step"]),
    )
