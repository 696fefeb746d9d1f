"""Train-state save/resume roundtrip (the framework's extension over the
reference's write-only checkpointing)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from whisper_finetune_tpu.models import ModelDimensions, init_params
from whisper_finetune_tpu.train.state_io import load_train_state, save_train_state
from whisper_finetune_tpu.train.step import TrainState, partition_params

DIMS = ModelDimensions(
    n_mels=8, n_audio_ctx=16, n_audio_state=16, n_audio_head=2, n_audio_layer=1,
    n_vocab=32, n_text_ctx=8, n_text_head=2, n_text_state=16, n_text_layer=1,
)


def test_train_state_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    params = init_params(jax.random.PRNGKey(0), DIMS)
    mask = jax.tree_util.tree_map(lambda _: True, params)
    mask["decoder"]["tok_emb"] = False  # exercise None leaves in both trees
    trainable, frozen = partition_params(params, mask)
    tx = optax.adamw(1e-3)
    state = TrainState(trainable, frozen, tx.init(trainable), jnp.asarray(7, jnp.int32))

    path = str(tmp_path / "train_state")
    save_train_state(path, state)

    # fresh template with different values but the same structure
    params2 = init_params(jax.random.PRNGKey(99), DIMS)
    t2, f2 = partition_params(params2, mask)
    template = TrainState(t2, f2, tx.init(t2), jnp.zeros((), jnp.int32))
    restored = load_train_state(path, template)

    assert int(restored.step) == 7
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.trainable),
        jax.tree_util.tree_leaves(state.trainable),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.opt_state),
        jax.tree_util.tree_leaves(state.opt_state),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # frozen tree preserved, None placement intact
    assert restored.trainable["decoder"]["tok_emb"] is None
    np.testing.assert_array_equal(
        np.asarray(restored.frozen["decoder"]["tok_emb"]),
        np.asarray(state.frozen["decoder"]["tok_emb"]),
    )
