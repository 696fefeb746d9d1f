"""LoRA tests mirroring the reference's coverage themes
(tests/test_lora.py there: shapes, zero-init transparency, merge/remove
equivalence, trainable accounting, rank scaling, debug stats) on the stacked
JAX pytree design."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from whisper_finetune_tpu.models import ForwardConfig, ModelDimensions, init_params
from whisper_finetune_tpu.models.lora import (
    LoRAUpdateTracker,
    apply_lora,
    get_lora_grad_stats,
    get_lora_param_stats,
    has_lora,
    lora_scale,
    merge_lora,
    remove_lora,
)
from whisper_finetune_tpu.models.whisper import forward_impl

DIMS = ModelDimensions(
    n_mels=16,
    n_audio_ctx=32,
    n_audio_state=32,
    n_audio_head=2,
    n_audio_layer=2,
    n_vocab=64,
    n_text_ctx=16,
    n_text_head=2,
    n_text_state=32,
    n_text_layer=2,
)


@pytest.fixture()
def base_params():
    return init_params(jax.random.PRNGKey(0), DIMS)


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    mel = rng.standard_normal((1, DIMS.n_mels, DIMS.n_audio_ctx * 2)).astype(np.float32)
    toks = rng.integers(0, DIMS.n_vocab, (1, 8)).astype(np.int32)
    return jnp.asarray(mel), jnp.asarray(toks)


def _fwd(params, scale=0.0):
    fcfg = ForwardConfig(compute_dtype="float32", lora_scale=scale)
    mel, toks = _inputs()
    return np.asarray(forward_impl(params, mel, toks, DIMS, fcfg))


def test_apply_lora_shapes_and_mask(base_params):
    params, mask = apply_lora(base_params, rank=4, alpha=8)
    assert has_lora(params)
    qa = params["encoder"]["blocks"]["attn"]["q_w_lora"]
    assert qa["a"].shape == (2, 32, 4)
    assert qa["b"].shape == (2, 4, 32)
    fc1 = params["decoder"]["blocks"]["mlp"]["fc1_w_lora"]
    assert fc1["a"].shape == (2, 32, 4) and fc1["b"].shape == (2, 4, 128)
    # cross-attn adapted only on decoder
    assert "cross_attn" not in params["encoder"]["blocks"]
    assert "q_w_lora" in params["decoder"]["blocks"]["cross_attn"]

    # mask: only lora leaves trainable
    for path, m in jax.tree_util.tree_leaves_with_path(mask):
        name = jax.tree_util.keystr(path)
        assert m == ("_lora" in name), name


def test_lora_scoping(base_params):
    enc_only, _ = apply_lora(base_params, rank=2, alpha=4, encoder_only=True)
    assert "q_w_lora" in enc_only["encoder"]["blocks"]["attn"]
    assert "q_w_lora" not in enc_only["decoder"]["blocks"]["attn"]
    dec_only, _ = apply_lora(base_params, rank=2, alpha=4, decoder_only=True)
    assert "q_w_lora" not in dec_only["encoder"]["blocks"]["attn"]
    assert "q_w_lora" in dec_only["decoder"]["blocks"]["attn"]
    with pytest.raises(ValueError):
        apply_lora(base_params, encoder_only=True, decoder_only=True)


def test_fresh_lora_is_identity(base_params):
    """B = 0 at init, so forward with adapters == base forward."""
    base_out = _fwd(base_params)
    params, _ = apply_lora(base_params, rank=4, alpha=8)
    lora_out = _fwd(params, scale=lora_scale(4, 8))
    np.testing.assert_allclose(lora_out, base_out, atol=1e-5)


def test_merge_matches_runtime_lora(base_params):
    params, _ = apply_lora(base_params, rank=4, alpha=8, key=jax.random.PRNGKey(7))
    # give B nonzero values so the adapters actually do something
    params = jax.tree_util.tree_map(lambda x: x, params)
    b = params["decoder"]["blocks"]["attn"]["q_w_lora"]["b"]
    params["decoder"]["blocks"]["attn"]["q_w_lora"]["b"] = (
        b + 0.1 * jax.random.normal(jax.random.PRNGKey(8), b.shape)
    )

    runtime_out = _fwd(params, scale=lora_scale(4, 8))
    base_out = _fwd(base_params)
    assert not np.allclose(runtime_out, base_out, atol=1e-4)

    merged = merge_lora(params, rank=4, alpha=8)
    assert not has_lora(merged)
    merged_out = _fwd(merged)  # no runtime scale needed after merge
    np.testing.assert_allclose(merged_out, runtime_out, atol=1e-4)
    # merged weights differ from base (reference --test_merge check,
    # merge_lora_weights.py:62-77)
    assert not np.allclose(
        np.asarray(merged["decoder"]["blocks"]["attn"]["q_w"]),
        np.asarray(base_params["decoder"]["blocks"]["attn"]["q_w"]),
    )


def test_remove_lora_restores_base(base_params):
    params, _ = apply_lora(base_params, rank=4, alpha=8)
    restored = remove_lora(params)
    assert not has_lora(restored)
    for pa, pb in zip(
        jax.tree_util.tree_leaves(restored), jax.tree_util.tree_leaves(base_params)
    ):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


def test_lora_param_count_scales_with_rank(base_params):
    def count(rank):
        p, mask = apply_lora(base_params, rank=rank, alpha=2 * rank)
        return sum(
            int(np.prod(leaf.shape))
            for leaf, m in zip(
                jax.tree_util.tree_leaves(p), jax.tree_util.tree_leaves(mask)
            )
            if m
        )

    assert count(8) == 2 * count(4)


def test_lora_training_only_moves_adapters(base_params):
    from whisper_finetune_tpu.parallel import get_data_mesh
    from whisper_finetune_tpu.train.step import (
        TrainState,
        make_train_step,
        partition_params,
        shard_batch,
    )

    params, mask = apply_lora(base_params, rank=4, alpha=8)
    base_snapshot = jax.tree_util.tree_map(np.asarray, remove_lora(params))

    mesh = get_data_mesh()
    tx = optax.adamw(learning_rate=1e-2)
    trainable, frozen = partition_params(params, mask)
    state = TrainState(trainable, frozen, tx.init(trainable), jnp.zeros((), jnp.int32))
    fcfg = ForwardConfig(compute_dtype="float32", lora_scale=lora_scale(4, 8))
    step_fn = make_train_step(mesh, DIMS, fcfg, tx)

    rng = np.random.default_rng(0)
    batch = shard_batch(
        mesh,
        {
            "mel": jnp.asarray(
                rng.standard_normal((1, 8, DIMS.n_mels, DIMS.n_audio_ctx * 2)).astype(
                    np.float32
                )
            ),
            "dec_input": jnp.asarray(
                rng.integers(0, DIMS.n_vocab, (1, 8, 8)).astype(np.int32)
            ),
            "dec_output": jnp.asarray(
                rng.integers(0, DIMS.n_vocab, (1, 8, 8)).astype(np.int32)
            ),
        },
    )
    for _ in range(2):
        state, loss = step_fn(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))

    # base weights unchanged; B adapters moved away from zero
    from whisper_finetune_tpu.train.step import combine_params

    merged = combine_params(state.trainable, state.frozen)
    after_base = jax.tree_util.tree_map(np.asarray, remove_lora(merged))
    for pa, pb in zip(
        jax.tree_util.tree_leaves(after_base),
        jax.tree_util.tree_leaves(base_snapshot),
    ):
        np.testing.assert_array_equal(pa, pb)
    b = np.asarray(merged["decoder"]["blocks"]["attn"]["q_w_lora"]["b"])
    assert np.abs(b).max() > 0


def test_lora_debug_stats(base_params):
    params, _ = apply_lora(base_params, rank=4, alpha=8, key=jax.random.PRNGKey(1))
    stats = get_lora_param_stats(params)
    assert stats["lora_debug/A_norm"] > 0
    assert stats["lora_debug/B_norm"] == 0  # zero init
    # encoder 2 layers x 6 targets + decoder 2 layers x 10 targets
    assert stats["lora_debug/num_adapters"] == 2 * 6 + 2 * 10

    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    gstats = get_lora_grad_stats(grads)
    assert gstats["lora_debug/A_grad_norm"] > 0

    tracker = LoRAUpdateTracker(params)
    same = tracker.update_and_stats(params)
    assert same["lora_debug/A_update_norm"] == 0
    moved = jax.tree_util.tree_map(lambda x: x + 0.01, params)
    delta = tracker.update_and_stats(moved)
    assert delta["lora_debug/B_update_norm"] > 0
