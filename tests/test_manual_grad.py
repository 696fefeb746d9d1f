"""Parity tests for the hand-written gradient-accumulating backward
(train/manual_grad.py) against ``jax.grad`` of the automatic path — same
blocks, same RNG derivation, same loss; the manual path exists purely for
its memory shape (one donated buffer instead of cotangent + accumulator)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_finetune_tpu.models import ForwardConfig, ModelDimensions, init_params
from whisper_finetune_tpu.models.whisper import forward_impl
from whisper_finetune_tpu.train.manual_grad import make_manual_accumulator
from whisper_finetune_tpu.train.step import cross_entropy_loss

DIMS = ModelDimensions(
    n_mels=16,
    n_audio_ctx=32,
    n_audio_state=32,
    n_audio_head=4,
    n_audio_layer=3,
    n_vocab=120,
    n_text_ctx=16,
    n_text_state=32,
    n_text_head=4,
    n_text_layer=2,
)
SMOOTH = 0.1


def _batch(accum=2, B=2, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "mel": jnp.asarray(
            rng.standard_normal(
                (accum, B, DIMS.n_mels, DIMS.n_audio_ctx * 2)
            ).astype(np.float32)
        ),
        "dec_input": jnp.asarray(
            rng.integers(0, DIMS.n_vocab, (accum, B, DIMS.n_text_ctx)).astype(
                np.int32
            )
        ),
        "dec_output": jnp.asarray(
            rng.integers(0, DIMS.n_vocab, (accum, B, DIMS.n_text_ctx)).astype(
                np.int32
            )
        ),
    }


def _auto_grads(params, batch, micro_rngs, fcfg, acc_dtype):
    """The automatic path exactly as train.step's accumulate: per-microbatch
    value_and_grad, cast to the accumulator dtype, summed."""

    def loss_fn(p, mb, r):
        logits = forward_impl(p, mb["mel"], mb["dec_input"], DIMS, fcfg, r, True)
        return cross_entropy_loss(logits, mb["dec_output"], SMOOTH)

    total = jax.tree_util.tree_map(
        lambda p: jnp.zeros(p.shape, acc_dtype), params
    )
    loss_sum = 0.0
    for k in range(batch["mel"].shape[0]):
        mb = {key: batch[key][k] for key in batch}
        loss, g = jax.value_and_grad(loss_fn)(params, mb, micro_rngs[k])
        total = jax.tree_util.tree_map(
            lambda a, b: a + b.astype(acc_dtype), total, g
        )
        loss_sum = loss_sum + loss
    return total, loss_sum


@pytest.mark.parametrize(
    "compute_dtype,acc_dtype,gtol,ltol",
    [
        ("float32", jnp.float32, 1e-5, 1e-6),
        ("bfloat16", jnp.bfloat16, 0.08, 1e-2),
    ],
)
def test_manual_grads_match_autodiff(compute_dtype, acc_dtype, gtol, ltol):
    fcfg = ForwardConfig(
        compute_dtype=compute_dtype,
        stochastic_depth=0.3,  # exercises the lax.cond skip path
        dsa_apply=True,
        dsa_p=0.7,
        dsa_time_mask_param=8,
        dsa_freq_mask_param=4,
    )
    params = init_params(jax.random.PRNGKey(0), DIMS)
    batch = _batch()
    micro_rngs = jax.random.split(jax.random.PRNGKey(7), batch["mel"].shape[0])

    acc = make_manual_accumulator(
        DIMS,
        fcfg,
        lambda lg, tg: cross_entropy_loss(lg, tg, SMOOTH),
    )
    buf = jax.tree_util.tree_map(
        lambda p: jnp.zeros(p.shape, acc_dtype), params
    )
    man_g, man_loss = jax.jit(acc)(params, batch, micro_rngs, buf)
    ref_g, ref_loss = _auto_grads(params, batch, micro_rngs, fcfg, acc_dtype)

    np.testing.assert_allclose(
        float(man_loss), float(ref_loss), rtol=ltol
    )
    flat_m, tree_m = jax.tree_util.tree_flatten_with_path(man_g)
    flat_r = jax.tree_util.tree_leaves(ref_g)
    assert len(flat_m) == len(flat_r)
    for (path, m), r in zip(flat_m, flat_r):
        m32, r32 = np.asarray(m, np.float32), np.asarray(r, np.float32)
        scale = max(np.abs(r32).max(), 1e-3)
        np.testing.assert_allclose(
            m32, r32, atol=gtol * scale,
            err_msg=jax.tree_util.keystr(path),
        )


def test_manual_split_step_with_featurize_matches_automatic():
    """The bench/driver combination — split_update + manual_backward with
    the on-device featurize stage (audio batches) — must track the
    automatic split step: identical featurize/forward RNG derivation is
    the contract (manual_grad.py microbatch mirrors train.step loss_fn)."""
    from whisper_finetune_tpu.ops.spec_augment import FeaturizeConfig
    from whisper_finetune_tpu.parallel import get_data_mesh
    from whisper_finetune_tpu.train.step import (
        TrainState,
        make_train_step,
        partition_params,
        shard_batch,
    )
    from whisper_finetune_tpu.optim import get_optimizer

    mesh = get_data_mesh()
    n_dev = mesh.devices.size
    dims = DIMS.replace(n_audio_layer=2, n_text_layer=2, n_mels=80)
    conf = {
        "type": "adamw", "muon": True, "8bit": False,
        "muon_params": {"lr": 0.01, "momentum": 0.95},
        "params": {"lr": 1e-3},
        "muon_momentum_dtype": "int8",
    }
    # deterministic forward modulo featurize/SpecAugment randomness (shared
    # via the same per-microbatch RNG derivation in both modes)
    fcfg = ForwardConfig(
        compute_dtype="float32", stochastic_depth=0.2, dsa_apply=True,
        dsa_p=0.5, dsa_time_mask_param=6, dsa_freq_mask_param=4,
    )
    feat = FeaturizeConfig(n_mels=80, spec_augment=True, p=1.0)
    rng = np.random.default_rng(13)
    n_samples = dims.n_audio_ctx * 2 * 160
    batch = shard_batch(mesh, {
        "audio": jnp.asarray(
            (rng.standard_normal((2, n_dev, n_samples)) * 0.1).astype(np.float32)
        ),
        "crop_frames": jnp.full((2, n_dev), n_samples // 160, jnp.int32),
        "dec_input": jnp.asarray(
            rng.integers(0, dims.n_vocab, (2, n_dev, DIMS.n_text_ctx)).astype(
                np.int32
            )
        ),
        "dec_output": jnp.asarray(
            rng.integers(0, dims.n_vocab, (2, n_dev, DIMS.n_text_ctx)).astype(
                np.int32
            )
        ),
    })

    def run(manual):
        params = init_params(jax.random.PRNGKey(0), dims)
        trainable, frozen = partition_params(params, None)
        tx, _ = get_optimizer(trainable, conf)
        state = TrainState(
            trainable, frozen, tx.init(trainable), jnp.zeros((), jnp.int32)
        )
        step = make_train_step(
            mesh, dims, fcfg, tx, 0.1, feat_cfg=feat, max_grad_norm=1.0,
            accum_dtype="bfloat16", split_update=True, manual_backward=manual,
        )
        state, loss = step(state, batch, jax.random.PRNGKey(7))
        return state, float(loss)

    s_auto, l_auto = run(False)
    s_man, l_man = run(True)
    np.testing.assert_allclose(l_man, l_auto, rtol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(s_auto.trainable),
        jax.tree_util.tree_leaves(s_man.trainable),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_manual_precast_matches_slice_cast():
    """precast=True (one resident compute-dtype block shadow) and the
    default per-slice barriered cast must produce identical gradients —
    the cast is linear, so placement cannot change the math."""
    fcfg = ForwardConfig(compute_dtype="bfloat16")
    params = init_params(jax.random.PRNGKey(4), DIMS)
    batch = _batch(seed=11)
    micro_rngs = jax.random.split(jax.random.PRNGKey(5), batch["mel"].shape[0])
    loss_fn = lambda lg, tg: cross_entropy_loss(lg, tg, SMOOTH)  # noqa: E731

    outs = []
    for precast in (False, True):
        acc = make_manual_accumulator(DIMS, fcfg, loss_fn, precast=precast)
        buf = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.bfloat16), params
        )
        outs.append(jax.jit(acc)(params, batch, micro_rngs, buf))
    (g_a, l_a), (g_b, l_b) = outs
    np.testing.assert_allclose(float(l_a), float(l_b), rtol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_a), jax.tree_util.tree_leaves(g_b)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_manual_accum_one_microbatch_path():
    """accum_local == 1 bypasses the scan; both shapes must agree."""
    fcfg = ForwardConfig(compute_dtype="float32")
    params = init_params(jax.random.PRNGKey(1), DIMS)
    batch = _batch(accum=1, seed=3)
    micro_rngs = jax.random.split(jax.random.PRNGKey(2), 1)
    acc = make_manual_accumulator(
        DIMS, fcfg, lambda lg, tg: cross_entropy_loss(lg, tg, SMOOTH)
    )
    buf = jax.tree_util.tree_map(lambda p: jnp.zeros_like(p), params)
    g, loss = jax.jit(acc)(params, batch, micro_rngs, buf)
    ref_g, ref_loss = _auto_grads(params, batch, micro_rngs, fcfg, jnp.float32)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-6)
    for m, r in zip(jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(ref_g)):
        np.testing.assert_allclose(np.asarray(m), np.asarray(r), atol=1e-5)


def test_manual_rejects_lora():
    with pytest.raises(ValueError):
        make_manual_accumulator(
            DIMS, ForwardConfig(lora_scale=2.0), lambda a, b: 0.0
        )
