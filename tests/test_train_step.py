"""Train-step tests: the real multi-device code path on an 8-device CPU mesh
(the TPU-build's upgrade over the reference's monkeypatched-globals approach,
reference tests/test_training_utils.py:400-533): loss parity of the CE
implementation vs torch, loss decrease over steps, gradient-accumulation
equivalence, and frozen-parameter invariance."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from whisper_finetune_tpu.models import ForwardConfig, ModelDimensions, init_params
from whisper_finetune_tpu.parallel import get_data_mesh
from whisper_finetune_tpu.train.step import (
    TrainState,
    combine_params,
    cross_entropy_loss,
    make_train_step,
    partition_params,
    shard_batch,
)

DIMS = ModelDimensions(
    n_mels=16,
    n_audio_ctx=32,
    n_audio_state=32,
    n_audio_head=2,
    n_audio_layer=2,
    n_vocab=128,
    n_text_ctx=16,
    n_text_head=2,
    n_text_state=32,
    n_text_layer=2,
)
FCFG = ForwardConfig(compute_dtype="float32")


def _batch(accum, global_b, seed=0):
    rng = np.random.default_rng(seed)
    mel = rng.standard_normal(
        (accum, global_b, DIMS.n_mels, DIMS.n_audio_ctx * 2)
    ).astype(np.float32)
    dec_in = rng.integers(0, DIMS.n_vocab, (accum, global_b, DIMS.n_text_ctx)).astype(
        np.int32
    )
    dec_out = np.roll(dec_in, -1, axis=-1).astype(np.int32)
    dec_out[..., -1] = -100
    dec_out[..., :2] = -100  # emulate masked prompt region
    return {
        "mel": jnp.asarray(mel),
        "dec_input": jnp.asarray(dec_in),
        "dec_output": jnp.asarray(dec_out),
    }


def _make_state(tx, trainable_mask=None, seed=0):
    params = init_params(jax.random.PRNGKey(seed), DIMS)
    trainable, frozen = partition_params(params, trainable_mask)
    return TrainState(
        trainable=trainable,
        frozen=frozen,
        opt_state=tx.init(trainable),
        step=jnp.zeros((), jnp.int32),
    )


def test_cross_entropy_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((3, 7, 11)).astype(np.float32)
    targets = rng.integers(0, 11, (3, 7)).astype(np.int64)
    targets[0, :3] = -100
    targets[2, 5:] = -100

    for ls in (0.0, 0.1):
        ours = float(
            cross_entropy_loss(jnp.asarray(logits), jnp.asarray(targets), ls)
        )
        ref = torch.nn.functional.cross_entropy(
            torch.from_numpy(logits).permute(0, 2, 1),
            torch.from_numpy(targets),
            label_smoothing=ls,
            ignore_index=-100,
        ).item()
        assert ours == pytest.approx(ref, abs=1e-5), f"label_smoothing={ls}"


def test_cross_entropy_grads_match_torch():
    """The custom VJP (reduction-form CE, softmax rebuilt in backward) must
    reproduce torch's cross_entropy gradients, including ignore positions,
    label smoothing, and bf16 logits cotangent dtype."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((3, 7, 11)).astype(np.float32)
    targets = rng.integers(0, 11, (3, 7)).astype(np.int64)
    targets[0, :3] = -100
    targets[2, 5:] = -100

    for ls in (0.0, 0.1):
        ours = jax.grad(
            lambda l: cross_entropy_loss(l, jnp.asarray(targets), ls)
        )(jnp.asarray(logits))
        t = torch.from_numpy(logits).requires_grad_(True)
        torch.nn.functional.cross_entropy(
            t.permute(0, 2, 1),
            torch.from_numpy(targets),
            label_smoothing=ls,
            ignore_index=-100,
        ).backward()
        np.testing.assert_allclose(
            np.asarray(ours), t.grad.numpy(), atol=1e-6,
            err_msg=f"label_smoothing={ls}",
        )

    # bf16 logits: cotangent comes back in the logits dtype
    g16 = jax.grad(
        lambda l: cross_entropy_loss(l, jnp.asarray(targets), 0.1)
    )(jnp.asarray(logits, jnp.bfloat16))
    assert g16.dtype == jnp.bfloat16

    # all positions ignored: loss 0, grads 0 (count clamps to 1)
    all_ign = np.full_like(targets, -100)
    loss0, g0 = jax.value_and_grad(
        lambda l: cross_entropy_loss(l, jnp.asarray(all_ign), 0.1)
    )(jnp.asarray(logits))
    assert float(loss0) == 0.0
    np.testing.assert_array_equal(np.asarray(g0), 0.0)


def test_train_step_loss_decreases_on_mesh():
    mesh = get_data_mesh()
    assert mesh.devices.size == 8  # conftest forces 8 CPU devices
    tx = optax.chain(
        optax.clip_by_global_norm(1.0), optax.adamw(learning_rate=3e-3)
    )
    step_fn = make_train_step(mesh, DIMS, FCFG, tx, label_smoothing=0.0)
    state = _make_state(tx)
    batch = shard_batch(mesh, _batch(accum=2, global_b=8))
    rng = jax.random.PRNGKey(0)

    losses = []
    for _ in range(12):
        state, loss = step_fn(state, batch, rng)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.2, losses
    assert int(state.step) == 12
    assert all(np.isfinite(losses))


def test_grad_accum_matches_single_big_batch():
    """accum=2 x batch=8 must equal accum=1 x batch=16 when every microbatch
    has identical token counts (the reference's accumulation divides each
    microbatch loss by accum — mean-of-means == big-batch mean here)."""
    mesh = get_data_mesh()
    tx = optax.sgd(learning_rate=1e-2)

    batch = _batch(accum=2, global_b=8, seed=3)
    big = {k: v.reshape((1, 16) + v.shape[2:]) for k, v in batch.items()}

    fcfg_det = ForwardConfig(compute_dtype="float32", stochastic_depth=0.0)
    step_a = make_train_step(mesh, DIMS, fcfg_det, tx)
    step_b = make_train_step(mesh, DIMS, fcfg_det, tx)
    sa = _make_state(tx, seed=5)
    sb = _make_state(tx, seed=5)
    rng = jax.random.PRNGKey(1)

    sa, la = step_a(sa, shard_batch(mesh, batch), rng)
    sb, lb = step_b(sb, shard_batch(mesh, big), rng)

    assert float(la) == pytest.approx(float(lb), abs=1e-5)
    for pa, pb in zip(
        jax.tree_util.tree_leaves(sa.trainable), jax.tree_util.tree_leaves(sb.trainable)
    ):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=1e-5)


def test_frozen_params_stay_frozen():
    mesh = get_data_mesh()
    tx = optax.adamw(learning_rate=1e-2)
    params = init_params(jax.random.PRNGKey(0), DIMS)
    # Freeze the whole encoder (reference train_only_decoder semantics,
    # finetune.py:468-471).
    mask = jax.tree_util.tree_map(lambda _: True, params)
    mask["encoder"] = jax.tree_util.tree_map(lambda _: False, params["encoder"])
    trainable, frozen = partition_params(params, mask)
    assert not jax.tree_util.tree_leaves(trainable[
        "encoder"
    ]), "encoder should have no trainable leaves"

    # The step donates its input state; snapshot originals host-side first.
    params = jax.tree_util.tree_map(np.asarray, params)

    state = TrainState(trainable, frozen, tx.init(trainable), jnp.zeros((), jnp.int32))
    step_fn = make_train_step(mesh, DIMS, FCFG, tx)
    batch = shard_batch(mesh, _batch(accum=1, global_b=8))
    state, _ = step_fn(state, batch, jax.random.PRNGKey(0))

    merged = combine_params(state.trainable, state.frozen)
    for pa, pb in zip(
        jax.tree_util.tree_leaves(merged["encoder"]),
        jax.tree_util.tree_leaves(params["encoder"]),
    ):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
    # decoder moved
    moved = any(
        not np.allclose(np.asarray(pa), np.asarray(pb))
        for pa, pb in zip(
            jax.tree_util.tree_leaves(merged["decoder"]),
            jax.tree_util.tree_leaves(params["decoder"]),
        )
    )
    assert moved


def test_partition_combine_roundtrip():
    params = init_params(jax.random.PRNGKey(1), DIMS)
    mask = jax.tree_util.tree_map(lambda _: True, params)
    mask["decoder"]["tok_emb"] = False
    trainable, frozen = partition_params(params, mask)
    merged = combine_params(trainable, frozen)
    for pa, pb in zip(
        jax.tree_util.tree_leaves(merged), jax.tree_util.tree_leaves(params)
    ):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


def test_train_step_with_sharded_muon():
    """Full train step with the Muon optimizer (data-axis-sharded
    Newton-Schulz) on the 8-device mesh."""
    from whisper_finetune_tpu.optim import get_optimizer

    mesh = get_data_mesh()
    n_dev = mesh.devices.size
    dims = DIMS.replace(n_audio_layer=n_dev, n_text_layer=2)
    params = init_params(jax.random.PRNGKey(0), dims)
    trainable, frozen = partition_params(params, None)
    conf = {
        "type": "adamw", "muon": True, "8bit": False,
        "muon_params": {"lr": 0.01, "momentum": 0.95},
        "params": {"lr": 1e-3},
    }
    opt, meta = get_optimizer(
        trainable, conf, data_shard_axis="data", data_axis_size=n_dev
    )
    assert any(m["lr_log_label"] == "muon" for m in meta)
    tx = optax.chain(optax.clip_by_global_norm(1.0), opt)
    state = TrainState(trainable, frozen, tx.init(trainable), jnp.zeros((), jnp.int32))

    step_fn = make_train_step(mesh, dims, FCFG, tx)
    rng = np.random.default_rng(0)
    batch = shard_batch(mesh, {
        "mel": jnp.asarray(rng.standard_normal(
            (1, 8, dims.n_mels, dims.n_audio_ctx * 2)).astype(np.float32)),
        "dec_input": jnp.asarray(
            rng.integers(0, dims.n_vocab, (1, 8, dims.n_text_ctx)).astype(np.int32)),
        "dec_output": jnp.asarray(
            rng.integers(0, dims.n_vocab, (1, 8, dims.n_text_ctx)).astype(np.int32)),
    })
    losses = []
    for _ in range(3):
        state, loss = step_fn(state, batch, jax.random.PRNGKey(0))
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_zero_shard_matches_replicated():
    """ZeRO-1 optimizer-state sharding must produce bitwise-equivalent (up
    to fp tolerance) parameters to the replicated update."""
    from whisper_finetune_tpu.train.step import zero_state_sharding

    mesh = get_data_mesh()
    n_dev = mesh.devices.size
    dims = DIMS.replace(n_audio_layer=n_dev, n_text_layer=n_dev)
    tx = optax.adamw(learning_rate=1e-2, weight_decay=0.01)

    def build_state():
        params = init_params(jax.random.PRNGKey(2), dims)
        trainable, frozen = partition_params(params, None)
        return TrainState(trainable, frozen, tx.init(trainable), jnp.zeros((), jnp.int32))

    rng = np.random.default_rng(4)
    batch = {
        "mel": jnp.asarray(rng.standard_normal(
            (1, 8, dims.n_mels, dims.n_audio_ctx * 2)).astype(np.float32)),
        "dec_input": jnp.asarray(
            rng.integers(0, dims.n_vocab, (1, 8, dims.n_text_ctx)).astype(np.int32)),
        "dec_output": jnp.asarray(
            rng.integers(0, dims.n_vocab, (1, 8, dims.n_text_ctx)).astype(np.int32)),
    }
    key = jax.random.PRNGKey(0)

    # replicated path (clip via make_train_step, not optax chain)
    step_rep = make_train_step(mesh, dims, FCFG, tx, max_grad_norm=1.0)
    s_rep = build_state()
    for _ in range(3):
        s_rep, loss_rep = step_rep(s_rep, shard_batch(mesh, batch), key)

    # zero-sharded path
    s_zero = build_state()
    shardings = zero_state_sharding(mesh, s_zero)
    s_zero = jax.device_put(s_zero, shardings)
    step_zero = make_train_step(
        mesh, dims, FCFG, tx, max_grad_norm=1.0,
        zero_shard=True, zero_opt_state=s_zero.opt_state,
        zero_params=s_zero.trainable,
    )
    for _ in range(3):
        s_zero, loss_zero = step_zero(s_zero, shard_batch(mesh, batch), key)

    assert float(loss_rep) == pytest.approx(float(loss_zero), abs=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(s_rep.trainable),
        jax.tree_util.tree_leaves(s_zero.trainable),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # the optimizer state is genuinely distributed
    from jax.sharding import PartitionSpec

    mu = s_zero.opt_state[0].mu["encoder"]["blocks"]["attn"]["q_w"]
    assert mu.sharding.spec == PartitionSpec("data")


def test_zero_shard_composes_with_8bit_state():
    """ZeRO sharding + blockwise 8-bit moments: the per-shard quantization
    blocks align with the parameter shards (row-major, block-multiple
    shapes), so the composition runs and trains."""
    from whisper_finetune_tpu.optim.quantized import adamw_8bit
    from whisper_finetune_tpu.train.step import zero_state_sharding

    mesh = get_data_mesh()
    n_dev = mesh.devices.size
    dims = DIMS.replace(n_audio_state=32, n_audio_layer=n_dev, n_text_layer=n_dev)
    tx = adamw_8bit(1e-3, weight_decay=0.0)
    params = init_params(jax.random.PRNGKey(3), dims)
    trainable, frozen = partition_params(params, None)
    state = TrainState(trainable, frozen, tx.init(trainable), jnp.zeros((), jnp.int32))
    state = jax.device_put(state, zero_state_sharding(mesh, state))

    step_fn = make_train_step(
        mesh, dims, FCFG, tx, max_grad_norm=1.0,
        zero_shard=True, zero_opt_state=state.opt_state,
        zero_params=state.trainable,
    )
    rng = np.random.default_rng(5)
    batch = shard_batch(mesh, {
        "mel": jnp.asarray(rng.standard_normal(
            (1, 8, dims.n_mels, dims.n_audio_ctx * 2)).astype(np.float32)),
        "dec_input": jnp.asarray(
            rng.integers(0, dims.n_vocab, (1, 8, dims.n_text_ctx)).astype(np.int32)),
        "dec_output": jnp.asarray(
            rng.integers(0, dims.n_vocab, (1, 8, dims.n_text_ctx)).astype(np.int32)),
    })
    losses = []
    for _ in range(3):
        state, loss = step_fn(state, batch, jax.random.PRNGKey(0))
        losses.append(float(loss))
    assert all(np.isfinite(losses)) and losses[-1] < losses[0]


def test_zero_shard_quantized_state_of_replicated_param():
    """Regression: blockwise-quantized state must shard only when its OWNING
    parameter shards. large-v3's conv kernels have leading axis 3 (never
    divisible by the mesh) but block counts that are — deciding from the
    codes' own shape sharded state next to a replicated parameter and broke
    the shard update at trace time."""
    from whisper_finetune_tpu.optim.quantized import _QMoment, adamw_8bit
    from whisper_finetune_tpu.train.step import zero_state_sharding

    mesh = get_data_mesh()
    n_dev = mesh.devices.size
    # conv2 kernel: (3, 64, 64) = 12288 elements -> quantized (48 blocks,
    # 48 % 8 == 0) while the leading axis 3 stays replicated.
    dims = DIMS.replace(
        n_audio_state=64, n_text_state=64, n_audio_layer=n_dev,
        n_text_layer=n_dev,
    )
    tx = adamw_8bit(1e-3)
    params = init_params(jax.random.PRNGKey(0), dims)
    trainable, frozen = partition_params(params, None)
    state = TrainState(
        trainable, frozen, tx.init(trainable), jnp.zeros((), jnp.int32)
    )
    conv_mu = state.opt_state[0].mu["encoder"]["conv2"]["w"]
    assert isinstance(conv_mu, _QMoment) and conv_mu.codes.shape[0] % n_dev == 0

    shardings = zero_state_sharding(mesh, state)
    conv_spec = shardings.opt_state[0].mu["encoder"]["conv2"]["w"]
    assert conv_spec.codes.spec == jax.sharding.PartitionSpec(), (
        "quantized state of a replicated param must stay replicated"
    )

    state = jax.device_put(state, shardings)
    step_fn = make_train_step(
        mesh, dims, FCFG, tx, max_grad_norm=1.0,
        zero_shard=True, zero_opt_state=state.opt_state,
        zero_params=state.trainable,
    )
    rng = np.random.default_rng(12)
    batch = shard_batch(mesh, {
        "mel": jnp.asarray(rng.standard_normal(
            (1, 8, dims.n_mels, dims.n_audio_ctx * 2)).astype(np.float32)),
        "dec_input": jnp.asarray(
            rng.integers(0, dims.n_vocab, (1, 8, dims.n_text_ctx)).astype(np.int32)),
        "dec_output": jnp.asarray(
            rng.integers(0, dims.n_vocab, (1, 8, dims.n_text_ctx)).astype(np.int32)),
    })
    state, loss = step_fn(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


def test_zero_opt_specs_param_associated_for_muon_partition():
    """_zero_opt_partition_specs over the real Muon+aux partition state
    (multi_transform MaskedState trees, int8 _QMoment momentum, 8-bit aux):
    stacked block state shards, conv/embedding state replicates with its
    param, count scalars replicate."""
    from whisper_finetune_tpu.optim import get_optimizer
    from whisper_finetune_tpu.optim.quantized import _QMoment
    from whisper_finetune_tpu.train.step import _zero_opt_partition_specs

    n_dev = 8
    dims = DIMS.replace(
        n_audio_state=64, n_text_state=64, n_audio_layer=n_dev,
        n_text_layer=n_dev,
    )
    params = init_params(jax.random.PRNGKey(0), dims)
    trainable, _ = partition_params(params, None)
    conf = {
        "type": "adamw", "muon": True, "8bit": True,
        "muon_params": {"lr": 1e-4, "momentum": 0.95},
        "params": {"lr": 1e-4},
        "muon_momentum_dtype": "int8",
        "muon_aux_8bit": True,
    }
    tx, _ = get_optimizer(
        trainable, conf, data_shard_axis="data", data_axis_size=n_dev
    )
    opt_state = jax.eval_shape(tx.init, trainable)
    specs = _zero_opt_partition_specs(opt_state, trainable, n_dev)

    P = jax.sharding.PartitionSpec
    flat, _ = jax.tree_util.tree_flatten_with_path(
        specs, is_leaf=lambda x: isinstance(x, _QMoment)
    )
    sharded = rep = 0
    for path, leaf in flat:
        keys = [getattr(k, "key", getattr(k, "name", k)) for k in path]
        spec = leaf.codes if isinstance(leaf, _QMoment) else leaf
        if ("conv1" in keys or "conv2" in keys) and keys[-1] == "w":
            # conv kernels: leading axis 3 -> the param replicates, so its
            # state must too (conv BIASES (64,) legitimately shard)
            assert spec == P(), f"conv kernel state must replicate: {keys}"
            rep += 1
        elif "blocks" in keys and (
            isinstance(leaf, _QMoment) or getattr(leaf, "ndim", 0) >= 1
        ):
            assert spec == P("data"), f"stacked state must shard: {keys}"
            sharded += 1
        elif keys and keys[-1] == "count":
            assert spec == P(), f"count must replicate: {keys}"
    assert sharded > 0 and rep > 0


def test_zero_fused_matches_unfused():
    """The one-pass fused update running on ZeRO shards must produce the
    same parameters and quantized state as the generic shard-update-gather
    flow (train/step.py zero branch): the kernel math mirrors quantized.py's
    update_fn op-for-op, so the two paths agree to fp32 round-off."""
    from whisper_finetune_tpu.optim.quantized import adamw_8bit
    from whisper_finetune_tpu.train.step import zero_state_sharding

    mesh = get_data_mesh()
    n_dev = mesh.devices.size
    dims = DIMS.replace(n_audio_layer=n_dev, n_text_layer=n_dev)
    tx_fused = adamw_8bit(1e-3, weight_decay=0.01)
    # same init/update chain, fused_apply stripped -> the unfused zero path
    tx_plain = optax.GradientTransformation(tx_fused.init, tx_fused.update)

    rng = np.random.default_rng(6)
    batch = shard_batch(mesh, {
        "mel": jnp.asarray(rng.standard_normal(
            (1, 8, dims.n_mels, dims.n_audio_ctx * 2)).astype(np.float32)),
        "dec_input": jnp.asarray(
            rng.integers(0, dims.n_vocab, (1, 8, dims.n_text_ctx)).astype(np.int32)),
        "dec_output": jnp.asarray(
            rng.integers(0, dims.n_vocab, (1, 8, dims.n_text_ctx)).astype(np.int32)),
    })
    key = jax.random.PRNGKey(0)

    def run(tx):
        params = init_params(jax.random.PRNGKey(2), dims)
        trainable, frozen = partition_params(params, None)
        state = TrainState(
            trainable, frozen, tx.init(trainable), jnp.zeros((), jnp.int32)
        )
        state = jax.device_put(state, zero_state_sharding(mesh, state))
        step_fn = make_train_step(
            mesh, dims, FCFG, tx, max_grad_norm=1.0,
            zero_shard=True, zero_opt_state=state.opt_state,
        zero_params=state.trainable,
        )
        losses = []
        for _ in range(2):
            state, loss = step_fn(state, batch, key)
            losses.append(float(loss))
        return state, losses

    s_fused, l_fused = run(tx_fused)
    s_plain, l_plain = run(tx_plain)

    assert l_fused == pytest.approx(l_plain, abs=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(s_fused.trainable),
        jax.tree_util.tree_leaves(s_plain.trainable),
    ):
        # fp32 trajectories from two separate compilations: reduction-order
        # jitter in the loss backward can move single elements a few ulp
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    # quantized moment codes agree to <=1 code unit (the kernel's op order
    # mirrors the unfused path, but fp rounding at exact quantization
    # boundaries may fall either way between the two compilations)
    for a, b in zip(
        jax.tree_util.tree_leaves(s_fused.opt_state[0].mu),
        jax.tree_util.tree_leaves(s_plain.opt_state[0].mu),
    ):
        if a.dtype == jnp.int8:
            np.testing.assert_allclose(
                np.asarray(a).astype(np.int32),
                np.asarray(b).astype(np.int32),
                atol=1,
            )


def test_fused_single_mesh_matches_unfused():
    """Single-mesh fused branch (raw bf16 gradient SUMS + one combined
    mean/clip scalar into fused_apply) must match the unfused flow (pmean
    to fp32 means, clip, tx.update) — guards the sums-based contract
    against scale bugs that plain convergence checks cannot see."""
    from whisper_finetune_tpu.optim.quantized import adamw_8bit

    mesh = get_data_mesh()
    dims = DIMS.replace(n_audio_layer=2, n_text_layer=2)
    tx_fused = adamw_8bit(1e-3, weight_decay=0.01)
    tx_plain = optax.GradientTransformation(tx_fused.init, tx_fused.update)

    rng = np.random.default_rng(9)
    batch = shard_batch(mesh, {
        "mel": jnp.asarray(rng.standard_normal(
            (2, 8, dims.n_mels, dims.n_audio_ctx * 2)).astype(np.float32)),
        "dec_input": jnp.asarray(
            rng.integers(0, dims.n_vocab, (2, 8, dims.n_text_ctx)).astype(np.int32)),
        "dec_output": jnp.asarray(
            rng.integers(0, dims.n_vocab, (2, 8, dims.n_text_ctx)).astype(np.int32)),
    })
    key = jax.random.PRNGKey(0)

    def run(tx):
        params = init_params(jax.random.PRNGKey(2), dims)
        trainable, frozen = partition_params(params, None)
        state = TrainState(
            trainable, frozen, tx.init(trainable), jnp.zeros((), jnp.int32)
        )
        step_fn = make_train_step(
            mesh, dims, FCFG, tx, max_grad_norm=1.0,
            accum_dtype="bfloat16",
        )
        losses = []
        for _ in range(2):
            state, loss = step_fn(state, batch, key)
            losses.append(float(loss))
        return state, losses

    s_fused, l_fused = run(tx_fused)
    s_plain, l_plain = run(tx_plain)
    assert l_fused == pytest.approx(l_plain, abs=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(s_fused.trainable),
        jax.tree_util.tree_leaves(s_plain.trainable),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_bf16_grad_accumulation_close_to_fp32():
    mesh = get_data_mesh()
    tx = optax.adamw(1e-3)
    batch = shard_batch(mesh, _batch(accum=2, global_b=8, seed=9))
    key = jax.random.PRNGKey(0)

    s32 = _make_state(tx, seed=11)
    step32 = make_train_step(mesh, DIMS, FCFG, tx, max_grad_norm=1.0)
    s32, l32 = step32(s32, batch, key)

    s16 = _make_state(tx, seed=11)
    step16 = make_train_step(
        mesh, DIMS, FCFG, tx, max_grad_norm=1.0, accum_dtype="bfloat16"
    )
    s16, l16 = step16(s16, shard_batch(mesh, _batch(accum=2, global_b=8, seed=9)), key)

    assert float(l32) == pytest.approx(float(l16), abs=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(s32.trainable),
        jax.tree_util.tree_leaves(s16.trainable),
    ):
        a, b = np.asarray(a), np.asarray(b)
        # bf16-accumulated grads: updates agree to bf16-level tolerance
        assert np.abs(a - b).max() < 5e-3


def test_grad_histograms_watch_parity():
    """grad_hist_every: the 3rd step output carries per-module gradient
    histograms on firing steps (zeros otherwise), counts cover every
    trainable element, and the ZeRO-sharded path produces the same
    histogram as the replicated one (VERDICT r2 Missing#3 wandb.watch)."""
    from whisper_finetune_tpu.train.step import zero_state_sharding

    mesh = get_data_mesh()
    n_dev = mesh.devices.size
    dims = DIMS.replace(n_audio_layer=n_dev, n_text_layer=n_dev)
    tx = optax.adamw(learning_rate=1e-3)
    rng = np.random.default_rng(7)
    batch = {
        "mel": jnp.asarray(rng.standard_normal(
            (1, 8, dims.n_mels, dims.n_audio_ctx * 2)).astype(np.float32)),
        "dec_input": jnp.asarray(
            rng.integers(0, dims.n_vocab, (1, 8, dims.n_text_ctx)).astype(np.int32)),
        "dec_output": jnp.asarray(
            rng.integers(0, dims.n_vocab, (1, 8, dims.n_text_ctx)).astype(np.int32)),
    }
    key = jax.random.PRNGKey(0)

    def build_state():
        params = init_params(jax.random.PRNGKey(2), dims)
        trainable, frozen = partition_params(params, None)
        return TrainState(
            trainable, frozen, tx.init(trainable), jnp.zeros((), jnp.int32)
        )

    # fires on (step+1) % 2 == 0: first call zeros, second call real
    step_fn = make_train_step(
        mesh, dims, FCFG, tx, max_grad_norm=1.0, grad_hist_every=2,
        grad_hist_bins=32,
    )
    state = build_state()
    n_per_group = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(state.trainable)[0]:
        name = ".".join(p.key for p in path[:2])
        n_per_group[name] = n_per_group.get(name, 0) + leaf.size

    state, loss, h1 = step_fn(state, shard_batch(mesh, batch), key)
    assert all(int(np.sum(np.asarray(c))) == 0 for c, _, _ in h1.values())
    state, loss, h2 = step_fn(state, shard_batch(mesh, batch), key)
    assert set(h2) == set(n_per_group)
    for name, (counts, lo, hi) in h2.items():
        assert int(np.sum(np.asarray(counts))) == n_per_group[name], name
        assert float(lo) < float(hi)

    # ZeRO path: histogram of the sharded grads == replicated histogram
    step_rep = make_train_step(
        mesh, dims, FCFG, tx, max_grad_norm=1.0, grad_hist_every=1,
        grad_hist_bins=32,
    )
    s_rep = build_state()
    _, _, hist_rep = step_rep(s_rep, shard_batch(mesh, batch), key)

    s_zero = build_state()
    s_zero = jax.device_put(s_zero, zero_state_sharding(mesh, s_zero))
    step_zero = make_train_step(
        mesh, dims, FCFG, tx, max_grad_norm=1.0, grad_hist_every=1,
        grad_hist_bins=32,
        zero_shard=True, zero_opt_state=s_zero.opt_state,
        zero_params=s_zero.trainable,
    )
    _, _, hist_zero = step_zero(s_zero, shard_batch(mesh, batch), key)

    for name in hist_rep:
        cr, lr_, hr = (np.asarray(x) for x in hist_rep[name])
        cz, lz, hz = (np.asarray(x) for x in hist_zero[name])
        np.testing.assert_allclose(lr_, lz, rtol=1e-5)
        np.testing.assert_allclose(hr, hz, rtol=1e-5)
        # identical ranges and (up to fp-boundary jitter) identical counts
        assert int(abs(cr.astype(np.int64) - cz.astype(np.int64)).sum()) <= 2, name


def test_split_update_grad_histograms():
    """In split mode the histograms run as their OWN program on firing
    steps (no lax.cond inside the accum program — its branch temps are
    reserved in the program peak even on off-steps and OOM'd the flagship
    driver, chip_queue r5 e2e). Off steps return reusable zeros; firing
    steps must match the fused single-program path's histograms."""
    mesh = get_data_mesh()
    n_dev = mesh.devices.size
    dims = DIMS.replace(n_audio_layer=n_dev, n_text_layer=n_dev)
    tx = optax.adamw(learning_rate=1e-3)
    rng = np.random.default_rng(11)
    batch = shard_batch(mesh, {
        "mel": jnp.asarray(rng.standard_normal(
            (1, 8, dims.n_mels, dims.n_audio_ctx * 2)).astype(np.float32)),
        "dec_input": jnp.asarray(
            rng.integers(0, dims.n_vocab, (1, 8, dims.n_text_ctx)).astype(np.int32)),
        "dec_output": jnp.asarray(
            rng.integers(0, dims.n_vocab, (1, 8, dims.n_text_ctx)).astype(np.int32)),
    })
    key = jax.random.PRNGKey(0)
    fcfg_det = ForwardConfig(compute_dtype="float32", stochastic_depth=0.0)

    def build(split):
        params = init_params(jax.random.PRNGKey(2), dims)
        trainable, frozen = partition_params(params, None)
        state = TrainState(
            trainable, frozen, tx.init(trainable), jnp.zeros((), jnp.int32)
        )
        step = make_train_step(
            mesh, dims, fcfg_det, tx, max_grad_norm=1.0,
            grad_hist_every=2, grad_hist_bins=32, split_update=split,
        )
        return step, state

    step_ref, state_ref = build(False)
    step_split, state_split = build(True)

    # call 1: (step 0 + 1) % 2 != 0 — both modes return all-zero counts
    state_ref, _, r1 = step_ref(state_ref, batch, key)
    state_split, _, s1 = step_split(state_split, batch, key)
    assert all(int(np.sum(np.asarray(c))) == 0 for c, _, _ in s1.values())
    # call 2 fires: identical groups, counts, and (scaled) ranges
    state_ref, _, r2 = step_ref(state_ref, batch, key)
    state_split, _, s2 = step_split(state_split, batch, key)
    assert set(s2) == set(r2)
    for name in r2:
        cr, lo_r, hi_r = (np.asarray(x) for x in r2[name])
        cs, lo_s, hi_s = (np.asarray(x) for x in s2[name])
        np.testing.assert_allclose(lo_r, lo_s, rtol=1e-5, err_msg=name)
        np.testing.assert_allclose(hi_r, hi_s, rtol=1e-5, err_msg=name)
        assert int(abs(cr.astype(np.int64) - cs.astype(np.int64)).sum()) <= 2, name


def test_split_update_matches_single_program():
    """split_update=True (separate accum and optimizer-update programs — the
    single-chip Muon memory fit) must produce the same parameters and loss
    as the fused single-program step."""
    from whisper_finetune_tpu.optim import get_optimizer

    mesh = get_data_mesh()
    n_dev = mesh.devices.size
    dims = DIMS.replace(n_audio_layer=n_dev, n_text_layer=2)
    conf = {
        "type": "adamw", "muon": True, "8bit": False,
        "muon_params": {"lr": 0.01, "momentum": 0.95},
        "params": {"lr": 1e-3},
        "muon_momentum_dtype": "int8",
    }
    fcfg_det = ForwardConfig(compute_dtype="float32", stochastic_depth=0.0)

    def mk(split, max_grad_norm):
        # fresh param buffers per step mode — the steps donate their state
        params = init_params(jax.random.PRNGKey(0), dims)
        trainable, frozen = partition_params(params, None)
        opt, _ = get_optimizer(
            trainable, conf, data_shard_axis="data", data_axis_size=n_dev
        )
        state = TrainState(
            trainable, frozen, opt.init(trainable), jnp.zeros((), jnp.int32)
        )
        step = make_train_step(
            mesh, dims, fcfg_det, opt, max_grad_norm=max_grad_norm,
            accum_dtype="bfloat16", split_update=split,
        )
        return step, state

    rng = np.random.default_rng(3)
    batch = shard_batch(mesh, {
        "mel": jnp.asarray(rng.standard_normal(
            (2, 8, dims.n_mels, dims.n_audio_ctx * 2)).astype(np.float32)),
        "dec_input": jnp.asarray(
            rng.integers(0, dims.n_vocab, (2, 8, dims.n_text_ctx)).astype(np.int32)),
        "dec_output": jnp.asarray(
            rng.integers(0, dims.n_vocab, (2, 8, dims.n_text_ctx)).astype(np.int32)),
    })

    # Without clipping the two modes are numerically identical (the bf16
    # handoff rounding exists in both; the fp32 upcast is exact).
    step_one, state_one = mk(False, None)
    step_two, state_two = mk(True, None)
    for _ in range(2):
        state_one, loss_one = step_one(state_one, batch, jax.random.PRNGKey(1))
        state_two, loss_two = step_two(state_two, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(loss_one), float(loss_two), rtol=1e-6)
    # The split wrapper exposes per-phase wall times for the breakdown
    # tool (tools/bench_split_breakdown.py reads them on the real chip).
    assert set(step_two.last_timing) == {"accum_s", "update_s"}
    assert all(v >= 0.0 for v in step_two.last_timing.values())
    a = jax.tree_util.tree_leaves(state_one.trainable)
    b = jax.tree_util.tree_leaves(state_two.trainable)
    for x, y in zip(a, b):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=1e-6,
            err_msg="split-update parameters diverged from single-program",
        )
    assert int(state_two.step) == 2

    # With clipping: both modes compute the clip factor the same way (fp32
    # norm of the raw sums, folded with the mean divisor into the g_scale
    # scalar — reduce_sums), so trajectories agree up to cross-program
    # reduction-order jitter.
    step_one, state_one = mk(False, 0.5)
    step_two, state_two = mk(True, 0.5)
    for _ in range(2):
        state_one, loss_one = step_one(state_one, batch, jax.random.PRNGKey(1))
        state_two, loss_two = step_two(state_two, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(loss_one), float(loss_two), rtol=1e-5)
    for x, y in zip(
        jax.tree_util.tree_leaves(state_one.trainable),
        jax.tree_util.tree_leaves(state_two.trainable),
    ):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=1e-5,
            err_msg="split-update clipped trajectory drifted",
        )


def test_zero_muon_matches_replicated():
    """The configured v5e-8 flagship combination — Muon (fused one-pass
    update, int8-quantized momentum, 8-bit aux AdamW) under ZeRO-1
    optimizer sharding — must reproduce the replicated (non-ZeRO) fused
    trajectory: 2 steps on the 8-device mesh, parameters AND momentum
    codes compared. Under ZeRO the Muon transform is built WITHOUT its
    internal NS sharding (finetune.py passes data_shard_axis=None when
    zero_shard is on) and the ZeRO branch slices grads/params/state on the
    stacked layer axis instead; Newton-Schulz is batched over that axis, so
    per-shard NS is exactly per-layer NS and the two paths agree to fp32
    round-off."""
    from whisper_finetune_tpu.optim import get_optimizer
    from whisper_finetune_tpu.optim.quantized import _QMoment
    from whisper_finetune_tpu.train.step import zero_state_sharding

    mesh = get_data_mesh()
    n_dev = mesh.devices.size
    dims = DIMS.replace(n_audio_layer=n_dev, n_text_layer=n_dev)
    conf = {
        "type": "adamw", "muon": True, "8bit": False,
        "muon_params": {"lr": 1e-3, "momentum": 0.95, "weight_decay": 0.01},
        "params": {"lr": 1e-3, "weight_decay": 0.01},
        "muon_momentum_dtype": "int8",
        "muon_aux_8bit": True,
    }

    rng = np.random.default_rng(17)
    batch = shard_batch(mesh, {
        "mel": jnp.asarray(rng.standard_normal(
            (1, 8, dims.n_mels, dims.n_audio_ctx * 2)).astype(np.float32)),
        "dec_input": jnp.asarray(
            rng.integers(0, dims.n_vocab, (1, 8, dims.n_text_ctx)).astype(np.int32)),
        "dec_output": jnp.asarray(
            rng.integers(0, dims.n_vocab, (1, 8, dims.n_text_ctx)).astype(np.int32)),
    })
    key = jax.random.PRNGKey(0)

    def run(zero):
        params = init_params(jax.random.PRNGKey(3), dims)
        trainable, frozen = partition_params(params, None)
        # ZeRO and replicated both build the transform WITHOUT internal NS
        # sharding: that is exactly what scripts/finetune.py does under
        # zero_shard (the ZeRO branch's take_shard does the slicing).
        tx, _ = get_optimizer(trainable, conf)
        state = TrainState(
            trainable, frozen, tx.init(trainable), jnp.zeros((), jnp.int32)
        )
        if zero:
            state = jax.device_put(state, zero_state_sharding(mesh, state))
        step_fn = make_train_step(
            mesh, dims, FCFG, tx, max_grad_norm=1.0,
            zero_shard=zero,
            zero_opt_state=state.opt_state if zero else None,
            zero_params=state.trainable if zero else None,
        )
        losses = []
        for _ in range(2):
            state, loss = step_fn(state, batch, key)
            losses.append(float(loss))
        return state, losses

    s_zero, l_zero = run(True)
    s_rep, l_rep = run(False)

    assert l_zero == pytest.approx(l_rep, abs=1e-6)
    # Two separate compilations + different reduction shapes (psum_scatter
    # shards vs full pmean) give a few ulp of gradient jitter, which the
    # int8/8-bit quantizers round to occasional ±1 code flips at block
    # boundaries; one flipped code moves that element by up to ~a code unit
    # after the update. So the check is statistical: the bulk must be
    # bit-tight and the rare code-flip outliers bounded well below one
    # step's update (~2e-4 = lr·rms_factor). A real ZeRO/replicated math
    # divergence would shift entire leaves by order-of-update.
    diffs = np.concatenate([
        np.abs(np.asarray(a) - np.asarray(b)).ravel()
        for a, b in zip(
            jax.tree_util.tree_leaves(s_zero.trainable),
            jax.tree_util.tree_leaves(s_rep.trainable),
        )
    ])
    assert np.quantile(diffs, 0.999) < 2e-5, (
        "ZeRO Muon parameters diverged from replicated in bulk"
    )
    assert diffs.max() < 1e-4, (
        f"ZeRO Muon outlier beyond a quantizer code flip: {diffs.max()}"
    )
    # optimizer state: int8 codes (Muon momentum + aux AdamW moments) agree
    # to <=1 code unit, everything else (scales, counts, fp state) tightly
    za = jax.tree_util.tree_leaves(jax.device_get(s_zero.opt_state))
    zb = jax.tree_util.tree_leaves(jax.device_get(s_rep.opt_state))
    assert len(za) == len(zb) and len(za) > 4
    for a, b in zip(za, zb):
        if getattr(a, "dtype", None) == jnp.int8:
            np.testing.assert_allclose(
                np.asarray(a).astype(np.int32),
                np.asarray(b).astype(np.int32), atol=1,
                err_msg="quantized optimizer state codes diverged",
            )
        else:
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6,
                err_msg="optimizer state diverged",
            )
