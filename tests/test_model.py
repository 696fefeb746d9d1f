"""Model-core tests: shapes, causality, golden numerics vs HF Whisper,
checkpoint roundtrip, surgery, stochastic depth and deep SpecAugment.

The golden test mirrors the reference's approach of validating against a
known-good implementation (its tests stub openai-whisper; we have the real
HF port available and compare full fp32 logits)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_finetune_tpu.models import (
    ForwardConfig,
    ModelDimensions,
    forward,
    init_params,
    load_checkpoint,
    params_to_state_dict,
    save_checkpoint,
    sinusoids,
    state_dict_to_params,
)
from whisper_finetune_tpu.models.surgery import resample_indices, resize_whisper_layers

TINY = ModelDimensions(
    n_mels=80,
    n_audio_ctx=50,
    n_audio_state=64,
    n_audio_head=4,
    n_audio_layer=2,
    n_vocab=1000,
    n_text_ctx=32,
    n_text_state=64,
    n_text_head=4,
    n_text_layer=2,
)

FP32 = ForwardConfig(compute_dtype="float32")


@pytest.fixture(scope="module")
def tiny_params():
    return init_params(jax.random.PRNGKey(0), TINY)


def _random_inputs(batch=2, t_tokens=16, seed=1):
    rng = np.random.default_rng(seed)
    mel = rng.standard_normal((batch, TINY.n_mels, TINY.n_audio_ctx * 2)).astype(
        np.float32
    )
    tokens = rng.integers(0, TINY.n_vocab, (batch, t_tokens)).astype(np.int32)
    return jnp.asarray(mel), jnp.asarray(tokens)


def test_forward_shapes(tiny_params):
    mel, tokens = _random_inputs()
    logits = forward(tiny_params, mel, tokens, TINY, FP32)
    assert logits.shape == (2, 16, TINY.n_vocab)
    assert logits.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_decoder_causality(tiny_params):
    mel, tokens = _random_inputs()
    logits_a = forward(tiny_params, mel, tokens, TINY, FP32)
    tokens_b = tokens.at[:, 10].set((tokens[:, 10] + 1) % TINY.n_vocab)
    logits_b = forward(tiny_params, mel, tokens_b, TINY, FP32)
    np.testing.assert_allclose(
        np.asarray(logits_a[:, :10]), np.asarray(logits_b[:, :10]), atol=1e-5
    )
    assert not np.allclose(np.asarray(logits_a[:, 10:]), np.asarray(logits_b[:, 10:]))


def test_remat_matches_no_remat(tiny_params):
    mel, tokens = _random_inputs()
    no_remat = ForwardConfig(
        compute_dtype="float32", remat_encoder=False, remat_decoder=False
    )
    a = forward(tiny_params, mel, tokens, TINY, FP32)
    b = forward(tiny_params, mel, tokens, TINY, no_remat)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


# ---------------------------------------------------------------------------
# Golden numerics vs HuggingFace Whisper
# ---------------------------------------------------------------------------

def _hf_to_openai_state_dict(hf_model, dims: ModelDimensions):
    """Rename HF Whisper weights to the OpenAI layout (inverse of the
    reference's convert_openai_to_hf.py:89-124 mapping)."""
    sd = {k: v.detach().cpu() for k, v in hf_model.state_dict().items()}
    out = {}

    def cp(dst, src):
        out[dst] = sd[src]

    cp("encoder.conv1.weight", "model.encoder.conv1.weight")
    cp("encoder.conv1.bias", "model.encoder.conv1.bias")
    cp("encoder.conv2.weight", "model.encoder.conv2.weight")
    cp("encoder.conv2.bias", "model.encoder.conv2.bias")
    cp("encoder.positional_embedding", "model.encoder.embed_positions.weight")
    cp("encoder.ln_post.weight", "model.encoder.layer_norm.weight")
    cp("encoder.ln_post.bias", "model.encoder.layer_norm.bias")
    cp("decoder.token_embedding.weight", "model.decoder.embed_tokens.weight")
    cp("decoder.positional_embedding", "model.decoder.embed_positions.weight")
    cp("decoder.ln.weight", "model.decoder.layer_norm.weight")
    cp("decoder.ln.bias", "model.decoder.layer_norm.bias")

    attn_map = [
        ("attn.query", "self_attn.q_proj", True),
        ("attn.key", "self_attn.k_proj", False),
        ("attn.value", "self_attn.v_proj", True),
        ("attn.out", "self_attn.out_proj", True),
    ]
    cross_map = [
        ("cross_attn.query", "encoder_attn.q_proj", True),
        ("cross_attn.key", "encoder_attn.k_proj", False),
        ("cross_attn.value", "encoder_attn.v_proj", True),
        ("cross_attn.out", "encoder_attn.out_proj", True),
    ]
    common = [
        ("attn_ln", "self_attn_layer_norm"),
        ("mlp.0", "fc1"),
        ("mlp.2", "fc2"),
        ("mlp_ln", "final_layer_norm"),
    ]

    for side, n_layers, extra in (
        ("encoder", dims.n_audio_layer, []),
        ("decoder", dims.n_text_layer, cross_map + [("cross_attn_ln", "encoder_attn_layer_norm")]),
    ):
        for i in range(n_layers):
            for oa, hf, has_bias in attn_map + [e for e in extra if len(e) == 3]:
                cp(f"{side}.blocks.{i}.{oa}.weight", f"model.{side}.layers.{i}.{hf}.weight")
                if has_bias:
                    cp(f"{side}.blocks.{i}.{oa}.bias", f"model.{side}.layers.{i}.{hf}.bias")
            for oa, hf in common + [e for e in extra if len(e) == 2]:
                cp(f"{side}.blocks.{i}.{oa}.weight", f"model.{side}.layers.{i}.{hf}.weight")
                cp(f"{side}.blocks.{i}.{oa}.bias", f"model.{side}.layers.{i}.{hf}.bias")

    return out


def test_golden_vs_hf_whisper():
    torch = pytest.importorskip("torch")
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    cfg = WhisperConfig(
        vocab_size=TINY.n_vocab,
        num_mel_bins=TINY.n_mels,
        d_model=TINY.n_audio_state,
        encoder_layers=TINY.n_audio_layer,
        encoder_attention_heads=TINY.n_audio_head,
        encoder_ffn_dim=4 * TINY.n_audio_state,
        decoder_layers=TINY.n_text_layer,
        decoder_attention_heads=TINY.n_text_head,
        decoder_ffn_dim=4 * TINY.n_text_state,
        max_source_positions=TINY.n_audio_ctx,
        max_target_positions=TINY.n_text_ctx,
        activation_function="gelu",
        dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
        decoder_start_token_id=3,
        suppress_tokens=None,
        begin_suppress_tokens=None,
    )
    torch.manual_seed(0)
    hf = WhisperForConditionalGeneration(cfg).eval()
    # HF random-inits encoder position embeddings; the OpenAI architecture
    # (and ours) uses fixed sinusoids — align them.
    with torch.no_grad():
        hf.model.encoder.embed_positions.weight.copy_(
            torch.from_numpy(sinusoids(TINY.n_audio_ctx, TINY.n_audio_state))
        )

    state_dict = _hf_to_openai_state_dict(hf, TINY)
    params = state_dict_to_params(state_dict, TINY)

    mel, tokens = _random_inputs()
    with torch.no_grad():
        hf_logits = hf(
            input_features=torch.from_numpy(np.asarray(mel)),
            decoder_input_ids=torch.from_numpy(np.asarray(tokens)).long(),
        ).logits.numpy()

    ours = np.asarray(forward(params, mel, tokens, TINY, FP32))
    np.testing.assert_allclose(ours, hf_logits, atol=2e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# Checkpoint roundtrip
# ---------------------------------------------------------------------------

def test_checkpoint_roundtrip(tiny_params, tmp_path):
    path = str(tmp_path / "ckpt.pt")
    save_checkpoint(path, tiny_params, TINY)
    params2, dims2 = load_checkpoint(path)
    assert dims2 == TINY
    flat1 = jax.tree_util.tree_leaves_with_path(tiny_params)
    flat2 = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(params2)
    )
    for key, leaf in flat1:
        other = flat2[jax.tree_util.keystr(key)]
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(other), atol=1e-3, rtol=1e-2
        )  # fp16 storage


def test_state_dict_contains_openai_keys(tiny_params):
    sd = params_to_state_dict(tiny_params, TINY)
    for key in (
        "encoder.conv1.weight",
        "encoder.positional_embedding",
        "encoder.blocks.0.attn.query.weight",
        "encoder.blocks.1.mlp.2.bias",
        "decoder.token_embedding.weight",
        "decoder.blocks.0.cross_attn.key.weight",
        "decoder.ln.weight",
    ):
        assert key in sd, key
    assert sd["encoder.conv1.weight"].dtype == np.float16
    # torch conv layout (out, in, k)
    assert sd["encoder.conv1.weight"].shape == (TINY.n_audio_state, TINY.n_mels, 3)
    assert "decoder.blocks.0.cross_attn.key.bias" not in sd


# ---------------------------------------------------------------------------
# Surgery
# ---------------------------------------------------------------------------

def test_resample_indices_semantics():
    np.testing.assert_array_equal(resample_indices(4, 4), [0, 1, 2, 3])
    np.testing.assert_array_equal(resample_indices(4, 2), [1, 3])
    np.testing.assert_array_equal(resample_indices(2, 4), [0, 0, 1, 1])
    np.testing.assert_array_equal(resample_indices(4, 6), [0, 1, 1, 2, 3, 3])
    with pytest.raises(ValueError):
        resample_indices(4, 0)


def test_resize_whisper_layers(tiny_params):
    params2, dims2, changed = resize_whisper_layers(
        tiny_params, TINY, target_encoder_layers=3, target_decoder_layers=None
    )
    assert changed
    assert dims2.n_audio_layer == 3
    assert params2["encoder"]["blocks"]["attn"]["q_w"].shape[0] == 3
    # decoder untouched
    assert params2["decoder"]["blocks"]["attn"]["q_w"].shape[0] == 2
    mel, tokens = _random_inputs()
    logits = forward(params2, mel, tokens, dims2, FP32)
    assert logits.shape == (2, 16, TINY.n_vocab)

    _, _, unchanged = resize_whisper_layers(tiny_params, TINY, 2, 2)
    assert not unchanged


# ---------------------------------------------------------------------------
# Stochastic depth & deep SpecAugment
# ---------------------------------------------------------------------------

def test_stochastic_depth_zero_matches_eval(tiny_params):
    mel, tokens = _random_inputs()
    fcfg = ForwardConfig(compute_dtype="float32", stochastic_depth=0.0)
    a = forward(tiny_params, mel, tokens, TINY, fcfg, rng=jax.random.PRNGKey(3), train=True)
    b = forward(tiny_params, mel, tokens, TINY, fcfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_stochastic_depth_eval_ignores_p(tiny_params):
    mel, tokens = _random_inputs()
    fcfg = ForwardConfig(compute_dtype="float32", stochastic_depth=0.5)
    a = forward(tiny_params, mel, tokens, TINY, fcfg, train=False)
    b = forward(tiny_params, mel, tokens, TINY, FP32, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_stochastic_depth_training_perturbs(tiny_params):
    mel, tokens = _random_inputs()
    fcfg = ForwardConfig(compute_dtype="float32", stochastic_depth=0.5)
    base = forward(tiny_params, mel, tokens, TINY, FP32)
    outs = [
        np.asarray(
            forward(tiny_params, mel, tokens, TINY, fcfg, rng=jax.random.PRNGKey(s), train=True)
        )
        for s in range(4)
    ]
    assert any(not np.allclose(o, np.asarray(base), atol=1e-4) for o in outs)


def test_deep_spec_augment_train_only(tiny_params):
    mel, tokens = _random_inputs()
    fcfg = ForwardConfig(
        compute_dtype="float32",
        dsa_apply=True,
        dsa_time_mask_param=20,
        dsa_freq_mask_param=10,
        dsa_p=1.0,
    )
    eval_out = forward(tiny_params, mel, tokens, TINY, fcfg, train=False)
    base = forward(tiny_params, mel, tokens, TINY, FP32)
    np.testing.assert_allclose(np.asarray(eval_out), np.asarray(base), atol=1e-5)

    train_out = forward(
        tiny_params, mel, tokens, TINY, fcfg, rng=jax.random.PRNGKey(7), train=True
    )
    assert not np.allclose(np.asarray(train_out), np.asarray(base), atol=1e-4)


def test_dsa_layer_flags():
    from whisper_finetune_tpu.models.whisper import dsa_layer_flags

    fcfg = ForwardConfig(dsa_apply=True)
    np.testing.assert_array_equal(dsa_layer_flags(fcfg, 4), [True, True, True, False])
    fcfg2 = ForwardConfig(dsa_apply=True, dsa_layer_indices=(0, 3))
    # explicit last index silently skipped (reference model_utils.py:425-427)
    np.testing.assert_array_equal(dsa_layer_flags(fcfg2, 4), [True, False, False, False])
    with pytest.raises(ValueError):
        dsa_layer_flags(ForwardConfig(dsa_apply=True, dsa_layer_indices=(9,)), 4)
    np.testing.assert_array_equal(
        dsa_layer_flags(ForwardConfig(dsa_apply=False), 3), [False, False, False]
    )


def test_save_policy_gradients_match_full_remat(tiny_params):
    """A save:<names> remat policy changes only the memory/recompute split,
    never numerics: loss and gradients must equal the full-remat ones."""
    mel, tokens = _random_inputs()
    targets = np.roll(np.asarray(tokens), -1, axis=-1).astype(np.int32)

    from whisper_finetune_tpu.train.step import cross_entropy_loss

    def loss_for(fcfg):
        def loss_fn(p):
            logits = forward.__wrapped__(
                p, mel, jnp.asarray(tokens), TINY, fcfg, train=True
            )
            return cross_entropy_loss(logits, jnp.asarray(targets))

        return jax.jit(jax.value_and_grad(loss_fn))(tiny_params)

    base_l, base_g = loss_for(ForwardConfig(compute_dtype="float32"))
    for policy in (
        "save:enc_qkv,dec_qkv,cross_kv",
        "save:enc_mlp_h,dec_mlp_h,enc_ln1,dec_ln_cross",
        "attn",
        # host-offload variants (round 5): DMA the site to pinned host RAM
        # instead of keeping it in HBM or recomputing — numerics must be
        # bit-for-bit the same split, just a different residence.
        "offload:enc_qkv,dec_qkv",
        "save:enc_mlp_h+offload:enc_qkv,dec_ln1",
    ):
        l, g = loss_for(
            ForwardConfig(compute_dtype="float32", remat_policy=policy)
        )
        assert float(l) == pytest.approx(float(base_l), abs=1e-6), policy
        for a, b in zip(
            jax.tree_util.tree_leaves(base_g), jax.tree_util.tree_leaves(g)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5, err_msg=policy
            )

    # ForwardConfig is an unvalidated dataclass; the empty save-list error
    # surfaces at trace time (whisper.py _remat), exercised here with the
    # remat path enabled.
    for bad in ("save:", "save:enc_qkv+dots", "offload:+save:"):
        with pytest.raises(ValueError):
            forward.__wrapped__(
                tiny_params, mel, jnp.asarray(tokens), TINY,
                ForwardConfig(
                    compute_dtype="float32", remat_policy=bad,
                    remat_encoder=True,
                ),
                train=True,
            )


def test_slice_cast_matches_precast(tiny_params):
    """precast_weights=False (per-layer barriered slice cast inside the scan
    body — the split-update Muon flagship's memory fit) must produce the
    same bf16 training loss and gradients as the default whole-tree precast:
    it is the identical cast, placed per layer."""
    mel, tokens = _random_inputs()
    targets = np.roll(np.asarray(tokens), -1, axis=-1).astype(np.int32)

    from whisper_finetune_tpu.train.step import cross_entropy_loss

    def loss_for(fcfg):
        def loss_fn(p):
            logits = forward.__wrapped__(
                p, mel, jnp.asarray(tokens), TINY, fcfg, train=True
            )
            return cross_entropy_loss(logits, jnp.asarray(targets))

        return jax.jit(jax.value_and_grad(loss_fn))(tiny_params)

    common = dict(compute_dtype="bfloat16", remat_encoder=True, remat_decoder=True)
    base_l, base_g = loss_for(ForwardConfig(precast_weights=True, **common))
    l, g = loss_for(ForwardConfig(precast_weights=False, **common))
    assert float(l) == pytest.approx(float(base_l), abs=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(base_g), jax.tree_util.tree_leaves(g)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        )


def test_fetch_checkpoint_sha256_contract(tmp_path, monkeypatch):
    """SHA256-verified official-checkpoint fetch (reference
    convert_openai_to_hf.py:134-169 behavior), exercised offline over a
    file:// base URL: fresh download verifies, a valid cached file is
    reused without touching the network, a corrupt cached file warns and
    re-downloads, and a corrupt download is a hard error."""
    import hashlib
    import warnings

    import pytest

    from whisper_finetune_tpu.models import checkpoint as ckpt_mod
    from whisper_finetune_tpu.models.checkpoint import fetch_checkpoint

    payload = b"not a real checkpoint, just bytes to hash"
    sha = hashlib.sha256(payload).hexdigest()
    serve = tmp_path / "serve" / sha
    serve.mkdir(parents=True)
    (serve / "tiny.pt").write_bytes(payload)
    monkeypatch.setitem(ckpt_mod._OFFICIAL_SHA256, "tiny", sha)
    monkeypatch.setenv(
        "WFT_CHECKPOINT_BASE_URL", (tmp_path / "serve").as_uri()
    )
    root = str(tmp_path / "cache")

    # fresh download verifies and lands as <root>/tiny.pt
    path = fetch_checkpoint("tiny", root)
    assert path.endswith("tiny.pt")
    assert open(path, "rb").read() == payload

    # valid cache is reused without any fetch (dead base URL proves it)
    monkeypatch.setenv("WFT_CHECKPOINT_BASE_URL",
                       (tmp_path / "nowhere").as_uri())
    assert fetch_checkpoint("tiny", root) == path

    # corrupt cache warns and re-downloads
    monkeypatch.setenv("WFT_CHECKPOINT_BASE_URL",
                       (tmp_path / "serve").as_uri())
    with open(path, "wb") as f:
        f.write(b"corrupted")
    with pytest.warns(UserWarning, match="checksum does not match"):
        assert open(fetch_checkpoint("tiny", root), "rb").read() == payload

    # corrupt download is a hard error
    (serve / "tiny.pt").write_bytes(b"tampered in transit")
    os.remove(path)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        with pytest.raises(RuntimeError, match="SHA256"):
            fetch_checkpoint("tiny", root)

    # unknown names are rejected up front
    with pytest.raises(ValueError, match="No official checkpoint digest"):
        fetch_checkpoint("large-v3-turbo", root)


def test_load_model_download_opt_in(tmp_path, monkeypatch):
    """load_model fetches a missing preset only with WFT_ALLOW_DOWNLOAD=1,
    into WHISPER_CHECKPOINT_DIR, and the fetched file round-trips through
    load_checkpoint."""
    import hashlib

    from whisper_finetune_tpu.models import checkpoint as ckpt_mod
    from whisper_finetune_tpu.models.checkpoint import (
        load_model,
        save_checkpoint,
    )
    from whisper_finetune_tpu.models.dims import MODEL_PRESETS
    from whisper_finetune_tpu.models.whisper import init_params

    dims = MODEL_PRESETS["tiny"]
    params = init_params(jax.random.PRNGKey(0), dims)
    staging = tmp_path / "staging.pt"
    save_checkpoint(str(staging), params, dims)
    payload = staging.read_bytes()
    sha = hashlib.sha256(payload).hexdigest()
    serve = tmp_path / "serve" / sha
    serve.mkdir(parents=True)
    (serve / "tiny.pt").write_bytes(payload)

    monkeypatch.setitem(ckpt_mod._OFFICIAL_SHA256, "tiny", sha)
    monkeypatch.setenv("WFT_CHECKPOINT_BASE_URL",
                       (tmp_path / "serve").as_uri())
    monkeypatch.setenv("WHISPER_CHECKPOINT_DIR", str(tmp_path / "ckpts"))
    monkeypatch.delenv("WFT_ALLOW_RANDOM_INIT", raising=False)
    monkeypatch.delenv("WFT_ALLOW_DOWNLOAD", raising=False)

    # without the opt-in: the offline hard error, which names the knob
    with pytest.raises(FileNotFoundError, match="WFT_ALLOW_DOWNLOAD"):
        load_model("tiny")

    monkeypatch.setenv("WFT_ALLOW_DOWNLOAD", "1")
    loaded, dims2 = load_model("tiny")
    assert dims2 == dims
    assert os.path.isfile(tmp_path / "ckpts" / "tiny.pt")
    a = jax.tree_util.tree_leaves(loaded)
    b = jax.tree_util.tree_leaves(params)
    assert len(a) == len(b)
    np.testing.assert_array_equal(
        np.asarray(a[0]), np.asarray(b[0]).astype(np.float16).astype(a[0].dtype)
    )
