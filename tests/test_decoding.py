"""Decoding: the cached incremental decoder must reproduce the brute-force
argmax loop over full teacher-forced forwards; beam search must contain the
greedy path and never score below it."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_finetune_tpu.models import ForwardConfig, ModelDimensions, init_params
from whisper_finetune_tpu.models.decoding import greedy_decode
from whisper_finetune_tpu.models.whisper import forward_impl

DIMS = ModelDimensions(
    n_mels=16, n_audio_ctx=32, n_audio_state=32, n_audio_head=2, n_audio_layer=2,
    n_vocab=96, n_text_ctx=24, n_text_head=2, n_text_state=32, n_text_layer=2,
)
FCFG = ForwardConfig(compute_dtype="float32")
EOT = 95


def _brute_force(params, mel, init, n_gen):
    tokens = np.asarray(init)
    B = tokens.shape[0]
    finished = np.zeros(B, bool)
    out = []
    for _ in range(n_gen):
        logits = np.asarray(
            forward_impl(params, mel, jnp.asarray(tokens), DIMS, FCFG)
        )
        nxt = logits[:, -1].argmax(-1).astype(np.int32)
        nxt = np.where(finished, EOT, nxt)
        out.append(nxt)
        finished |= nxt == EOT
        tokens = np.concatenate([tokens, nxt[:, None]], axis=1)
    return np.stack(out, axis=1)


def test_greedy_decode_matches_bruteforce():
    params = init_params(jax.random.PRNGKey(0), DIMS)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(
        rng.standard_normal((2, DIMS.n_mels, DIMS.n_audio_ctx * 2)).astype(np.float32)
    )
    init = jnp.asarray(rng.integers(0, 64, (2, 3)).astype(np.int32))

    max_len = 12
    ours, avg_lp = greedy_decode(params, mel, init, EOT, DIMS, FCFG, max_len=max_len)
    ref = _brute_force(params, mel, init, max_len - 3)
    np.testing.assert_array_equal(np.asarray(ours), ref)
    assert np.all(np.asarray(avg_lp) <= 0.0)


def test_greedy_decode_eot_freezing():
    params = init_params(jax.random.PRNGKey(1), DIMS)
    rng = np.random.default_rng(1)
    mel = jnp.asarray(
        rng.standard_normal((1, DIMS.n_mels, DIMS.n_audio_ctx * 2)).astype(np.float32)
    )
    init = jnp.asarray([[1, 2]], jnp.int32)
    out = np.asarray(greedy_decode(params, mel, init, EOT, DIMS, FCFG, max_len=16)[0])
    row = out[0].tolist()
    if EOT in row:
        first = row.index(EOT)
        assert all(t == EOT for t in row[first:])


def test_transcribe_batch_glue():
    """transcribe_batch: raw audio -> text through the real tokenizer (tiny
    random model; output is gibberish but the pipeline must hold together)."""
    from whisper_finetune_tpu.models.decoding import transcribe_batch
    from whisper_finetune_tpu.tokenizer import get_tokenizer

    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=1500, n_audio_state=32, n_audio_head=2,
        n_audio_layer=1, n_vocab=51866, n_text_ctx=448, n_text_head=2,
        n_text_state=32, n_text_layer=1,
    )
    params = init_params(jax.random.PRNGKey(0), dims)
    tok = get_tokenizer(language="de", task="transcribe")
    audio = np.random.default_rng(0).standard_normal((2, 480000)).astype(np.float32) * 0.05
    texts = transcribe_batch(
        params, dims, audio, tok, fcfg=ForwardConfig(compute_dtype="float32"),
        max_len=12,
    )
    assert len(texts) == 2
    assert all(isinstance(t, str) for t in texts)


def test_transcribe_fallback_retries_only_failing_rows():
    """Temperature-fallback retry rungs gather the still-failing rows into a
    small bucket instead of re-decoding the full batch; the output list must
    still be complete for every row."""
    from whisper_finetune_tpu.models.decoding import transcribe_batch
    from whisper_finetune_tpu.tokenizer import get_tokenizer

    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=1500, n_audio_state=32, n_audio_head=2,
        n_audio_layer=1, n_vocab=51866, n_text_ctx=448, n_text_head=2,
        n_text_state=32, n_text_layer=1,
    )
    params = init_params(jax.random.PRNGKey(1), dims)
    tok = get_tokenizer(language="de", task="transcribe")
    audio = (
        np.random.default_rng(5).standard_normal((3, 480000)).astype(np.float32)
        * 0.05
    )
    # fail exactly the first evaluated row at rung 0 (patched compression
    # check): rung 1 must gather the single failing row into a 1-row bucket
    # and still fill every output slot
    import whisper_finetune_tpu.models.decoding as dec

    calls = {"n": 0}
    real_cr = dec._compression_ratio

    def fail_first(text):
        calls["n"] += 1
        return 1e9 if calls["n"] == 1 else real_cr(text)

    dec._compression_ratio, saved = fail_first, dec._compression_ratio
    try:
        texts = transcribe_batch(
            params, dims, audio, tok,
            fcfg=ForwardConfig(compute_dtype="float32"),
            max_len=8, temperatures=(0.0, 1.0),
            compression_ratio_threshold=2.4,
        )
    finally:
        dec._compression_ratio = saved
    assert len(texts) == 3 and all(isinstance(t, str) for t in texts)
    assert calls["n"] >= 4  # 3 rung-0 rows + at least the 1-row retry

    # threshold no row can fail: single rung, bucket path untouched
    texts2 = transcribe_batch(
        params, dims, audio, tok, fcfg=ForwardConfig(compute_dtype="float32"),
        max_len=8, temperatures=(0.0, 1.0), logprob_threshold=-1e9,
        compression_ratio_threshold=None,
    )
    assert len(texts2) == 3 and all(isinstance(t, str) for t in texts2)


def test_beam_size_one_equals_greedy():
    from whisper_finetune_tpu.models.decoding import beam_decode

    params = init_params(jax.random.PRNGKey(2), DIMS)
    rng = np.random.default_rng(2)
    mel = jnp.asarray(
        rng.standard_normal((2, DIMS.n_mels, DIMS.n_audio_ctx * 2)).astype(np.float32)
    )
    init = jnp.asarray(rng.integers(0, 64, (2, 3)).astype(np.int32))
    g_tok, _ = greedy_decode(params, mel, init, EOT, DIMS, FCFG, max_len=12)
    b_tok, _ = beam_decode(
        params, mel, init, EOT, DIMS, FCFG, max_len=12, beam_size=1
    )
    np.testing.assert_array_equal(np.asarray(b_tok), np.asarray(g_tok))


def test_beam_five_scores_at_least_greedy():
    from whisper_finetune_tpu.models.decoding import beam_decode

    params = init_params(jax.random.PRNGKey(3), DIMS)
    rng = np.random.default_rng(3)
    mel = jnp.asarray(
        rng.standard_normal((2, DIMS.n_mels, DIMS.n_audio_ctx * 2)).astype(np.float32)
    )
    init = jnp.asarray(rng.integers(0, 64, (2, 3)).astype(np.int32))
    _, g_lp = greedy_decode(params, mel, init, EOT, DIMS, FCFG, max_len=12)
    b_tok, b_lp = beam_decode(
        params, mel, init, EOT, DIMS, FCFG, max_len=12, beam_size=5
    )
    # beam keeps the greedy hypothesis in the beam, so the winner's average
    # log-prob can't be materially worse
    assert np.all(np.asarray(b_lp) >= np.asarray(g_lp) - 1e-4)
    assert b_tok.shape == (2, 9)


def test_temperature_sampling_reproducible_and_varied():
    params = init_params(jax.random.PRNGKey(4), DIMS)
    rng = np.random.default_rng(4)
    mel = jnp.asarray(
        rng.standard_normal((1, DIMS.n_mels, DIMS.n_audio_ctx * 2)).astype(np.float32)
    )
    init = jnp.asarray([[1, 2]], jnp.int32)
    a1, _ = greedy_decode(
        params, mel, init, EOT, DIMS, FCFG, max_len=16, temperature=1.0,
        rng=jax.random.PRNGKey(7),
    )
    a2, _ = greedy_decode(
        params, mel, init, EOT, DIMS, FCFG, max_len=16, temperature=1.0,
        rng=jax.random.PRNGKey(7),
    )
    b, _ = greedy_decode(
        params, mel, init, EOT, DIMS, FCFG, max_len=16, temperature=1.0,
        rng=jax.random.PRNGKey(8),
    )
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert not np.array_equal(np.asarray(a1), np.asarray(b))


def test_decode_eval_fcfg_keeps_attention_mix():
    """The decode-path encoder forward must carry the per-site attention
    mix (with attn_impl: auto the 1500-frame encoder is where the measured
    splash win lands) while stripping train-only features — the decoding
    twin of eval.evaluator.eval_forward_config."""
    from whisper_finetune_tpu.models import ForwardConfig
    from whisper_finetune_tpu.models.decoding import _eval_fcfg

    train = ForwardConfig(
        compute_dtype="bfloat16", remat_encoder=True, remat_decoder=True,
        stochastic_depth=0.2, dsa_apply=True, lora_scale=2.0,
        attn_impl="xla", attn_impl_encoder="splash", attn_impl_cross="splash",
    )
    out = _eval_fcfg(train)
    for f in ("compute_dtype", "lora_scale", "attn_impl",
              "attn_impl_encoder", "attn_impl_decoder", "attn_impl_cross"):
        assert getattr(out, f) == getattr(train, f), f
    assert out.enc_attn == "splash"
    assert not out.remat_encoder and not out.remat_decoder
    assert out.stochastic_depth == 0.0 and not out.dsa_apply
