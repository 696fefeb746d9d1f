"""Attention implementations agree numerically (splash/flash run in Pallas
interpreter mode on the CPU test mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_finetune_tpu.ops.attention import (
    flash_fwd_xla_bwd,
    resolve_auto_impls,
    splash_mha,
    xla_mha,
)


def _qkv(Tq, Tk, B=2, H=2, D=16, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, H, Tq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, Tk, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, Tk, D)), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("Tq,Tk", [(64, 64), (48, 96)])  # 48/96 exercise padding
def test_splash_matches_xla(causal, Tq, Tk):
    if causal and Tq != Tk:
        pytest.skip("whisper uses causal only for self-attention")
    q, k, v = _qkv(Tq, Tk)
    scale = q.shape[-1] ** -0.5
    ref = xla_mha(q, k, v, causal=causal, sm_scale=scale)
    out = splash_mha(q, k, v, causal=causal, sm_scale=scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_splash_grads_match_xla():
    q, k, v = _qkv(64, 64)
    scale = q.shape[-1] ** -0.5

    def loss(fn, q, k, v):
        return jnp.sum(fn(q, k, v, causal=True, sm_scale=scale) ** 2)

    g_ref = jax.grad(lambda *a: loss(xla_mha, *a), argnums=(0, 1, 2))(q, k, v)
    g_spl = jax.grad(lambda *a: loss(splash_mha, *a), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_spl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_flash_fwd_xla_bwd_grads_match_xla():
    # The custom-vjp split must produce exactly the XLA backward.
    q, k, v = _qkv(64, 64)
    scale = q.shape[-1] ** -0.5

    def loss(fn, q, k, v):
        return jnp.sum(fn(q, k, v, causal=False, sm_scale=scale) ** 2)

    g_ref = jax.grad(lambda *a: loss(xla_mha, *a), argnums=(0, 1, 2))(q, k, v)
    g_mix = jax.grad(
        lambda *a: loss(flash_fwd_xla_bwd, *a), argnums=(0, 1, 2)
    )(q, k, v)
    for a, b in zip(g_mix, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_resolve_auto_impls_cpu():
    impls = resolve_auto_impls()
    assert impls == {"attn_impl": "xla"}  # conftest forces the CPU platform
