"""Blockwise 8-bit optimizer state (bitsandbytes-Adam8bit capability,
TPU-native).

The reference exposes ``optimizer.8bit: true`` via bitsandbytes' CUDA kernels
(reference src/whisper_finetune/model/optimizer.py:240-260). Here the same
capability is an optax transform: both Adam moments are stored as int8 with
per-block fp32 absmax scales (block 256, bnb's dynamic-quantization shape),
dequantize -> update -> requantize entirely inside the jitted step. Small
leaves stay fp32 (bnb's ``min_8bit_size`` behaviour) since quantizing tiny
gains/biases saves nothing and costs precision.

State memory per quantized leaf: 2 x (1 byte + 4/256 bytes) per parameter
instead of 2 x 4 bytes — a 3.9x optimizer-state reduction, which is what
makes full large-v3 fine-tuning fit a 16GB v5e chip.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Union, Callable, Any

import jax
import jax.numpy as jnp
import optax

BLOCK = 256
MIN_QUANT_SIZE = 4096


def _pad_len(n: int) -> int:
    return (n + BLOCK - 1) // BLOCK * BLOCK


def quantize_blockwise(x: jnp.ndarray):
    """fp32 array -> (int8 codes, per-block fp32 scales)."""
    flat = x.reshape(-1)
    padded = jnp.pad(flat, (0, _pad_len(flat.size) - flat.size))
    blocks = padded.reshape(-1, BLOCK)
    scale = jnp.max(jnp.abs(blocks), axis=1, keepdims=True) / 127.0
    safe = jnp.where(scale == 0, 1.0, scale)
    codes = jnp.clip(jnp.round(blocks / safe), -127, 127).astype(jnp.int8)
    return codes, scale.astype(jnp.float32)


def dequantize_blockwise(codes: jnp.ndarray, scale: jnp.ndarray, shape) -> jnp.ndarray:
    blocks = codes.astype(jnp.float32) * scale
    n = 1
    for d in shape:
        n *= d
    return blocks.reshape(-1)[:n].reshape(shape)


# Non-negative second moments need a *relative*-precision code: a linear
# absmax grid collapses small nu values to zero and the Adam denominator
# sqrt(nu)+eps then explodes (bitsandbytes solves this with its nonlinear
# "dynamic map"). We use a per-block log-scale codebook: 255 levels spanning
# six decades below the block max (~2.7% relative error), code 0 = exact 0.
_LOG_DECADES = 6.0
_LOG_LEVELS = 254.0


def quantize_log_blockwise(x: jnp.ndarray):
    """Non-negative fp32 array -> (uint8 codes, per-block fp32 scales)."""
    flat = x.reshape(-1)
    padded = jnp.pad(flat, (0, _pad_len(flat.size) - flat.size))
    blocks = padded.reshape(-1, BLOCK)
    scale = jnp.max(blocks, axis=1, keepdims=True)
    safe = jnp.where(scale == 0, 1.0, scale)
    r = jnp.clip(blocks / safe, 0.0, 1.0)
    logr = jnp.log10(jnp.maximum(r, 10.0 ** (-_LOG_DECADES)))
    codes = 1.0 + jnp.round((logr + _LOG_DECADES) / _LOG_DECADES * _LOG_LEVELS)
    codes = jnp.where(r == 0, 0.0, codes).astype(jnp.uint8)
    return codes, scale.astype(jnp.float32)


def dequantize_log_blockwise(codes: jnp.ndarray, scale: jnp.ndarray, shape) -> jnp.ndarray:
    q = codes.astype(jnp.float32)
    r = 10.0 ** ((q - 1.0) / _LOG_LEVELS * _LOG_DECADES - _LOG_DECADES)
    blocks = jnp.where(q == 0, 0.0, r) * scale
    n = 1
    for d in shape:
        n *= d
    return blocks.reshape(-1)[:n].reshape(shape)


class _QMoment(NamedTuple):
    codes: jnp.ndarray
    scale: jnp.ndarray


class ScaleByAdam8bitState(NamedTuple):
    count: jnp.ndarray
    mu: Any  # per-leaf: _QMoment or fp32 array (small leaves)
    nu: Any


def scale_by_adam_8bit(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    def _is_q(leaf) -> bool:
        return leaf.size >= MIN_QUANT_SIZE

    def _q_zero(leaf, log: bool):
        if not _is_q(leaf):
            return jnp.zeros_like(leaf, jnp.float32)
        quant = quantize_log_blockwise if log else quantize_blockwise
        return _QMoment(*quant(jnp.zeros(leaf.shape, jnp.float32)))

    def _load(stored, leaf, log: bool):
        if isinstance(stored, _QMoment):
            deq = dequantize_log_blockwise if log else dequantize_blockwise
            return deq(stored.codes, stored.scale, leaf.shape)
        return stored

    def _store(value, prev_state, log: bool):
        # Structure-preserving: quantize iff the existing state is quantized
        # (decided once at init on the full leaf). Keeps the state pytree
        # stable when the transform runs on parameter *shards* (ZeRO-1),
        # where the per-shard size may cross MIN_QUANT_SIZE.
        if isinstance(prev_state, _QMoment):
            quant = quantize_log_blockwise if log else quantize_blockwise
            return _QMoment(*quant(value))
        return value

    def init_fn(params):
        mu = jax.tree_util.tree_map(lambda p: _q_zero(p, False), params)
        nu = jax.tree_util.tree_map(lambda p: _q_zero(p, True), params)
        return ScaleByAdam8bitState(jnp.zeros((), jnp.int32), mu, nu)

    def update_fn(grads, state, params=None):
        count = state.count + 1

        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        flat_mu = treedef.flatten_up_to(state.mu)
        flat_nu = treedef.flatten_up_to(state.nu)

        new_updates, new_mu, new_nu = [], [], []
        c1 = 1 - b1 ** count.astype(jnp.float32)
        c2 = 1 - b2 ** count.astype(jnp.float32)
        for g, mu_s, nu_s in zip(flat_g, flat_mu, flat_nu):
            g32 = g.astype(jnp.float32)
            mu = b1 * _load(mu_s, g, False) + (1 - b1) * g32
            nu = b2 * _load(nu_s, g, True) + (1 - b2) * g32 * g32
            upd = (mu / c1) / (jnp.sqrt(nu / c2) + eps)
            new_updates.append(upd.astype(g.dtype))
            new_mu.append(_store(mu, mu_s, False))
            new_nu.append(_store(nu, nu_s, True))

        updates = jax.tree_util.tree_unflatten(treedef, new_updates)
        mu = jax.tree_util.tree_unflatten(treedef, new_mu)
        nu = jax.tree_util.tree_unflatten(treedef, new_nu)
        return updates, ScaleByAdam8bitState(count, mu, nu)

    return optax.GradientTransformation(init_fn, update_fn)


class FusedGradientTransformation(NamedTuple):
    """optax-duck-typed transform with an extra whole-update fast path.

    ``init``/``update`` are the standard optax pair (the unfused chain).
    ``fused_apply(grads, state, params, g_scale) -> (params, state)`` performs
    update + weight decay + LR + apply in ONE pass (a Pallas kernel per
    quantized leaf on TPU, ops/fused_adamw8.py) with identical math; the
    train step uses it when available.
    """

    init: Callable
    update: Callable
    fused_apply: Callable


def _make_fused_apply(
    learning_rate, b1: float, b2: float, eps: float, weight_decay: float
):
    schedule = learning_rate if callable(learning_rate) else None

    def _leaf_plain(p, g, mu, nu, lr, c1, c2, g_scale):
        g32 = g.astype(jnp.float32) * g_scale
        mu = b1 * mu + (1 - b1) * g32
        nu = b2 * nu + (1 - b2) * g32 * g32
        upd = (mu / c1) / (jnp.sqrt(nu / c2) + eps)
        return p - lr * (upd + weight_decay * p), mu, nu

    def fused_apply(grads, state, params, g_scale=None):
        s_adam, s_wd, s_lr = state
        count = s_adam.count + 1  # matches update_fn's increment exactly
        c1 = 1 - b1 ** count.astype(jnp.float32)
        c2 = 1 - b2 ** count.astype(jnp.float32)
        lr = (
            schedule(s_lr.count) if schedule is not None else learning_rate
        )
        lr = jnp.asarray(lr, jnp.float32)
        gs = (
            jnp.asarray(1.0, jnp.float32)
            if g_scale is None
            else g_scale.astype(jnp.float32)
        )
        interpret = jax.devices()[0].platform == "cpu"

        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        flat_p = treedef.flatten_up_to(params)
        flat_mu = treedef.flatten_up_to(s_adam.mu)
        flat_nu = treedef.flatten_up_to(s_adam.nu)

        new_p, new_mu, new_nu = [], [], []
        for p, g, mu_s, nu_s in zip(flat_p, flat_g, flat_mu, flat_nu):
            if isinstance(mu_s, _QMoment) and p.size % BLOCK == 0:
                from whisper_finetune_tpu.ops.fused_adamw8 import (
                    fused_adamw8_leaf,
                )

                p2, mc, ms, nc, ns = fused_adamw8_leaf(
                    p.reshape(-1, BLOCK).astype(jnp.float32),
                    g.reshape(-1, BLOCK),
                    mu_s.codes, mu_s.scale, nu_s.codes, nu_s.scale,
                    lr, c1, c2, gs,
                    b1=b1, b2=b2, eps=eps, wd=weight_decay,
                    interpret=interpret,
                )
                new_p.append(p2.reshape(p.shape))
                new_mu.append(_QMoment(mc, ms))
                new_nu.append(_QMoment(nc, ns))
            else:
                mu0 = _load(mu_s, p, False) if isinstance(mu_s, _QMoment) else mu_s
                nu0 = _load(nu_s, p, True) if isinstance(nu_s, _QMoment) else nu_s
                p2, mu, nu = _leaf_plain(p, g, mu0, nu0, lr, c1, c2, gs)
                new_p.append(p2)
                new_mu.append(
                    _QMoment(*quantize_blockwise(mu))
                    if isinstance(mu_s, _QMoment)
                    else mu
                )
                new_nu.append(
                    _QMoment(*quantize_log_blockwise(nu))
                    if isinstance(nu_s, _QMoment)
                    else nu
                )

        params_out = jax.tree_util.tree_unflatten(treedef, new_p)
        state_out = (
            ScaleByAdam8bitState(
                count,
                jax.tree_util.tree_unflatten(treedef, new_mu),
                jax.tree_util.tree_unflatten(treedef, new_nu),
            ),
            s_wd,
            optax.ScaleByScheduleState(optax.safe_increment(s_lr.count))
            if schedule is not None
            else s_lr,
        )
        return params_out, state_out

    return fused_apply


def _load(stored, leaf, log: bool):
    deq = dequantize_log_blockwise if log else dequantize_blockwise
    return deq(stored.codes, stored.scale, leaf.shape)


def adamw_8bit(
    learning_rate: Union[float, Callable],
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 1e-2,
) -> FusedGradientTransformation:
    chain = optax.chain(
        scale_by_adam_8bit(b1, b2, eps),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(learning_rate),
    )
    return FusedGradientTransformation(
        chain.init,
        chain.update,
        _make_fused_apply(learning_rate, b1, b2, eps, weight_decay),
    )


def adam_8bit(
    learning_rate: Union[float, Callable],
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    chain = []
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))  # coupled L2
    chain.extend(
        [scale_by_adam_8bit(b1, b2, eps), optax.scale_by_learning_rate(learning_rate)]
    )
    return optax.chain(*chain)
