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
# orthogonalization (public Muon recipe), repeated every iteration.
_NS_COEFFS = (3.4445, -4.7750, 2.0315)
NS_STEPS = 5

# Per-iteration greedy-minimax quintic schedule ("polar express" style),
# derived numerically by tools/derive_ns_schedule.py: iteration k applies
# the odd quintic minimizing max |1 - p(x)| over the singular-value
# interval the previous iterations produced (starting from [1e-3, 1],
# with a 1.01 bf16 safety divisor and a hard 1.30 overshoot cap — the cap
# keeps every intermediate iterate inside the quintic convergence basin
# under bf16 rounding; the uncapped greedy schedule overshoots to ~1.97
# and diverges on spectra that fill the design interval). At 5+
# iterations this reaches a smaller orthogonality error than repeating
# _NS_COEFFS (1280x5120 iid: max|sigma-1| 0.14/0.011 at pe5/pe6 vs 0.32
# for classic at any count).
_PE_SCHEDULE = (
    (5.3671448113, -15.2922309232, 10.9057949056),
    (4.1577402765, -7.1124594575, 3.0569510747),
    (4.1071607176, -6.8699050053, 2.9332526953),
    (3.8987663420, -5.9290606752, 2.4575469723),
    (2.8015437046, -3.0300700692, 1.1251543513),
    (1.8932735009, -1.2956875927, 0.3923299763),
    (1.8748218094, -1.2747593096, 0.3900388892),
)


def _ns_coeff_table(steps: int, coeffs: str) -> jnp.ndarray:
    if coeffs == "classic":
        # reshape keeps steps=0 a valid (0, 3) scan input (a bare [] would
        # collapse to shape (0,) and break the scan body's unpacking)
        return jnp.asarray([_NS_COEFFS] * steps, jnp.float32).reshape(steps, 3)
    if coeffs == "polar_express":
        if steps > len(_PE_SCHEDULE):
            raise ValueError(
                f"polar_express schedule supports at most {len(_PE_SCHEDULE)} "
                f"iterations, got ns_steps={steps}"
            )
        return jnp.asarray(_PE_SCHEDULE[:steps], jnp.float32)
    raise ValueError(f"unknown ns_coeffs {coeffs!r} (classic | polar_express)")


def newton_schulz_orthogonalize(
    g: jnp.ndarray,
    steps: int = NS_STEPS,
    eps: float = 1e-7,
    coeffs: str = "classic",
) -> jnp.ndarray:
    """Approximately orthogonalize the last two axes of ``g`` (semi-orthogonal
    factor of its polar decomposition). Leading axes are batched. Compute in
    bf16 — batched matmuls, all MXU work. ``coeffs`` selects the iteration
    polynomial: "classic" repeats the public Muon quintic, "polar_express"
    walks the per-iteration minimax schedule (_PE_SCHEDULE)."""
    table = _ns_coeff_table(steps, coeffs)
    orig_dtype = g.dtype
    transpose = g.shape[-2] > g.shape[-1]
    x = jnp.swapaxes(g, -2, -1) if transpose else g
    x = x.astype(jnp.bfloat16)
    norm = jnp.sqrt(
        jnp.sum(x.astype(jnp.float32) ** 2, axis=(-2, -1), keepdims=True)
    )
    x = (x.astype(jnp.float32) / (norm + eps)).astype(jnp.bfloat16)

    def body(x, abc):
        a, b, c = abc[0], abc[1], abc[2]
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
        c = c.astype(jnp.bfloat16)
        xxt = jnp.matmul(x, jnp.swapaxes(x, -2, -1), preferred_element_type=jnp.bfloat16)
        bxx = b * xxt + c * jnp.matmul(xxt, xxt, preferred_element_type=jnp.bfloat16)
        x = a * x + jnp.matmul(bxx, x, preferred_element_type=jnp.bfloat16)
        return x, None

    x, _ = jax.lax.scan(body, x, table)
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
    ns_coeffs: str = "classic",
    match_adamw_update_rms: bool = True,
    match_factor: float = 0.2,
    stacked: bool = True,
    shard_axis: Optional[str] = None,
    shard_axis_size: int = 1,
    momentum_dtype: Optional[str] = None,
    chunk_temp_mb: Optional[float] = 128.0,
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

    ``momentum_dtype`` shrinks the momentum buffer: ``"bfloat16"`` stores it
    half-width, ``"int8"`` stores it blockwise-quantized (int8 codes +
    per-256-block fp32 absmax scales, the optim/quantized.py machinery) —
    a 3.9x state reduction. Muon is unusually tolerant of momentum
    rounding — Newton-Schulz only keeps the orthogonal factor of the
    update, discarding magnitudes — and state size is what decides whether
    the full large-v3 Muon flagship fits a single 16GB chip (measured:
    fp32 momentum overflows HBM by 1.8GB at batch 6; bf16 fits but leaves
    XLA so little headroom that the in-step update schedule collapses).

    ``chunk_temp_mb`` bounds the fp32 working set of one leaf's update: a
    stacked leaf whose whole-leaf fp32 temporaries would exceed the bound
    is processed by a ``lax.scan`` over slices of the layer axis (momentum
    dequant + NS + update per slice), so only one slice's temporaries are
    ever live. On large-v3 the (32, 1280, 5120) MLP leaves otherwise pin
    ~3.4 GB of fp32 temps each (g, m, upd, update out) — the difference
    between fitting and OOMing the one-chip update program. ``None``
    disables chunking. Numerics are unchanged: the int8 block grid (256
    elements, quantized.py BLOCK) aligns with every whisper matrix size,
    so per-slice quantization reproduces the whole-leaf blocks exactly.
    """
    from whisper_finetune_tpu.optim.quantized import (
        BLOCK,
        MIN_QUANT_SIZE,
        FusedGradientTransformation,
        _QMoment,
        dequantize_blockwise,
        quantize_blockwise,
    )

    use_q = momentum_dtype in ("int8", "int8_blockwise")
    store_dt = (
        jnp.dtype(momentum_dtype) if momentum_dtype and not use_q else None
    )

    def matrix_shape(leaf):
        return leaf.shape[1:] if stacked and leaf.ndim >= 3 else leaf.shape

    def _mom_zero(p):
        if use_q and p.size >= MIN_QUANT_SIZE:
            return _QMoment(*quantize_blockwise(jnp.zeros(p.shape, jnp.float32)))
        return jnp.zeros(p.shape, store_dt or p.dtype)

    def _mom_load(stored, like):
        if isinstance(stored, _QMoment):
            return dequantize_blockwise(stored.codes, stored.scale, like.shape)
        return stored.astype(like.dtype)

    def _mom_store(value, prev):
        # Structure-preserving (quantize iff the slot is quantized), so the
        # state pytree stays stable under ZeRO sharding.
        if isinstance(prev, _QMoment):
            return _QMoment(*quantize_blockwise(value))
        return value.astype(prev.dtype)

    def init_fn(params):
        mom = jax.tree_util.tree_map(_mom_zero, params)
        return MuonState(count=jnp.zeros((), jnp.int32), momentum=mom)

    def _walk(grads, state, params, g_scale, apply):
        """Shared per-leaf walk. ``apply=False`` returns optax updates;
        ``apply=True`` returns updated parameters directly (``p + update``
        computed per leaf, so no whole-tree fp32 updates buffer ever exists
        — measured 5.4 GB of XLA temps on large-v3 when the updates tree
        is handed to ``optax.apply_updates`` as a second phase, the
        difference between fitting and OOMing one 16 GB chip)."""
        count = state.count + 1
        lr = learning_rate(state.count) if callable(learning_rate) else learning_rate

        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        flat_m = treedef.flatten_up_to(state.momentum)
        flat_p = treedef.flatten_up_to(params)

        def leaf_math(g, m_s, p, shape):
            """fp32 momentum + Newton-Schulz + update for one leaf (or one
            layer-axis slice of a chunked leaf)."""
            # Upcast HERE (post-barrier, per slice): grads may arrive in the
            # train step's bf16 accumulator dtype (split-update handoff),
            # and a pre-loop whole-tree cast would hoist above the barriers
            # and materialize every leaf's fp32 copy at once.
            g = g.astype(jnp.float32)
            if g_scale is not None:
                g = g * g_scale
            m = momentum * _mom_load(m_s, g) + g
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
                o_local = newton_schulz_orthogonalize(
                    local, steps=ns_steps, coeffs=ns_coeffs
                )
                o = jax.lax.all_gather(o_local, shard_axis, axis=0, tiled=True)
            else:
                o = newton_schulz_orthogonalize(
                    upd, steps=ns_steps, coeffs=ns_coeffs
                )
            scale = muon_shape_scale(shape)
            eff_lr = lr * (
                rms_match_scale(shape, match_factor)
                if match_adamw_update_rms
                else 1.0
            )
            # Decoupled decay: wd is divided by the rms scale in the
            # reference groups, so lr_g * wd_g == lr * wd regardless.
            upd = -(eff_lr * scale) * o - (lr * weight_decay) * p
            return (p + upd if apply else upd), _mom_store(m, m_s)

        max_chunk_elems = (
            None if chunk_temp_mb is None else int(chunk_temp_mb * 1e6 / 4)
        )

        new_updates, new_mom = [], []
        for g, m_s, p in zip(flat_g, flat_m, flat_p):
            if new_updates:
                # Serialize per-leaf updates: tie this leaf's gradient to the
                # previous leaf's outputs (update AND stored momentum) with an
                # optimization barrier. Without it XLA schedules every leaf's
                # fp32 momentum-dequantize/NS temps concurrently — on
                # large-v3 that is several 800 MB live buffers at once, which
                # blows the 16 GB single-chip fit (measured: +511 MB OOM with
                # 2.1 GB of fragmentation) and forces a spill-heavy schedule.
                # Chained, only one leaf's temps are live at a time.
                g, _ = jax.lax.optimization_barrier(
                    (g, (new_updates[-1], new_mom[-1]))
                )
            shape = matrix_shape(g)
            sharded_leaf = (
                shard_axis is not None
                and shard_axis_size > 1
                and g.ndim >= 3
                and g.shape[0] % shard_axis_size == 0
            )
            per_layer = 1
            for d in shape:
                per_layer *= d
            layers_per_chunk = None
            if (
                max_chunk_elems is not None
                and stacked
                and not sharded_leaf
                and g.ndim >= 3
                and g.shape[0] * per_layer > max_chunk_elems
                and per_layer % BLOCK == 0
            ):
                layers_per_chunk = max(
                    1, min(g.shape[0], max_chunk_elems // per_layer)
                )
                while g.shape[0] % layers_per_chunk:
                    layers_per_chunk -= 1
            if layers_per_chunk is not None and layers_per_chunk < g.shape[0]:
                L = g.shape[0]
                n_chunk = L // layers_per_chunk
                g_c = g.reshape(n_chunk, layers_per_chunk, *g.shape[1:])
                p_c = p.reshape(n_chunk, layers_per_chunk, *p.shape[1:])
                if isinstance(m_s, _QMoment):
                    nb = m_s.codes.shape[0]
                    m_c = _QMoment(
                        m_s.codes.reshape(n_chunk, nb // n_chunk, BLOCK),
                        m_s.scale.reshape(n_chunk, nb // n_chunk, 1),
                    )
                else:
                    m_c = m_s.reshape(n_chunk, layers_per_chunk, *m_s.shape[1:])

                def chunk_body(carry, xs, shape=shape):
                    g_i, m_i, p_i = xs
                    u_i, nm_i = leaf_math(g_i, m_i, p_i, shape)
                    return carry, (u_i, nm_i)

                _, (u_c, nm_c) = jax.lax.scan(chunk_body, (), (g_c, m_c, p_c))
                new_updates.append(u_c.reshape(L, *g.shape[1:]))
                if isinstance(m_s, _QMoment):
                    new_mom.append(
                        _QMoment(
                            nm_c.codes.reshape(-1, BLOCK),
                            nm_c.scale.reshape(-1, 1),
                        )
                    )
                else:
                    new_mom.append(nm_c.reshape(L, *m_s.shape[1:]))
            else:
                u, nm = leaf_math(g, m_s, p, shape)
                new_updates.append(u)
                new_mom.append(nm)

        outs = jax.tree_util.tree_unflatten(treedef, new_updates)
        mom = jax.tree_util.tree_unflatten(treedef, new_mom)
        return outs, MuonState(count=count, momentum=mom)

    def update_fn(grads, state, params=None):
        if params is None:
            raise ValueError("scale_by_muon requires params (for weight decay)")
        return _walk(grads, state, params, g_scale=None, apply=False)

    def fused_apply(grads, state, params, g_scale=None):
        """One-pass update + apply (``FusedGradientTransformation``
        protocol): returns (new_params, new_state). Identical math to
        ``update_fn`` + ``optax.apply_updates`` — the per-leaf ``p + upd``
        is the same expression — but each leaf's fp32 update is consumed
        by its own apply before the next leaf starts, bounding XLA temps
        to one (chunked) leaf pipeline."""
        return _walk(grads, state, params, g_scale=g_scale, apply=True)

    return FusedGradientTransformation(init_fn, update_fn, fused_apply)
