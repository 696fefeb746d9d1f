"""The jitted training step: loss, gradient accumulation, data-parallel
gradient averaging, optimizer update — one compiled program.

Reference semantics being reproduced (src/whisper_finetune/model/model_utils.py:23-127):
one optimizer step = ``local_accum_grad_steps`` microbatches, each
contributing ``CE(logits, targets, label_smoothing, ignore -100) / accum``;
gradients sync across data-parallel workers exactly once per optimizer step
(the reference suppresses DDP allreduce with ``no_sync`` until the last
microbatch; here the accumulation loop is a ``lax.scan`` inside ``shard_map``
and the single sync is an explicit ``lax.pmean``); global-norm clipping before
the update; the scheduler advances once per step (folded into the optax
schedule by step count).

TPU-first design notes:
* There is no GradScaler/autocast — params are fp32, compute is bf16 via the
  model's precision policy, which is the AMP-parity configuration on TPU.
* Frozen parameters (LoRA, train_only_encoder/decoder; reference
  utils.py:138-140, lora.py:14-27) are *partitioned out* of the
  differentiated pytree rather than masked after the fact, so no gradient
  memory or backward FLOPs are spent on them.
* The whole step is donated: params and optimizer state update in place in
  HBM.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from whisper_finetune_tpu.models.dims import ModelDimensions
from whisper_finetune_tpu.models.whisper import ForwardConfig, forward_impl
from whisper_finetune_tpu.parallel.mesh import DATA_AXIS


def _step_compiler_options(explicit=None):
    """Per-program XLA compile options for the step programs.

    Precedence: the ``WFT_COMPILER_OPTIONS`` env JSON (e.g.
    ``{"xla_tpu_scoped_vmem_limit_kib": "65536"}``) overrides an
    ``explicit`` dict (``training.compiler_options`` in the YAML);
    ``None`` means compiler defaults.

    TPU scheduling/VMEM flags are per-program compile options, and only
    ``jit(compiler_options=...)`` reaches the axon remote compiler —
    ``XLA_FLAGS`` in the client env does not.
    ``xla_tpu_scoped_vmem_limit_kib=32768`` is a measured win on the
    primary large-v3 batch-8 step (1240 vs 1252-1287 ms across four
    runs; 65536 regresses ~5% — docs/perf_round5.md)."""
    import json as _json
    import os as _os

    raw = _os.environ.get("WFT_COMPILER_OPTIONS")
    if raw:
        return {str(k): str(v) for k, v in _json.loads(raw).items()}
    if explicit:
        return {str(k): str(v) for k, v in explicit.items()}
    return None

Params = Any
IGNORE_INDEX = -100


class TrainState(NamedTuple):
    trainable: Params  # leaves being optimized (None where frozen)
    frozen: Params  # leaves held fixed (None where trainable)
    opt_state: Any
    step: jnp.ndarray  # scalar int32


# ---------------------------------------------------------------------------
# Parameter partitioning (frozen vs trainable)
# ---------------------------------------------------------------------------

def partition_params(params: Params, trainable_mask: Optional[Params]):
    """Split params into (trainable, frozen) trees. ``trainable_mask`` is a
    congruent pytree of bools; None means everything trains. ``None`` leaves
    are empty pytree nodes in JAX, so gradients/optimizer state simply do not
    exist for frozen parameters."""
    if trainable_mask is None:
        return params, jax.tree_util.tree_map(lambda _: None, params)
    trainable = jax.tree_util.tree_map(
        lambda p, m: p if m else None, params, trainable_mask
    )
    frozen = jax.tree_util.tree_map(
        lambda p, m: None if m else p, params, trainable_mask
    )
    return trainable, frozen


def combine_params(trainable: Params, frozen: Params) -> Params:
    """Inverse of :func:`partition_params`."""
    return jax.tree_util.tree_map(
        lambda t, f: f if t is None else t,
        trainable,
        frozen,
        is_leaf=lambda x: x is None,
    )


# ---------------------------------------------------------------------------
# Loss
# ---------------------------------------------------------------------------

def _ce_forward(logits, targets, label_smoothing: float):
    """Reduction-form smoothed CE: ``-logp[target] = lse - logit[target]``
    and ``mean(-logp) = lse - mean(logits)``, so the loss needs only three
    row reductions over the logits (max, log-sum-exp, mean) and never
    materializes the fp32 log-softmax tree — on the flagship (B, 448,
    51866) that tree is ~1.1 GB written and re-read per microbatch."""
    mask = targets != IGNORE_INDEX
    safe_targets = jnp.where(mask, targets, 0)
    l32 = logits.astype(jnp.float32)
    m = jax.lax.stop_gradient(jnp.max(l32, axis=-1))
    lse = m + jnp.log(jnp.sum(jnp.exp(l32 - m[..., None]), axis=-1))
    l_t = jnp.take_along_axis(l32, safe_targets[..., None], axis=-1)[..., 0]
    nll = lse - l_t
    if label_smoothing > 0.0:
        smooth = lse - jnp.mean(l32, axis=-1)
        per_tok = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    else:
        per_tok = nll
    per_tok = jnp.where(mask, per_tok, 0.0)
    count = jnp.maximum(jnp.sum(mask), 1)
    loss = jnp.sum(per_tok) / count
    return loss, (mask, safe_targets, lse, count)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def cross_entropy_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    label_smoothing: float = 0.0,
) -> jnp.ndarray:
    """Label-smoothed cross entropy with ``-100`` ignore positions, numerics
    matching ``torch.nn.functional.cross_entropy(..., label_smoothing=s,
    ignore_index=-100)`` with mean reduction (reference model_utils.py:66).

    Custom VJP: the residuals are the (already-live) logits plus (B, T)
    row statistics — no vocab-sized tensor is saved between forward and
    backward (autodiff of ``log_softmax`` keeps the full fp32 ``logp``
    tree); the backward rebuilds the softmax in one fused elementwise pass
    ``exp(logits - lse)`` and folds the target/smoothing terms in place:
    ``d/dl_j = softmax_j - (1-s)·1[j=target] - s/V`` per unmasked token.
    """
    loss, _ = _ce_forward(logits, targets, label_smoothing)
    return loss


def _ce_fwd(logits, targets, label_smoothing: float):
    loss, (mask, safe_targets, lse, count) = _ce_forward(
        logits, targets, label_smoothing
    )
    return loss, (logits, mask, safe_targets, lse, count)


def _ce_bwd(label_smoothing: float, res, g):
    logits, mask, safe_targets, lse, count = res
    n_vocab = logits.shape[-1]
    coeff = (g * mask.astype(jnp.float32) / count)[..., None]
    l32 = logits.astype(jnp.float32)
    p = jnp.exp(l32 - lse[..., None])
    onehot = (
        jnp.arange(n_vocab, dtype=safe_targets.dtype) == safe_targets[..., None]
    ).astype(jnp.float32)
    dl = coeff * (
        p
        - (1.0 - label_smoothing) * onehot
        - (label_smoothing / n_vocab)
    )
    # Integer targets carry no tangent (float0 cotangent).
    dt = np.zeros(safe_targets.shape, dtype=jax.dtypes.float0)
    return dl.astype(logits.dtype), dt


cross_entropy_loss.defvjp(_ce_fwd, _ce_bwd)


# ---------------------------------------------------------------------------
# Gradient histograms (wandb.watch(log="all") analogue)
# ---------------------------------------------------------------------------

def _hist_groups(tree):
    """Group tree leaves by their top-two path keys ('encoder.blocks',
    'decoder.tok_emb', ...) — the same granularity as the params/* norm
    telemetry."""
    groups: Dict[str, list] = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if leaf is None:
            continue
        name = ".".join(
            p.key if hasattr(p, "key") else str(p) for p in path[:2]
        )
        groups.setdefault(name, []).append(leaf)
    return groups


def _leaf_histogram(leaf, lo, hi, bins: int):
    x = leaf.astype(jnp.float32).reshape(-1)
    span = jnp.maximum(hi - lo, 1e-12)
    idx = jnp.clip(((x - lo) / span * bins).astype(jnp.int32), 0, bins - 1)
    return jnp.zeros((bins,), jnp.int32).at[idx].add(1)


def grad_histograms(grads, bins: int, shard_flags=None, axis=None):
    """Per-module-group {name: (counts, lo, hi)} histograms of a gradient
    tree, computed entirely on device — the telemetry wandb.watch(model,
    log="all") produces from backward hooks in the reference
    (finetune.py:151). ``shard_flags`` is a congruent tree of Python bools
    marking leaves that are per-device ZeRO shards: their reductions are
    merged across ``axis`` (pmin/pmax for the range, psum for counts) so the
    result equals the histogram of the full gradient."""
    from functools import reduce

    flat, treedef = jax.tree_util.tree_flatten(grads)
    flat_flags = (
        treedef.flatten_up_to(shard_flags)
        if shard_flags is not None
        else [False] * len(flat)
    )
    flag_tree = jax.tree_util.tree_unflatten(treedef, flat_flags)

    grouped = _hist_groups(grads)
    grouped_flags = _hist_groups(flag_tree)
    out = {}
    for name, leaves in grouped.items():
        flags = grouped_flags[name]
        los, his, counts = [], [], None
        for leaf, sharded in zip(leaves, flags):
            l32 = leaf.astype(jnp.float32)
            lo, hi = jnp.min(l32), jnp.max(l32)
            if sharded:
                lo = jax.lax.pmin(lo, axis)
                hi = jax.lax.pmax(hi, axis)
            los.append(lo)
            his.append(hi)
        glo = reduce(jnp.minimum, los)
        ghi = reduce(jnp.maximum, his)
        for leaf, sharded in zip(leaves, flags):
            c = _leaf_histogram(leaf, glo, ghi, bins)
            if sharded:
                c = jax.lax.psum(c, axis)
            counts = c if counts is None else counts + c
        out[name] = (counts, glo, ghi)
    return out


def _zeros_histograms(grads, bins: int):
    return {
        name: (
            jnp.zeros((bins,), jnp.int32),
            jnp.zeros((), jnp.float32),
            jnp.zeros((), jnp.float32),
        )
        for name in _hist_groups(grads)
    }


# ---------------------------------------------------------------------------
# Train step factory
# ---------------------------------------------------------------------------

def _zero_shardable(leaf, n_dev: int) -> bool:
    """A leaf participates in ZeRO sharding iff its leading axis splits
    evenly over the data axis (stacked-layer weights, positional embeddings;
    token embeddings/convs stay replicated)."""
    return (
        hasattr(leaf, "ndim")
        and leaf.ndim >= 1
        and leaf.shape[0] >= n_dev
        and leaf.shape[0] % n_dev == 0
    )


def _zero_opt_partition_specs(opt_state, trainable, n_dev):
    """PartitionSpec tree for ZeRO-1 optimizer state: a state leaf shards
    over the data axis iff the PARAMETER it belongs to does.

    The association is by path suffix: moment trees mirror the parameter
    tree (``...mu.encoder.blocks.attn.w``, ``...momentum.decoder...``), so
    the longest state-path suffix that resolves to a parameter path
    identifies the owner. Deciding from the state leaf's own shape is
    wrong for blockwise-quantized state: a replicated parameter (leading
    axis not divisible by the axis size, e.g. large-v3's (3, 128, 1280)
    conv kernels) can still have a block count that divides it, and a
    sharded ``_QMoment`` next to a replicated parameter breaks the shard
    update. ``_QMoment`` is treated atomically — codes and scales shard
    together or not at all. State leaves with no owning parameter
    (schedule counts, scalars) replicate."""
    from whisper_finetune_tpu.optim.quantized import _QMoment

    p_index = {
        tuple(path): _zero_shardable(leaf, n_dev)
        for path, leaf in jax.tree_util.tree_flatten_with_path(trainable)[0]
    }

    def owner_shardable(spath) -> bool:
        for k in range(len(spath)):
            hit = p_index.get(tuple(spath[k:]))
            if hit is not None:
                return hit
        return False

    def spec_for(spath, leaf):
        if not owner_shardable(spath):
            return (
                _QMoment(P(), P()) if isinstance(leaf, _QMoment) else P()
            )
        if isinstance(leaf, _QMoment):
            return _QMoment(P(DATA_AXIS), P(DATA_AXIS))
        return P(DATA_AXIS) if _zero_shardable(leaf, n_dev) else P()

    flat, treedef = jax.tree_util.tree_flatten_with_path(
        opt_state, is_leaf=lambda x: isinstance(x, _QMoment)
    )
    return jax.tree_util.tree_unflatten(
        treedef, [spec_for(path, leaf) for path, leaf in flat]
    )


def zero_state_sharding(mesh: Mesh, state: TrainState) -> TrainState:
    """Per-leaf shardings for ZeRO-1: optimizer state distributed over the
    data axis (param-associated, see :func:`_zero_opt_partition_specs`),
    everything else replicated. Feed to ``jax.device_put`` and to
    ``make_train_step(..., zero_shard=True)``'s in/out specs."""
    n_dev = mesh.devices.size
    rep = NamedSharding(mesh, P())
    opt = jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec),
        _zero_opt_partition_specs(state.opt_state, state.trainable, n_dev),
    )
    return TrainState(
        trainable=jax.tree_util.tree_map(lambda _: rep, state.trainable),
        frozen=jax.tree_util.tree_map(lambda _: rep, state.frozen),
        opt_state=opt,
        step=rep,
    )


def make_train_step(
    mesh: Mesh,
    dims: ModelDimensions,
    fcfg: ForwardConfig,
    tx: optax.GradientTransformation,
    label_smoothing: float = 0.0,
    feat_cfg=None,
    max_grad_norm: Optional[float] = None,
    zero_shard: bool = False,
    zero_opt_state=None,
    zero_params=None,
    accum_dtype: Optional[str] = None,
    grad_hist_every: Optional[int] = None,
    grad_hist_bins: int = 64,
    split_update: bool = False,
    manual_backward: bool = False,
    manual_precast: bool = False,
    compiler_options: Optional[Dict[str, Any]] = None,
) -> Callable[[TrainState, Dict[str, jnp.ndarray], jnp.ndarray], tuple]:
    """Build the jitted data-parallel train step.

    Batch arrays are shaped ``(accum_local, global_batch, ...)`` with the
    global batch dimension sharded over the ``data`` mesh axis; each device
    scans its local microbatches, sums gradients, and one ``lax.pmean``
    produces the synchronized average — the reference's
    no_sync-until-last-microbatch + DDP allreduce collapsed into its minimal
    collective form.

    With ``feat_cfg`` set, batches carry raw ``audio`` + ``crop_frames`` and
    the fused log-mel + SpecAugment stage (ops/spec_augment.py) runs inside
    this same program, fusing into the encoder input; otherwise batches carry
    precomputed ``mel``.

    With ``grad_hist_every=N`` the step additionally returns a third output:
    per-module-group gradient histograms (``{name: (counts, lo, hi)}``,
    wandb.watch parity) computed on the synchronized pre-clip gradients on
    steps where ``(step+1) % N == 0`` and all-zero otherwise (a ``lax.cond``
    skips the work on other steps).

    ``zero_shard=True`` enables ZeRO-1: optimizer state lives sharded over
    the data axis (place the state with :func:`zero_state_sharding` first),
    each device updates only its shard of the parameters, and one
    ``all_gather`` reassembles the full update — optimizer memory drops by
    the data-parallel width, which is what fits full large-v3 fine-tuning on
    a v5e-8. Gradient clipping must then be requested via ``max_grad_norm``
    (not an optax.clip in ``tx``), so the norm is computed on full gradients
    before sharding.
    """

    def loss_fn(trainable, frozen, mb, rng):
        params = combine_params(trainable, frozen)
        if feat_cfg is not None:
            from whisper_finetune_tpu.ops.spec_augment import featurize_impl

            feat_rng, rng = jax.random.split(rng)
            mel = featurize_impl(
                mb["audio"], mb["crop_frames"], feat_rng, feat_cfg, train=True
            )
        else:
            mel = mb["mel"]
        logits = forward_impl(
            params, mel, mb["dec_input"], dims, fcfg, rng=rng, train=True
        )
        return cross_entropy_loss(logits, mb["dec_output"], label_smoothing)

    grad_fn = jax.value_and_grad(loss_fn)
    # Hand-written gradient-accumulating backward (train/manual_grad.py):
    # merges the per-microbatch cotangent tree and the gradient-sum buffer
    # into the one donated accumulator — the param-shaped-buffer diet that
    # fits the full large-v3 Muon flagship with real accum_grad_steps on a
    # 16 GB chip. Split mode only (it accumulates into the donated buffer);
    # full fine-tuning only (no frozen leaves / LoRA).
    manual_acc = None
    if manual_backward:
        if not split_update:
            raise ValueError("manual_backward requires split_update=True")
        from whisper_finetune_tpu.train.manual_grad import make_manual_accumulator

        manual_acc = make_manual_accumulator(
            dims,
            fcfg,
            lambda logits, targets: cross_entropy_loss(
                logits, targets, label_smoothing
            ),
            feat_cfg=feat_cfg,
            precast=manual_precast,
        )
    # One-pass fused update (adamw_8bit's Pallas kernel), used on the full
    # tree single-mesh and on each device's shard under ZeRO-1.
    fused_apply = getattr(tx, "fused_apply", None)
    data_keys = (
        ("audio", "crop_frames", "dec_input", "dec_output")
        if feat_cfg is not None
        else ("mel", "dec_input", "dec_output")
    )

    def accumulate(
        state: TrainState,
        batch: Dict[str, jnp.ndarray],
        rng: jnp.ndarray,
        grad_buf=None,
    ):
        """Scan the local microbatches; returns the per-device gradient sum
        (accumulator dtype) and the synchronized mean loss.

        ``grad_buf`` (optional) is a DONATED gradient-shaped tree whose
        content is dead: the accumulator carry initializes by zeroing it in
        place, so the scan runs inside the donated allocation and the final
        sums alias straight into the program output. Without it the carry
        and the output are two separate full-gradient allocations — the
        2.9 GB that decides whether the split-update accum program fits a
        16 GB chip next to the resident optimizer state."""
        accum_local = batch[data_keys[0]].shape[0]
        dev_rng = jax.random.fold_in(
            jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS)),
            state.step,
        )
        micro_rngs = jax.random.split(dev_rng, accum_local)

        if manual_acc is not None and grad_buf is not None:
            # Manual reverse-scan backward accumulating into the donated
            # buffer; requires the full tree (no frozen leaves).
            grad_sum, loss_sum = manual_acc(
                state.trainable, batch, micro_rngs, grad_buf
            )
            loss = jax.lax.pmean(loss_sum / accum_local, DATA_AXIS)
            return grad_sum, accum_local, loss

        # Optional reduced-precision gradient accumulator: halves the full
        # gradient tree in HBM (what gates single-chip full-model training);
        # per-microbatch grads are still computed in fp32.
        acc_dt = jnp.dtype(accum_dtype) if accum_dtype else None

        if accum_local == 1:
            # no accumulation: skip the zeros-init + add pass over the full
            # gradient tree (~12GB of HBM traffic for large-v3); the dtype
            # cast fuses into the gradient producers
            mb = {k: batch[k][0] for k in data_keys}
            loss_sum, grads = grad_fn(
                state.trainable, state.frozen, mb, micro_rngs[0]
            )
            if grad_buf is not None:
                # The donated buffer arrives PRE-ZEROED (split_step's
                # zero_buf program), so adding it routes the casts into the
                # donated allocation without changing the values — and XLA
                # cannot fold the add away because the zeros are runtime
                # data, keeping the dataflow (and with it the in-place
                # buffer reuse) intact.
                grad_sum = jax.tree_util.tree_map(
                    lambda b, g: b + (g.astype(acc_dt) if acc_dt else g),
                    grad_buf,
                    grads,
                )
            else:
                grad_sum = jax.tree_util.tree_map(
                    lambda g: g.astype(acc_dt) if acc_dt else g, grads
                )
        else:
            if grad_buf is not None:
                # The donated buffer arrives PRE-ZEROED (split_step zeroes
                # it in place in a separate tiny program after each update)
                # and becomes the scan carry directly — the straightest
                # dataflow for XLA to run the accumulation loop inside the
                # donated allocation and alias the final sums out.
                zero_grads = grad_buf
            else:
                zero_grads = jax.tree_util.tree_map(
                    lambda p: jnp.zeros(p.shape, acc_dt or p.dtype),
                    state.trainable,
                )

            def micro(carry, xs):
                grad_sum, loss_sum = carry
                mb, mrng = xs
                loss, grads = grad_fn(state.trainable, state.frozen, mb, mrng)
                grad_sum = jax.tree_util.tree_map(
                    lambda a, g: a + (g.astype(acc_dt) if acc_dt else g),
                    grad_sum,
                    grads,
                )
                return (grad_sum, loss_sum + loss), None

            (grad_sum, loss_sum), _ = jax.lax.scan(
                micro,
                (zero_grads, jnp.zeros((), jnp.float32)),
                ({k: batch[k] for k in data_keys}, micro_rngs),
            )

        loss = jax.lax.pmean(loss_sum / accum_local, DATA_AXIS)
        return grad_sum, accum_local, loss

    def reduce_sums(grad_sum, accum_local):
        """Cross-device reduction of the per-device gradient sums plus the
        fp32 scalar that turns sums into clipped means. The sums stay in the
        accumulator dtype UNTOUCHED on one device — the returned tree IS the
        scan carry, so no elementwise mean/clip pass over the full tree ever
        runs (in split mode the carry aliases straight into the accum
        program's output; the extra 2.9 GB live copy such a pass costs is
        what OOM'd the large-v3 Muon flagship). The mean divisor and the
        reference's clip_grad_norm factor (model_utils.py:107) both ride in
        the single returned scalar, applied in fp32 inside the fused update
        kernels."""
        if n_dev > 1:
            grad_sum = jax.tree_util.tree_map(
                lambda g: jax.lax.psum(g, DATA_AXIS), grad_sum
            )
        scale = jnp.float32(1.0) / (accum_local * n_dev)
        if max_grad_norm is not None:
            gnorm = (
                jnp.sqrt(
                    sum(
                        jnp.sum(jnp.square(g.astype(jnp.float32)))
                        for g in jax.tree_util.tree_leaves(grad_sum)
                    )
                )
                * scale
            )
            clip = jnp.minimum(1.0, max_grad_norm / (gnorm + 1e-6))
            return grad_sum, scale * clip, scale
        return grad_sum, scale, scale

    def scale_hist_ranges(hists, scale):
        # Histograms are computed on the raw gradient SUMS (no materialized
        # mean tree); counts are invariant under a positive scalar scale, so
        # multiplying the (lo, hi) ranges by 1/denominator yields exactly
        # the histograms of the mean gradients wandb.watch would log.
        return {
            name: (c, lo * scale, hi * scale)
            for name, (c, lo, hi) in hists.items()
        }

    def device_step(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jnp.ndarray):
        # Per-device view: batch leaves (accum_local, local_B, ...).
        grad_sum, accum_local, loss = accumulate(state, batch, rng)
        acc_dt = jnp.dtype(accum_dtype) if accum_dtype else None

        def maybe_hists(g, flags=None):
            # watch-parity gradient histograms, computed only on eval steps
            # (uniform predicate across the mesh, so the collectives inside
            # the taken branch stay collective)
            if not grad_hist_every:
                return None
            want = ((state.step + 1) % grad_hist_every) == 0
            return jax.lax.cond(
                want,
                lambda t: grad_histograms(t, grad_hist_bins, flags, DATA_AXIS),
                lambda t: _zeros_histograms(t, grad_hist_bins),
                g,
            )

        def pack(new_state, hists):
            if grad_hist_every:
                return new_state, loss, hists
            return new_state, loss

        if zero_shard and n_dev > 1:
            idx = jax.lax.axis_index(DATA_AXIS)

            def take_shard(leaf):
                per = leaf.shape[0] // n_dev
                return jax.lax.dynamic_slice_in_dim(leaf, idx * per, per)

            # ZeRO-1 comm shape: reduce_scatter gradients for sharded leaves
            # (each device receives only its averaged shard — half the bytes
            # of a full allreduce), pmean the rest.
            def reduce_to_shard(g):
                g = g / accum_local
                if _zero_shardable(g, n_dev):
                    g = (
                        jax.lax.psum_scatter(
                            g, DATA_AXIS, scatter_dimension=0, tiled=True
                        )
                        / n_dev
                    )
                else:
                    g = jax.lax.pmean(g, DATA_AXIS)
                return g.astype(jnp.float32) if acc_dt else g

            shard_grads = jax.tree_util.tree_map(reduce_to_shard, grad_sum)
            hists = maybe_hists(
                shard_grads,
                jax.tree_util.tree_map(
                    lambda p: bool(_zero_shardable(p, n_dev)), state.trainable
                ),
            )

            clip = None
            if max_grad_norm is not None:
                # Global norm reassembled from shards: sharded leaves sum
                # their local squares (psum'd), replicated leaves count once.
                sq_shard = sum(
                    jnp.sum(jnp.square(g))
                    for g, p in zip(
                        jax.tree_util.tree_leaves(shard_grads),
                        jax.tree_util.tree_leaves(state.trainable),
                    )
                    if _zero_shardable(p, n_dev)
                )
                sq_rep = sum(
                    jnp.sum(jnp.square(g))
                    for g, p in zip(
                        jax.tree_util.tree_leaves(shard_grads),
                        jax.tree_util.tree_leaves(state.trainable),
                    )
                    if not _zero_shardable(p, n_dev)
                )
                gnorm = jnp.sqrt(
                    jax.lax.psum(sq_shard, DATA_AXIS) + sq_rep
                )
                clip = jnp.minimum(1.0, max_grad_norm / (gnorm + 1e-6))

            shard_params = jax.tree_util.tree_map(
                lambda p: take_shard(p) if _zero_shardable(p, n_dev) else p,
                state.trainable,
            )

            def gather(leaf, param_full):
                if _zero_shardable(param_full, n_dev):
                    return jax.lax.all_gather(leaf, DATA_AXIS, axis=0, tiled=True)
                return leaf

            if fused_apply is not None:
                # One-pass fused update on each device's shard (the kernel is
                # shard-agnostic: ZeRO slices are contiguous on the leading
                # axis so codes/scales line up with the param slice); the
                # clip factor rides in as the kernel's g_scale scalar and the
                # all_gather reassembles *updated parameters* rather than
                # updates.
                shard_new, opt_state = fused_apply(
                    shard_grads, state.opt_state, shard_params, g_scale=clip
                )
                trainable = jax.tree_util.tree_map(
                    gather, shard_new, state.trainable
                )
                new_state = TrainState(
                    trainable=trainable,
                    frozen=state.frozen,
                    opt_state=opt_state,
                    step=state.step + 1,
                )
                return pack(new_state, hists)

            if clip is not None:
                shard_grads = jax.tree_util.tree_map(
                    lambda g: g * clip, shard_grads
                )
            shard_updates, opt_state = tx.update(
                shard_grads, state.opt_state, shard_params
            )
            updates = jax.tree_util.tree_map(
                gather, shard_updates, state.trainable
            )
        elif fused_apply is not None:
            # Fused path: the gradient SUMS stay in the accumulator dtype
            # and the mean divisor + clip factor ride into the one-pass
            # update kernels as a single fp32 scalar, so no mean/clip/cast
            # passes over the tree exist at all (same math as the
            # split-update path, so the two modes stay bit-comparable).
            grads, g_scale, scale = reduce_sums(grad_sum, accum_local)
            hists = maybe_hists(grads)
            if hists is not None:
                hists = scale_hist_ranges(hists, scale)
            trainable, opt_state = fused_apply(
                grads, state.opt_state, state.trainable, g_scale=g_scale
            )
            new_state = TrainState(
                trainable=trainable,
                frozen=state.frozen,
                opt_state=opt_state,
                step=state.step + 1,
            )
            return pack(new_state, hists)
        else:
            # One collective per optimizer step (the reference's bucketed
            # DDP allreduce collapsed to a single pmean).
            grads = jax.tree_util.tree_map(
                lambda g: (
                    jax.lax.pmean(g / accum_local, DATA_AXIS).astype(jnp.float32)
                    if acc_dt
                    else jax.lax.pmean(g / accum_local, DATA_AXIS)
                ),
                grad_sum,
            )
            hists = maybe_hists(grads)
            if max_grad_norm is not None:
                # torch.nn.utils.clip_grad_norm_ semantics
                # (model_utils.py:107), on full synchronized gradients.
                gnorm = optax.global_norm(grads)
                clip = jnp.minimum(1.0, max_grad_norm / (gnorm + 1e-6))
                grads = jax.tree_util.tree_map(lambda g: g * clip, grads)
            updates, opt_state = tx.update(grads, state.opt_state, state.trainable)

        trainable = optax.apply_updates(state.trainable, updates)
        new_state = TrainState(
            trainable=trainable,
            frozen=state.frozen,
            opt_state=opt_state,
            step=state.step + 1,
        )
        return pack(new_state, hists)

    n_dev = mesh.devices.size
    rep = P()
    batch_spec = {k: P(None, DATA_AXIS) for k in data_keys}

    state_spec = rep
    if zero_shard and n_dev > 1:
        if zero_opt_state is None or zero_params is None:
            raise ValueError(
                "zero_shard=True needs zero_opt_state AND zero_params (the "
                "optimizer-state and trainable pytrees, for param-associated "
                "per-leaf partition specs)"
            )
        opt_spec = _zero_opt_partition_specs(zero_opt_state, zero_params, n_dev)
        state_spec = TrainState(
            trainable=rep, frozen=rep, opt_state=opt_spec, step=rep
        )

    if split_update and not (zero_shard and n_dev > 1):
        # Two-program step: the accumulation fwd/bwd and the optimizer
        # update compile separately, so the update's per-leaf fp32 temps
        # never coexist with the fwd/bwd workspace + bf16 weight casts.
        # This is what fits the full large-v3 Muon flagship on one 16 GB
        # chip, and it sidesteps the pathological XLA schedule that made
        # the in-step Muon update ~7x slower than the same update compiled
        # alone. The handoff is the RAW gradient-sum carry in the
        # accumulator dtype (bf16 halves the bytes; the buffer is the scan
        # carry aliased into the program output — no mean/clip pass copies
        # the tree, see reduce_sums) plus one fp32 mean+clip scalar that
        # the update program applies per leaf inside its serialized
        # regions, so no whole-tree fp32 or scaled copy ever exists.
        def device_accum(state, batch, rng, grad_buf):
            # NO histogram computation in here: a lax.cond branch's temps
            # (per-leaf fp32 casts + elementwise int32 bin-index trees,
            # ~1 GB for the big decoder leaves) are reserved in the
            # program's peak even on off-steps, and the flagship accum
            # program has ~1.3 GiB headroom on a 16 GB chip — the
            # hist-in-cond variant OOM'd the real driver (chip_queue r5
            # e2e) while the hist-free bench fit. Histograms run as their
            # own program on hist steps only (hist_jit below); the
            # pre-clip mean scalar they need rides out as `scale`.
            grad_sum, accum_local, loss = accumulate(state, batch, rng, grad_buf)
            grads, g_scale, scale = reduce_sums(grad_sum, accum_local)
            return grads, g_scale, loss, scale

        def device_update(state, grads, g_scale):
            if fused_apply is not None:
                # One-pass update+apply: the mean/clip scalar folds into
                # each leaf's fp32 pipeline, and each leaf's update is
                # consumed by its own apply, so the program's temps are one
                # (chunked) leaf pipeline, not the whole fp32 updates tree.
                trainable, opt_state = fused_apply(
                    grads, state.opt_state, state.trainable, g_scale=g_scale
                )
                return TrainState(
                    trainable=trainable,
                    frozen=state.frozen,
                    opt_state=opt_state,
                    step=state.step + 1,
                )
            # Unfused fallback (transforms without a one-pass applier, e.g.
            # plain optax for LoRA trees): eager fp32 mean/clip tree — fine
            # at the small scales that take this path.
            grads = jax.tree_util.tree_map(
                lambda g: g.astype(jnp.float32) * g_scale, grads
            )
            updates, opt_state = tx.update(
                grads, state.opt_state, state.trainable
            )
            trainable = optax.apply_updates(state.trainable, updates)
            return TrainState(
                trainable=trainable,
                frozen=state.frozen,
                opt_state=opt_state,
                step=state.step + 1,
            )

        accum_jit = jax.jit(
            shard_map(
                device_accum,
                mesh=mesh,
                in_specs=(state_spec, batch_spec, rep, rep),
                out_specs=(rep, rep, rep, rep),
                check_vma=False,
            ),
            donate_argnums=(3,),
            compiler_options=_step_compiler_options(compiler_options),
        )
        # grads (arg 1) is NOT donated: its allocation is the persistent
        # accumulator buffer recycled into the next step's accum program.
        update_jit = jax.jit(
            shard_map(
                device_update,
                mesh=mesh,
                in_specs=(state_spec, rep, rep),
                out_specs=state_spec,
                check_vma=False,
            ),
            donate_argnums=(0,),
            compiler_options=_step_compiler_options(compiler_options),
        )

        rep_sharding = NamedSharding(mesh, rep)
        acc_dt_split = jnp.dtype(accum_dtype) if accum_dtype else None
        make_grad_buf = jax.jit(
            lambda t: jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, acc_dt_split or p.dtype), t
            ),
            out_shardings=rep_sharding,
        )
        # In-place zeroing of the recycled gradient allocation (donation
        # aliases each output to its same-shaped input buffer): the accum
        # program's scan carry initializes from the donated buffer DIRECTLY,
        # so the buffer must arrive pre-zeroed. One full write pass
        # (~11 ms for the 3 GB bf16 large-v3 tree) per step, in exchange
        # for never materializing a second gradient-tree allocation.
        zero_buf = jax.jit(
            lambda t: jax.tree_util.tree_map(jnp.zeros_like, t),
            donate_argnums=(0,),
        )
        # Gradient histograms as their OWN program, dispatched only on
        # actual hist steps (the host tracks the step counter, so no
        # lax.cond reserves hist temps inside the hot accum program). It
        # runs after the update retires, alone against the residents —
        # grads (arg 0) is read, not donated, and is recycled afterwards.
        hist_jit = None
        if grad_hist_every:

            def device_hists(grads, scale):
                h = grad_histograms(grads, grad_hist_bins, None, DATA_AXIS)
                return scale_hist_ranges(h, scale)

            hist_jit = jax.jit(
                shard_map(
                    device_hists,
                    mesh=mesh,
                    in_specs=(rep, rep),
                    out_specs=rep,
                    check_vma=False,
                )
            )

        def split_step(state, batch, rng):
            t0 = time.perf_counter()
            buf = split_step._grad_buf
            if buf is None:
                buf = make_grad_buf(state.trainable)
            split_step._grad_buf = None  # consumed (donated) below
            grads, g_scale, loss, mean_scale = accum_jit(state, batch, rng, buf)
            want_hists = False
            if grad_hist_every:
                if split_step._host_step is None:
                    # One scalar fetch, first call only — state.step is
                    # donated into update_jit below, so read it now.
                    split_step._host_step = int(state.step)
                want_hists = (
                    (split_step._host_step + 1) % grad_hist_every
                ) == 0
                split_step._host_step += 1
            # Retire the accumulation program before enqueueing the update
            # (and the update before returning, i.e. before the caller
            # enqueues the next accumulation): PjRt allocates a program's
            # temp workspace at ENQUEUE time, so under async dispatch the
            # two programs' workspaces coexist in HBM even though each fits
            # alone — the large-v3 Muon flagship OOMs at runtime with a
            # 14.6 GB compiled update peak. Fetching a scalar output forces
            # completion (block_until_ready can be lazy on the axon
            # backend; a literal fetch is not). Costs one host round-trip
            # per program — noise against a ~1 s step.
            loss = float(loss)
            t1 = time.perf_counter()
            new_state = update_jit(state, grads, g_scale)
            _ = int(new_state.step)
            t2 = time.perf_counter()
            hists = None
            if grad_hist_every:
                if want_hists:
                    hists = hist_jit(grads, mean_scale)
                    # Retire before zero_buf donates grads out from under it.
                    _ = float(next(iter(hists.values()))[1])
                else:
                    # Off steps are never read by the driver (it logs
                    # grads_hist/* only at eval steps) — reuse one cached
                    # host-side zeros record.
                    if split_step._zero_hists is None:
                        split_step._zero_hists = {
                            name: (
                                np.zeros((grad_hist_bins,), np.int32),
                                np.float32(0.0),
                                np.float32(0.0),
                            )
                            for name in _hist_groups(grads)
                        }
                    hists = split_step._zero_hists
            # Recycle the gradient allocation into the next accum program,
            # zeroed in place (the accum carry initializes from it as-is).
            split_step._grad_buf = zero_buf(grads)
            # Per-phase wall times of the LAST call, for the breakdown tool
            # (tools/bench_split_breakdown.py). accum_s includes the loss
            # fetch that retires the program; update_s likewise; zero
            # dispatch rides into the next step's accum_s.
            split_step.last_timing = {
                "accum_s": t1 - t0,
                "update_s": t2 - t1,
            }
            if grad_hist_every:
                return new_state, loss, hists
            return new_state, loss

        split_step._grad_buf = None
        split_step.last_timing = None
        split_step._host_step = None
        split_step._zero_hists = None

        # exposed for memory diagnostics (tools/bench_muon_update.py et al.)
        split_step.accum_jit = accum_jit
        split_step.update_jit = update_jit
        return split_step

    out_specs = (state_spec, rep, rep) if grad_hist_every else (state_spec, rep)
    sharded = shard_map(
        device_step,
        mesh=mesh,
        in_specs=(state_spec, batch_spec, rep),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(
        sharded, donate_argnums=(0,),
        compiler_options=_step_compiler_options(compiler_options),
    )


def shard_batch(mesh: Mesh, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Place a host batch onto the mesh with the global batch axis (axis 1)
    sharded over ``data`` — the input-pipeline replacement for the
    reference's DistributedSampler + H2D copy (finetune.py:620-627,
    model_utils.py:60-62).

    Multi-host: each process passes its ShardedSampler slice (the
    process-local portion of the global batch) and the pieces assemble into
    one global array."""
    sharding = NamedSharding(mesh, P(None, DATA_AXIS))
    if jax.process_count() > 1:
        return {
            k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
            for k, v in batch.items()
        }
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


