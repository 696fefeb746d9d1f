"""LoRA: low-rank adapters on the transformer block linears.

Capability parity with the reference's minLoRA-based subsystem
(src/whisper_finetune/model/lora.py): adapters on every block linear
(q/k/v/out, cross-attn q/k/v/out, mlp fc1/fc2 — the reference targets every
``whisper.model.Linear``, lora.py:46-68), encoder-only/decoder-only scoping
(lora.py:60-65), freeze-all-but-lora (lora.py:14-27), merge
``W += (alpha/rank) * B @ A`` and removal (lora.py:74-89), and the debug
statistics namespace (A/B norms, gradient norms, per-eval update deltas,
lora.py:127-288).

TPU-first shape: adapters are extra leaves *inside* the stacked block pytree
(``attn["q_w_lora"] = {"a": (L, in, r), "b": (L, r, out)}``), so the
per-layer effective weight ``W + scale * a @ b`` is materialized transiently
inside the scan body — two thin MXU matmuls per linear per layer, no
full-model weight copy, and gradients flow only to the (a, b) leaves because
everything else is partitioned out of the differentiated tree
(train/step.py:partition_params).

Dropout note: minLoRA drops entries of the input entering ``A`` per forward;
here the same expected masking is applied to A's input dimension (one mask
per layer per step, batch-shared) — identical in expectation, and exactly
equal for the dropout=0 configs the reference trains with.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

# Block-linear kernels that correspond to the reference's
# ``whisper.model.Linear`` instances (conv stem / embeddings excluded).
_ENCODER_TARGETS = [("attn", "q_w"), ("attn", "k_w"), ("attn", "v_w"), ("attn", "o_w"),
                    ("mlp", "fc1_w"), ("mlp", "fc2_w")]
_DECODER_TARGETS = _ENCODER_TARGETS + [
    ("cross_attn", "q_w"), ("cross_attn", "k_w"),
    ("cross_attn", "v_w"), ("cross_attn", "o_w"),
]

LORA_SUFFIX = "_lora"


def _init_adapter(key, n_layers: int, fan_in: int, fan_out: int, rank: int):
    # minLoRA init: A ~ kaiming-uniform (bound 1/sqrt(fan_in)), B = 0.
    bound = 1.0 / math.sqrt(fan_in)
    a = jax.random.uniform(
        key, (n_layers, fan_in, rank), jnp.float32, -bound, bound
    )
    b = jnp.zeros((n_layers, rank, fan_out), jnp.float32)
    return {"a": a, "b": b}


def apply_lora(
    params: Params,
    rank: int = 16,
    alpha: float = 32.0,
    dropout: float = 0.0,
    encoder_only: bool = False,
    decoder_only: bool = False,
    key: Optional[jax.Array] = None,
) -> Tuple[Params, Params]:
    """Inject adapter leaves and return (params, trainable_mask).

    The mask freezes every base parameter (reference
    ``disable_all_but_parametrized_grads``, lora.py:14-27).
    """
    if encoder_only and decoder_only:
        raise ValueError("encoder_only and decoder_only are mutually exclusive")
    if key is None:
        key = jax.random.PRNGKey(0)

    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy
    sides = []
    if not decoder_only:
        sides.append(("encoder", _ENCODER_TARGETS))
    if not encoder_only:
        sides.append(("decoder", _DECODER_TARGETS))

    keys = iter(jax.random.split(key, sum(len(t) for _, t in sides)))
    for side, targets in sides:
        blocks = params[side]["blocks"]
        for group, name in targets:
            w = blocks[group][name]
            n_layers, fan_in, fan_out = w.shape
            blocks[group][name + LORA_SUFFIX] = _init_adapter(
                next(keys), n_layers, fan_in, fan_out, rank
            )

    def mask_fn(path, leaf):
        return any(
            LORA_SUFFIX in str(getattr(e, "key", getattr(e, "name", "")))
            for e in path
        )

    mask = jax.tree_util.tree_map_with_path(mask_fn, params)
    return params, mask


def lora_scale(rank: int, alpha: float) -> float:
    return float(alpha) / float(rank)


def has_lora(params: Params) -> bool:
    return any(
        LORA_SUFFIX in str(jax.tree_util.keystr(path))
        for path, _ in jax.tree_util.tree_leaves_with_path(params)
    )


def materialize_block_lora(
    bp: Params,
    scale: float,
    dropout: float = 0.0,
    key: Optional[jax.Array] = None,
    train: bool = False,
) -> Params:
    """Inside the scan body: fold this layer's adapters into its kernels.

    ``bp`` holds one layer's params (leading layer axis already consumed by
    scan). Returns a new block dict whose kernels are ``W + scale * a @ b``;
    adapter leaves are dropped so downstream block code sees plain kernels.
    """
    out: Params = {}
    for group, sub in bp.items():
        if not isinstance(sub, dict):
            out[group] = sub
            continue
        new_sub = {}
        for name, leaf in sub.items():
            if name.endswith(LORA_SUFFIX):
                continue
            lora = sub.get(name + LORA_SUFFIX)
            if lora is None:
                new_sub[name] = leaf
            else:
                a = lora["a"]
                if train and dropout > 0.0 and key is not None:
                    key, sub_key = jax.random.split(key)
                    keep = jax.random.bernoulli(
                        sub_key, 1.0 - dropout, (a.shape[0], 1)
                    )
                    a = a * keep / (1.0 - dropout)
                delta = jnp.matmul(
                    a, lora["b"], preferred_element_type=jnp.float32
                )
                new_sub[name] = leaf + scale * delta
        out[group] = new_sub
    return out


def merge_lora(params: Params, rank: int, alpha: float) -> Params:
    """Permanently fold adapters into base weights and strip them
    (reference ``merge_lora``/``remove_parametrizations(leave_parametrized=
    True)``, lora.py:74-89). Operates on the stacked tree: one batched matmul
    per adapted kernel."""
    scale = lora_scale(rank, alpha)

    def walk(tree):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for name, leaf in tree.items():
            if isinstance(leaf, dict) and set(leaf) == {"a", "b"} and name.endswith(
                LORA_SUFFIX
            ):
                continue
            if isinstance(leaf, dict):
                out[name] = walk(leaf)
            else:
                lora = tree.get(name + LORA_SUFFIX)
                if isinstance(lora, dict) and set(lora) == {"a", "b"}:
                    delta = jnp.matmul(
                        lora["a"], lora["b"], preferred_element_type=jnp.float32
                    )
                    out[name] = leaf + scale * delta
                else:
                    out[name] = leaf
        return out

    return walk(params)


def remove_lora(params: Params) -> Params:
    """Strip adapters without merging (reference ``remove_lora``,
    lora.py:74-81)."""

    def walk(tree):
        if not isinstance(tree, dict):
            return tree
        return {
            k: walk(v)
            for k, v in tree.items()
            if not (k.endswith(LORA_SUFFIX) and isinstance(v, dict))
        }

    return walk(params)


# ---------------------------------------------------------------------------
# Debug statistics (reference lora.py:127-288)
# ---------------------------------------------------------------------------

def _lora_leaves(tree: Params) -> List[Tuple[str, jnp.ndarray]]:
    out = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        name = jax.tree_util.keystr(path)
        if LORA_SUFFIX in name:
            out.append((name, leaf))
    return out


def get_lora_param_stats(params: Params) -> Dict[str, float]:
    """Global A/B Frobenius norms and parameter counts
    (reference ``get_lora_param_stats``, lora.py:127-183)."""
    a_sq = b_sq = 0.0
    a_count = b_count = 0
    n_adapters = 0
    for name, leaf in _lora_leaves(params):
        arr = np.asarray(leaf, dtype=np.float64)
        if name.endswith("['a']"):
            a_sq += float((arr**2).sum())
            a_count += arr.size
            n_adapters += leaf.shape[0]  # stacked layer axis
        elif name.endswith("['b']"):
            b_sq += float((arr**2).sum())
            b_count += arr.size
    return {
        "lora_debug/num_adapters": n_adapters,
        "lora_debug/A_norm": math.sqrt(a_sq),
        "lora_debug/B_norm": math.sqrt(b_sq),
        "lora_debug/A_params": a_count,
        "lora_debug/B_params": b_count,
    }


def get_lora_grad_stats(grads: Params) -> Dict[str, float]:
    """Gradient norms over adapter leaves, captured after backward and before
    the update (reference ``log_lora_debug_info`` contract,
    model_utils.py:92-105)."""
    a_sq = b_sq = 0.0
    for name, leaf in _lora_leaves(grads):
        arr = np.asarray(leaf, dtype=np.float64)
        if name.endswith("['a']"):
            a_sq += float((arr**2).sum())
        elif name.endswith("['b']"):
            b_sq += float((arr**2).sum())
    return {
        "lora_debug/A_grad_norm": math.sqrt(a_sq),
        "lora_debug/B_grad_norm": math.sqrt(b_sq),
    }


class LoRAUpdateTracker:
    """Track ||ΔA|| / ||ΔB|| between snapshots (reference
    ``LoRAUpdateTracker``, lora.py:186-251): snapshot after each optimizer
    step at eval boundaries, report deltas vs the previous snapshot."""

    def __init__(self, params: Params):
        self._prev = self._snapshot(params)

    @staticmethod
    def _snapshot(params: Params) -> Dict[str, np.ndarray]:
        return {
            name: np.asarray(leaf, dtype=np.float32)
            for name, leaf in _lora_leaves(params)
        }

    def update_and_stats(self, params: Params) -> Dict[str, float]:
        cur = self._snapshot(params)
        a_sq = b_sq = 0.0
        for name, arr in cur.items():
            prev = self._prev.get(name)
            if prev is None:
                continue
            d = (arr.astype(np.float64) - prev.astype(np.float64)) ** 2
            if name.endswith("['a']"):
                a_sq += float(d.sum())
            elif name.endswith("['b']"):
                b_sq += float(d.sum())
        self._prev = cur
        return {
            "lora_debug/A_update_norm": math.sqrt(a_sq),
            "lora_debug/B_update_norm": math.sqrt(b_sq),
        }
