"""LR schedules: the three transformers-style schedules the reference wires
up plus its two custom warmup-restarts variants
(reference src/whisper_finetune/model/scheduler.py:15-111,114-153).

Each factory returns a schedule function ``step -> multiplier`` (the base LR
is owned by the optimizer). Functions are written in jnp so they can live
inside the jitted optimizer chain (traced once per compile), and they accept
plain Python ints equally for host-side LR logging.

The "chill" plateau adds uniform noise each step; the reference draws from
the host ``random`` module (scheduler.py:66) — here it's a counter-keyed
``jax.random`` draw, deterministic given the step, same distribution.
"""

from __future__ import annotations

import math
from typing import Callable, Dict

import jax
import jax.numpy as jnp

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def linear_with_warmup(warmup_steps: int, train_steps: int) -> Schedule:
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / max(1.0, float(warmup_steps))
        decay = (train_steps - step) / max(1.0, float(train_steps - warmup_steps))
        return jnp.where(step < warmup_steps, warm, jnp.maximum(0.0, decay))

    return fn


def cosine_with_warmup(warmup_steps: int, train_steps: int, num_cycles: float = 0.5) -> Schedule:
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / max(1.0, float(warmup_steps))
        progress = (step - warmup_steps) / max(1.0, float(train_steps - warmup_steps))
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * 2.0 * num_cycles * progress))
        return jnp.where(step < warmup_steps, warm, jnp.maximum(0.0, cos))

    return fn


def cosine_with_hard_restarts(warmup_steps: int, train_steps: int, num_cycles: int = 1) -> Schedule:
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / max(1.0, float(warmup_steps))
        progress = (step - warmup_steps) / max(1.0, float(train_steps - warmup_steps))
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * ((num_cycles * progress) % 1.0)))
        val = jnp.where(progress >= 1.0, 0.0, jnp.maximum(0.0, cos))
        return jnp.where(step < warmup_steps, warm, val)

    return fn


def _restart_cycle_terms(step, warmup_steps: int, train_steps: int, num_cycles: int, gamma: float):
    step = jnp.asarray(step, jnp.float32)
    progress = (step - warmup_steps) / max(1.0, float(train_steps - warmup_steps))
    cycle_length = train_steps / num_cycles
    cycle = jnp.floor(step / cycle_length)
    max_lr = jnp.power(gamma, cycle)
    step_in_cycle = step % cycle_length
    cos = jnp.maximum(
        0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * ((num_cycles * progress) % 1.0))) * max_lr
    )
    return progress, cycle_length, cycle, max_lr, step_in_cycle, cos


def cosine_with_warmup_restarts(
    warmup_steps: int, train_steps: int, num_cycles: int = 1, gamma: float = 1.0
) -> Schedule:
    """Per-cycle warmup + gamma decay of the cycle's max LR
    (reference scheduler.py:15-34)."""

    def fn(step):
        progress, _, _, max_lr, step_in_cycle, cos = _restart_cycle_terms(
            step, warmup_steps, train_steps, num_cycles, gamma
        )
        warm = step_in_cycle / max(1.0, float(warmup_steps)) * max_lr
        val = jnp.where(step_in_cycle < warmup_steps, warm, cos)
        return jnp.where(progress >= 1.0, 0.0, val)

    return fn


def cosine_with_warmup_restarts_chill(
    warmup_steps: int,
    train_steps: int,
    num_cycles: int = 1,
    gamma: float = 1.0,
    chill_steps: int = 100,
    chill_range: float = 0.02,
) -> Schedule:
    """Warmup-restarts with a noisy "chill" plateau for the last
    ``chill_steps`` of every non-final cycle (reference scheduler.py:37-71):
    LR freezes at the value it had ``chill_steps - 10`` before the cycle end,
    jittered by U(-chill_range, +chill_range)."""

    def fn(step):
        progress, cycle_length, cycle, max_lr, step_in_cycle, cos = _restart_cycle_terms(
            step, warmup_steps, train_steps, num_cycles, gamma
        )
        warm = step_in_cycle / max(1.0, float(warmup_steps)) * max_lr

        last_normal_progress = (
            (cycle_length - chill_steps + 10) - warmup_steps
        ) / max(1.0, float(train_steps - warmup_steps))
        last_normal_lr = jnp.maximum(
            0.0,
            0.5
            * (1.0 + jnp.cos(jnp.pi * ((num_cycles * last_normal_progress) % 1.0)))
            * max_lr,
        )
        step_i = jnp.asarray(step, jnp.int32)
        noise = jax.random.uniform(
            jax.random.fold_in(jax.random.PRNGKey(0x5EED), step_i),
            minval=-chill_range,
            maxval=chill_range,
        )
        chill = last_normal_lr + noise

        in_chill = jnp.logical_and(
            (cycle_length - step_in_cycle) < chill_steps, cycle < num_cycles - 1
        )
        val = jnp.where(
            step_in_cycle < warmup_steps, warm, jnp.where(in_chill, chill, cos)
        )
        return jnp.where(progress >= 1.0, 0.0, val)

    return fn


def get_schedule(s_conf: Dict, train_steps: int) -> Schedule:
    """Factory mirroring the reference's ``get_scheduler`` dispatch
    (scheduler.py:114-153); returns a multiplier schedule."""
    stype = s_conf["type"]
    warmup = int(s_conf["warmup_steps"])
    if stype == "linear":
        return linear_with_warmup(warmup, train_steps)
    if stype == "cosine":
        return cosine_with_warmup(warmup, train_steps)
    if stype == "cosine_with_restarts":
        return cosine_with_hard_restarts(warmup, train_steps, int(s_conf["lr_num_cycles"]))
    if stype == "cosine_with_warmup_restarts":
        return cosine_with_warmup_restarts(
            warmup, train_steps, int(s_conf["lr_num_cycles"]), float(s_conf["lr_gamma"])
        )
    if stype == "cosine_with_warmup_restarts_chill":
        return cosine_with_warmup_restarts_chill(
            warmup,
            train_steps,
            int(s_conf["lr_num_cycles"]),
            float(s_conf["lr_gamma"]),
            int(s_conf["chill_steps"]),
            float(s_conf["chill_range"]),
        )
    raise ValueError(
        f"Unknown learning rate scheduler: {stype}. Must be linear, cosine, "
        "cosine_with_restarts, cosine_with_warmup_restarts or "
        "cosine_with_warmup_restarts_chill"
    )
