"""The driver's entry points must work on the virtual CPU mesh.

Round-1 regression: ``dryrun_multichip`` called ``jax.devices()`` without
forcing the CPU platform, so the axon TPU plugin handed it a single real chip
and the device-count assert fired (MULTICHIP_r01.json). These tests run both
entry points exactly as the driver does, on the conftest 8-device mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__ as graft_entry


def test_dryrun_multichip_8():
    # Conftest already provides 8 virtual CPU devices; _ensure_n_devices must
    # leave the initialized backend untouched and the step must run.
    graft_entry.dryrun_multichip(8)


def test_ensure_n_devices_noop_when_enough():
    before = jax.devices()
    graft_entry._ensure_n_devices(4)
    assert jax.devices() == before


def test_entry_fn_is_jittable_on_tiny_dims(monkeypatch):
    # entry() builds large-v3 (1.55B params) — too heavy for a CPU test — so
    # swap the preset for "tiny" and check the returned fn jits and runs.
    from whisper_finetune_tpu import models

    monkeypatch.setattr(
        models, "get_preset_dims", lambda name: models.MODEL_PRESETS["tiny"]
    )
    fn, args = graft_entry.entry()
    params, mel, tokens = args
    assert mel.shape[1] == 80 and tokens.shape == (1, 448)
    logits = jax.jit(fn)(params, mel, tokens)
    assert logits.shape == (1, 448, models.MODEL_PRESETS["tiny"].n_vocab)
    assert bool(jnp.isfinite(logits).all())
