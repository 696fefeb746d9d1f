"""Root-cause probe for the ~98 s first-post-compile split-step call
(VERDICT r4 weak #5 / item 6).

Round 4 measured the large-v3 Muon flagship's call pattern as
98.5 / 7.16 / 7.18 s: the FIRST call after compilation returns is ~14x
steady state, then everything settles. The standing hypothesis is a
second executable build when the recycled zero_buf-output buffer first
feeds the accumulation program (train/step.py split_step: call 1 uses
make_grad_buf's fresh buffer, call 2+ use zero_buf(grads) whose
layout/provenance XLA chose).

This probe runs the split/manual step N times on the real chip and
attributes the time of every call:

  * per-call wall time, split into the accum and update phases
    (split_step.last_timing);
  * a count of XLA compilations per jitted function, captured from
    jax._src logging (so a device_accum recompile on call 2 is directly
    visible, distinguishing "second executable" from "backend warmup").

Default shape is the SMALL preset at accum 2 / batch 4 — cheap enough to
iterate; WFT_PRESET=large-v3 WFT_ACCUM=8 WFT_BATCH=6 reproduces the
flagship configuration exactly (several minutes of compile).

Env knobs:
    WFT_PRESET   model preset (default small)
    WFT_ACCUM    accumulation window (default 2)
    WFT_BATCH    per-device batch (default 4)
    WFT_CALLS    number of timed calls (default 5)
    WFT_TX       muon (default) | adamw8

Usage: PYTHONPATH=/root/repo python tools/probe_second_call.py
"""

import logging
import os
import re
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


class _CompileCounter(logging.Handler):
    """Counts 'Compiling jit(<name>)' and 'Finished XLA compilation of
    jit(<name>) in T sec' records from jax's dispatch/pxla loggers."""

    START = re.compile(r"Compiling (jit\([^)]*\))")
    DONE = re.compile(r"Finished XLA compilation of (jit\([^)]*\)) in ([0-9.]+)")

    def __init__(self):
        super().__init__()
        self.started = Counter()
        self.finished = []  # (name, seconds, wall-clock)

    def emit(self, record):
        msg = record.getMessage()
        m = self.START.search(msg)
        if m:
            self.started[m.group(1)] += 1
        m = self.DONE.search(msg)
        if m:
            self.finished.append((m.group(1), float(m.group(2)), time.time()))


def main():
    preset = os.environ.get("WFT_PRESET", "small")
    accum = int(os.environ.get("WFT_ACCUM", 2))
    batch = int(os.environ.get("WFT_BATCH", 4))
    calls = int(os.environ.get("WFT_CALLS", 5))
    tx_name = os.environ.get("WFT_TX", "muon")

    counter = _CompileCounter()
    for name in ("jax._src.dispatch", "jax._src.interpreters.pxla"):
        lg = logging.getLogger(name)
        lg.addHandler(counter)
        lg.setLevel(logging.DEBUG)
    jax.config.update("jax_log_compiles", True)

    import bench
    from whisper_finetune_tpu.models import (
        ForwardConfig, get_preset_dims, init_params,
    )
    from whisper_finetune_tpu.ops.attention import resolve_auto_impls
    from whisper_finetune_tpu.ops.spec_augment import FeaturizeConfig
    from whisper_finetune_tpu.parallel import get_data_mesh
    from whisper_finetune_tpu.train.step import (
        TrainState, make_train_step, partition_params,
    )

    dims = get_preset_dims(preset)
    params = init_params(jax.random.PRNGKey(0), dims)
    trainable, frozen = partition_params(params, None)
    if tx_name == "adamw8":
        from whisper_finetune_tpu.optim.quantized import adamw_8bit

        tx = adamw_8bit(2e-5, weight_decay=0.01)
    else:
        tx = bench._muon_flagship_tx(trainable)
    opt_state = tx.init(trainable)
    state = TrainState(trainable, frozen, opt_state, jnp.zeros((), jnp.int32))

    mesh = get_data_mesh()
    fcfg = ForwardConfig(
        compute_dtype="bfloat16", precast_weights=True,
        **dict(resolve_auto_impls()),
    )
    feat = FeaturizeConfig(n_mels=dims.n_mels, spec_augment=True, p=1.0)
    step_fn = make_train_step(
        mesh, dims, fcfg, tx, 0.1, feat_cfg=feat, max_grad_norm=1.0,
        accum_dtype="bfloat16", split_update=True,
        manual_backward=True, manual_precast=True,
    )
    rng = np.random.default_rng(0)
    data = {
        "audio": jnp.asarray(
            rng.standard_normal((accum, batch, 480000), np.float32) * 0.05
        ),
        "crop_frames": jnp.full((accum, batch), 3000, jnp.int32),
        "dec_input": jnp.asarray(
            rng.integers(0, dims.n_vocab, (accum, batch, 448), np.int64),
            jnp.int32,
        ),
        "dec_output": jnp.asarray(
            rng.integers(0, dims.n_vocab, (accum, batch, 448), np.int64),
            jnp.int32,
        ),
    }
    key = jax.random.PRNGKey(1)

    print(
        f"probe_second_call preset={preset} accum={accum} batch={batch}"
        f" tx={tx_name} calls={calls}",
        flush=True,
    )
    mark = len(counter.finished)
    for i in range(calls):
        t0 = time.time()
        state, loss = step_fn(state, data, key)
        dt = time.time() - t0
        new = counter.finished[mark:]
        mark = len(counter.finished)
        big = [(n, round(s, 1)) for n, s, _ in new if s > 0.5]
        timing = step_fn.last_timing or {}
        print(
            f"CALL {i}: wall={dt:.2f}s loss={loss:.3f} "
            f"accum_s={timing.get('accum_s', float('nan')):.2f} "
            f"update_s={timing.get('update_s', float('nan')):.2f} "
            f"compiles_during_call={big or 'none'}",
            flush=True,
        )
    print("COMPILE COUNTS (started):", flush=True)
    for name, n in counter.started.most_common():
        if n > 1 or "device" in name or "lambda" in name:
            print(f"  {name}: {n}", flush=True)


if __name__ == "__main__":
    main()
