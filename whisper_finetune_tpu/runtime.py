"""Distributed runtime + observability facade.

The reference centralizes torchrun/NCCL process-group state and rank-0-only
W&B calls in a module-global facade (reference src/whisper_finetune/runtime.py)
so call sites never check rank. We keep that design — it is a good
abstraction — but the backing runtime is single-controller JAX:

* multi-host initialization via ``jax.distributed.initialize()`` (driven by
  standard JAX coordinator env vars, or explicit args),
* ``IS_MAIN`` == ``jax.process_index() == 0``,
* barrier via a tiny blocking collective on all devices,
* metrics go to W&B when available *and* enabled, and always to a local
  JSONL file so runs are observable without any external service.

There is no DDP wrapper and no ``no_sync``: gradient accumulation and
cross-device averaging happen explicitly inside the jitted train step
(see whisper_finetune_tpu/train/step.py), which is the shard_map/pjit
equivalent of the reference's no_sync + bucketed allreduce
(reference runtime.py:116-119, finetune.py:698-705).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

RANK = 0
WORLD_SIZE = 1
IS_DISTRIBUTED = False
IS_MAIN = True

_wandb = None
_metrics_file = None
_initialized = False


def setup_distributed(coordinator_address: Optional[str] = None,
                      num_processes: Optional[int] = None,
                      process_id: Optional[int] = None) -> None:
    """Initialize multi-process JAX if requested via env/args.

    Single-process (the common case on one TPU host or under tests) needs no
    initialization at all. Multi-host runs either set the standard JAX
    coordinator variables or pass explicit arguments.
    """
    global RANK, WORLD_SIZE, IS_DISTRIBUTED, IS_MAIN, _initialized

    import jax

    env_coordinator = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    coordinator_address = coordinator_address or env_coordinator
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is not None and not _initialized:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )

    RANK = jax.process_index()
    WORLD_SIZE = jax.process_count()
    IS_DISTRIBUTED = WORLD_SIZE > 1
    IS_MAIN = RANK == 0
    _initialized = True


def is_main() -> bool:
    return IS_MAIN


def print_once(*args, **kwargs) -> None:
    if IS_MAIN:
        print(*args, **kwargs)


def barrier() -> None:
    """Block until all processes reach this point.

    Equivalent of ``dist.barrier`` (reference runtime.py:102-104). A tiny
    all-reduce across all global devices synchronizes every process.
    """
    if not IS_DISTRIBUTED:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("whisper_finetune_tpu_barrier")


def cleanup() -> None:
    global _metrics_file
    if _metrics_file is not None:
        try:
            _metrics_file.close()
        except Exception:
            pass
        _metrics_file = None


# ---------------------------------------------------------------------------
# Metrics facade: W&B when installed+enabled, local JSONL always (rank 0).
# ---------------------------------------------------------------------------

def setup_wandb(config: Optional[Dict[str, Any]] = None,
                metrics_dir: Optional[str] = None,
                **kwargs) -> None:
    """Start the metrics sinks on the main process.

    Mirrors the reference's rank-0-gated ``wandb.init`` facade
    (runtime.py:60-69); additionally opens ``metrics.jsonl`` in the run
    directory so metrics survive without any external service.
    """
    global _wandb, _metrics_file

    if not IS_MAIN:
        return

    mode = kwargs.get("mode")
    if mode != "disabled":
        try:
            import wandb

            wandb.init(config=config, **kwargs)
            _wandb = wandb
        except ImportError:
            print("wandb is not installed; logging metrics to local JSONL only.")
            _wandb = None

    if metrics_dir is None and config is not None:
        metrics_dir = config.get("save_dir")
    if metrics_dir:
        os.makedirs(metrics_dir, exist_ok=True)
        _metrics_file = open(os.path.join(metrics_dir, "metrics.jsonl"), "a")


def _is_histogram_record(value: Any) -> bool:
    return isinstance(value, dict) and value.get("_type") == "histogram"


def log(data: Dict[str, Any], step: Optional[int] = None) -> None:
    if not IS_MAIN:
        return
    if _wandb is not None:
        # histogram records (counts + edges) become real wandb.Histogram
        # panels — the wandb.watch(log="all") rendering
        wb = {
            k: (
                _wandb.Histogram(
                    np_histogram=(v["counts"], v["edges"])
                )
                if _is_histogram_record(v)
                else v
            )
            for k, v in data.items()
        }
        _wandb.log(wb, step=step)
    if _metrics_file is not None:
        record = {"_step": step, "_time": time.time()}
        record.update({k: _to_jsonable(v) for k, v in data.items()})
        _metrics_file.write(json.dumps(record) + "\n")
        _metrics_file.flush()


def _to_jsonable(value: Any) -> Any:
    try:
        json.dumps(value)
        return value
    except TypeError:
        try:
            return float(value)
        except (TypeError, ValueError):
            return str(value)


def watch(params, **kwargs) -> None:
    """wandb.watch(model, log="all") parity, implemented via the train loop
    rather than backward hooks (which are torch-module specific): the train
    step built with ``grad_hist_every`` returns per-module gradient
    histograms on eval steps, and the loop logs them as ``grads_hist/*``
    together with ``params_hist/*`` parameter histograms and ``params/*``
    norms (scripts/finetune.py). This function is therefore a no-op; it
    exists so reference-shaped call sites keep working."""


def save_wandb_file(path: str) -> None:
    if _wandb is not None:
        _wandb.save(path)


def update_wandb_config(data: Dict[str, Any], **kwargs) -> None:
    if _wandb is not None:
        _wandb.config.update(data, **kwargs)


def set_wandb_summary(key: str, value: Any) -> None:
    if _wandb is not None:
        _wandb.summary[key] = value


def finish_wandb() -> None:
    global _wandb
    if _wandb is not None:
        _wandb.finish()
        _wandb = None
    cleanup()
