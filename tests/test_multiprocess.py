"""Real 2-process data-parallel training + SPMD eval on CPU.

The reference demonstrably runs 4-GPU torchrun DDP (configs/
config_large_v3_best_muon_ddp4.yaml, README.md:54-63). This test launches the
ACTUAL multi-process path: two OS processes, jax.distributed.initialize over
localhost, 4 virtual CPU devices each (global mesh of 8), the full finetune
driver on configs/DEBUG_DDP.yaml — per-process ShardedSampler slices,
make_array_from_process_local_data batch assembly, SPMD mesh eval on all
processes, rank-0-only checkpointing — and checks the resulting loss curve
matches a single-process run of the same global configuration.

Gated behind WFT_RUN_MULTIPROC=1 (runs ~6 min on CPU); a committed log of a
passing run lives at docs/logs/multiprocess_2proc.log.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.environ.get("WFT_RUN_MULTIPROC"),
    reason="2-process e2e is slow; set WFT_RUN_MULTIPROC=1",
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_training(tmp_path, tag: str, num_processes: int, local_devices: int):
    """Run the finetune driver with the given process topology; returns the
    metrics.jsonl records of the run."""
    save_dir = os.path.join(str(tmp_path), tag)
    os.makedirs(save_dir, exist_ok=True)
    # identical global config: a world of 4 devices either way (1x4 vs 2x2 —
    # single-core CI hosts starve XLA's in-process collectives with more
    # device threads); trimmed to a few steps + 1 final eval, no loader
    # worker processes
    override = {
        "save_dir": save_dir,
        "wandb": {"enabled": False},
        "training": {"epochs": 1, "eval_steps": 1.0},
        "dataset": {
            "select_n_per_v_ds": [4],
            "batch_size_eval": 4,
            "train_num_workers": 0,
        },
    }
    driver = (
        "import json, sys, yaml\n"
        "import whisper_finetune_tpu.runtime as rt\n"
        "from whisper_finetune_tpu.config import validate_config\n"
        "from whisper_finetune_tpu.scripts.finetune import main\n"
        "cfg = yaml.safe_load(open('configs/DEBUG_DDP.yaml'))\n"
        f"override = json.loads({json.dumps(json.dumps(override))})\n"
        "for k, v in override.items():\n"
        "    if isinstance(v, dict):\n"
        "        cfg.setdefault(k, {}).update(v)\n"
        "    else:\n"
        "        cfg[k] = v\n"
        "main(cfg)\n"
    )

    port = _free_port()
    procs = []
    for pid in range(num_processes):
        env = dict(os.environ)
        env.update(
            {
                "JAX_PLATFORMS": "cpu",
                "XLA_FLAGS": (
                    f"--xla_force_host_platform_device_count={local_devices}"
                ),
                "PYTHONPATH": REPO,
                "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}"
                if num_processes > 1
                else "",
                "JAX_NUM_PROCESSES": str(num_processes),
                "JAX_PROCESS_ID": str(pid),
                # fresh compile cache shared across procs is fine
                "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_cache",
            }
        )
        if num_processes == 1:
            env.pop("JAX_COORDINATOR_ADDRESS")
        log = open(os.path.join(save_dir, f"proc{pid}.log"), "w")
        procs.append(
            (
                subprocess.Popen(
                    [sys.executable, "-c", driver],
                    cwd=REPO,
                    env=env,
                    stdout=log,
                    stderr=subprocess.STDOUT,
                ),
                log,
            )
        )
    rcs = []
    for p, log in procs:
        # cold XLA-CPU compiles of the train/eval graphs dominate on small
        # hosts; generous ceiling, warm-cache runs finish in minutes
        rcs.append(p.wait(timeout=5400))
        log.close()
    assert all(rc == 0 for rc in rcs), (
        f"{tag}: process exit codes {rcs}; see {save_dir}/proc*.log"
    )

    run_dirs = [
        d for d in os.listdir(save_dir)
        if os.path.isdir(os.path.join(save_dir, d))
    ]
    assert len(run_dirs) == 1, f"expected one run dir, got {run_dirs}"
    run_dir = os.path.join(save_dir, run_dirs[0])
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        records = [json.loads(line) for line in f]
    return run_dir, records


def test_two_process_training_matches_single_process(tmp_path):
    if not os.path.exists(os.path.join(REPO, "data", "debug_dataset")):
        subprocess.run(
            [sys.executable, "tools/make_debug_dataset.py"], cwd=REPO, check=True
        )

    run1, rec1 = _run_training(tmp_path, "single", 1, 4)
    run2, rec2 = _run_training(tmp_path, "double", 2, 2)

    losses1 = {r["_step"]: r["Train loss"] for r in rec1 if "Train loss" in r}
    losses2 = {r["_step"]: r["Train loss"] for r in rec2 if "Train loss" in r}
    assert losses1 and set(losses1) == set(losses2)
    # Same global batch composition (strided ShardedSampler) and same
    # per-device RNG folding; only the row->device assignment differs, so
    # losses agree to loose fp tolerance.
    for step in sorted(losses1):
        assert abs(losses1[step] - losses2[step]) < 0.05, (
            step, losses1[step], losses2[step]
        )

    # Mesh eval ran and produced the val namespace on rank 0 of both runs.
    assert any("val/macro_wer" in r for r in rec1)
    assert any("val/macro_wer" in r for r in rec2)
    # rank-0-only checkpointing
    assert os.path.exists(os.path.join(run2, "last_model.pt"))
