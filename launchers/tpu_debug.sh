#!/bin/bash
# Short-QOS debug launcher (counterpart of the reference's sc_debug.sh):
# defaults to the DEBUG config on whatever accelerator is visible; force the
# CPU platform with an 8-device virtual mesh when no chip is attached.
#
# Usage: sbatch launchers/tpu_debug.sh [config.yaml]   (or run directly)
#SBATCH --job-name=whisper_debug
#SBATCH --time=00:30:00
#SBATCH --ntasks=1
#SBATCH --cpus-per-task=8

set -euo pipefail
CONFIG="${1:-configs/DEBUG.yaml}"

if [[ -f .env ]]; then
  set -a; source .env; set +a
fi

if [[ "${FORCE_CPU:-0}" == "1" ]]; then
  export JAX_PLATFORMS=cpu
  export XLA_FLAGS="--xla_force_host_platform_device_count=8 ${XLA_FLAGS:-}"
fi

python tools/make_debug_dataset.py --out data/debug_dataset
python -m whisper_finetune_tpu.scripts.finetune --config "$CONFIG"
