#!/bin/bash
# Production SLURM launcher for TPU training (counterpart of the reference's
# sc_sbatch.sh A100 launcher). One task drives every chip on the host — JAX
# is single-controller, so there is no torchrun/--nproc_per_node step: the
# train step shards over all visible devices automatically.
#
# Usage: sbatch launchers/tpu_sbatch.sh configs/config_large_v3_best_muon.yaml
#SBATCH --job-name=whisper_finetune_tpu
#SBATCH --time=168:00:00
#SBATCH --ntasks=1
#SBATCH --cpus-per-task=16
#SBATCH --mem-per-cpu=8G
# Select your site's TPU partition/queue here, e.g.:
##SBATCH --partition=tpu-v5e

set -euo pipefail

CONFIG="${1:?usage: sbatch tpu_sbatch.sh <config.yaml>}"

# Load per-user secrets / cache locations (HF_TOKEN, WANDB_*; see .env-template).
if [[ -f .env ]]; then
  set -a; source .env; set +a
fi

# Persistent XLA compilation cache: large-v3 compiles once per config shape.
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/jax_xla}"

echo "Launching on $(hostname): config=$CONFIG"
python -m whisper_finetune_tpu.scripts.finetune --config "$CONFIG"
