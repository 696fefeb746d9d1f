#!/bin/bash
# Submit a batch of configs as separate SLURM jobs (counterpart of the
# reference's multi_submit.sh).
#
# Usage: ./launchers/multi_submit.sh configs/experiments/*.yaml
set -euo pipefail

if [[ $# -eq 0 ]]; then
  echo "usage: $0 <config.yaml> [config.yaml ...]" >&2
  exit 1
fi

for config in "$@"; do
  if [[ ! -f "$config" ]]; then
    echo "skipping missing config: $config" >&2
    continue
  fi
  name="whisper_$(basename "$config" .yaml)"
  echo "Submitting $config as $name"
  sbatch --job-name="$name" launchers/tpu_sbatch.sh "$config"
done
