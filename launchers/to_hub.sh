#!/bin/bash
# Bare hub-upload loop over exported model directories (counterpart of the
# reference's to_hu.sh huggingface-cli loop).
#
# Usage: ./launchers/to_hub.sh <repo-prefix> <dir> [dir ...]
set -euo pipefail

REPO_PREFIX="${1:?usage: $0 <repo-prefix> <dir> [dir ...]}"
shift

for dir in "$@"; do
  name="$(basename "$dir")"
  echo "Uploading $dir -> ${REPO_PREFIX}/${name}"
  huggingface-cli upload "${REPO_PREFIX}/${name}" "$dir" --repo-type model
done
