"""Batch variant of the packaging pipeline: fetch a list of checkpoints
(from W&B runs or local paths), convert each to HF + CTranslate2, and upload
to paired hub repos.

Counterpart of the reference's wandb_to_ct2_upload.py (:162-254): like it,
this script is driven by editing the constant lists in ``__main__`` (zipped
pairwise), reusing the single-model pipeline from upload_model_to_hub.py.
"""

from __future__ import annotations

import argparse
import os
from types import SimpleNamespace

from whisper_finetune_tpu.scripts.upload_model_to_hub import main as upload_main

# ---------------------------------------------------------------------------
# Edit these lists (zipped index-wise), or pass --pairs file.tsv with
# "<checkpoint-or-wandb-run>\t<repo-id>" lines.
# ---------------------------------------------------------------------------
SOURCES = [
    # "output/12345/best_model.pt",
    # "my-entity/my-project/run_id",
]
REPO_IDS = [
    # "my-org/whisper-large-v3-de",
]
QUANTIZATIONS = ["float16"]  # broadcast if length 1


def run_batch(sources, repo_ids, quantizations, workdir, local_only, convert_ct2):
    if len(quantizations) == 1:
        quantizations = quantizations * len(sources)
    if not (len(sources) == len(repo_ids) == len(quantizations)):
        raise ValueError(
            f"List lengths differ: {len(sources)} sources, {len(repo_ids)} "
            f"repos, {len(quantizations)} quantizations"
        )
    for src, repo, quant in zip(sources, repo_ids, quantizations):
        is_local = os.path.exists(src)
        args = SimpleNamespace(
            checkpoint=src if is_local else None,
            wandb_run=None if is_local else src,
            wandb_file="best_model.pt",
            repo_id=repo,
            workdir=workdir,
            convert_hf=True,
            convert_ct2=convert_ct2,
            quantization=quant,
            local_only=local_only,
            token=os.environ.get("HF_TOKEN"),
        )
        print(f"\n=== {src} -> {repo} ({quant}) ===")
        upload_main(args)


if __name__ == "__main__":
    from whisper_finetune_tpu.utils import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser(description="Batch checkpoint publishing")
    parser.add_argument("--pairs", help="TSV file: <source>\\t<repo-id> per line")
    parser.add_argument("--workdir", default="hub_upload")
    parser.add_argument("--local-only", action="store_true")
    parser.add_argument("--no-ct2", action="store_true")
    args = parser.parse_args()

    sources, repos = list(SOURCES), list(REPO_IDS)
    if args.pairs:
        with open(args.pairs) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                src, repo = line.split("\t")
                sources.append(src)
                repos.append(repo)
    if not sources:
        raise SystemExit("No sources configured (edit SOURCES or pass --pairs)")
    run_batch(sources, repos, QUANTIZATIONS, args.workdir, args.local_only,
              convert_ct2=not args.no_ct2)
