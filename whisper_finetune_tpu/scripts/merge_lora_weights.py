"""Merge LoRA adapters into base weights: the offline deployment step.

CLI parity with the reference's merge_lora_weights.py (--input/--output/
--test_merge, :17-24): consumes an unmerged LoRA checkpoint (torch-parametrize
key layout — ours and the reference's produce the same names), folds
``W += (alpha/rank) * B @ A`` and writes an fp16 OpenAI-format checkpoint
that ``whisper.load_model`` / CT2 conversion accept.

Unlike the reference (which reloads the official large-v3 base and then the
checkpoint on top, merge_lora_weights.py:34-51), the base weights are already
inside the checkpoint's ``parametrizations.weight.original`` entries, so no
network or base-model access is needed.
"""

from __future__ import annotations

import argparse

import numpy as np


def main(input_path: str, output_path: str, test_merge: bool = False,
         rank: int = 16, alpha: float = 32.0) -> None:
    import jax

    from whisper_finetune_tpu.models.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )
    from whisper_finetune_tpu.models.lora import has_lora, merge_lora, remove_lora

    params, dims = load_checkpoint(input_path)
    if not has_lora(params):
        raise ValueError(
            f"{input_path} contains no LoRA adapters (nothing to merge)"
        )
    print(f"Loaded LoRA checkpoint {input_path} (dims: {dims.to_dict()})")

    merged = merge_lora(params, rank=rank, alpha=alpha)
    save_checkpoint(output_path, merged, dims)
    print(f"Merged model written to {output_path}")

    if test_merge:
        reloaded, dims2 = load_checkpoint(output_path)
        assert dims2 == dims
        assert not has_lora(reloaded), "merged checkpoint still has LoRA keys"
        base = remove_lora(params)
        changed = 0
        for (pa, pb) in zip(
            jax.tree_util.tree_leaves(reloaded), jax.tree_util.tree_leaves(base)
        ):
            if not np.allclose(np.asarray(pa), np.asarray(pb), atol=1e-6):
                changed += 1
        assert changed > 0, (
            "merged weights identical to base — adapters were all zero?"
        )
        print(f"Merge verified: {changed} parameter groups changed vs base.")


def cli() -> None:
    from whisper_finetune_tpu.utils import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser(description="Merge LoRA weights")
    parser.add_argument("--input", required=True, help="Unmerged LoRA checkpoint (.pt)")
    parser.add_argument("--output", required=True, help="Output merged checkpoint (.pt)")
    parser.add_argument("--test_merge", action="store_true",
                        help="Verify the merge changed weights and stripped adapters")
    parser.add_argument("--rank", type=int, default=16)
    parser.add_argument("--alpha", type=float, default=32.0)
    args = parser.parse_args()
    main(args.input, args.output, args.test_merge, args.rank, args.alpha)


if __name__ == "__main__":
    cli()
