"""Standalone evaluation CLI: score a checkpoint on validation datasets
without training.

The reference only evaluates inside the training loop; this exposes the same
multi-dataset evaluator (teacher-forced WER/CER/NLL/entropy/ECE with macro
averaging, eval/evaluator.py) as its own command — the round-2 WER-parity
harness: point it at a reference-produced ``.pt`` and the same datasets the
reference validated on, compare ``val/*`` numbers.

Usage:
    python -m whisper_finetune_tpu.scripts.evaluate \
        --checkpoint best_model.pt \
        --datasets data/debug_dataset [more ...] \
        [--names name1 ...] [--split validation] [--batch-size 16] [--select-n 100]
"""

from __future__ import annotations

import argparse
import json


def main(args) -> None:
    import jax

    from whisper_finetune_tpu.data import (
        BatchLoader,
        SampleBuilder,
        SampleDataset,
        process_dataset,
    )
    from whisper_finetune_tpu.eval import (
        evaluate_multiple_datasets,
        make_eval_step,
    )
    from whisper_finetune_tpu.models import ForwardConfig, load_model
    from whisper_finetune_tpu.parallel import get_data_mesh
    from whisper_finetune_tpu.tokenizer import get_tokenizer

    from whisper_finetune_tpu.ops.attention import resolve_auto_impls

    params, dims = load_model(args.checkpoint)
    tokenizer = get_tokenizer(multilingual=True, language=args.language, task="transcribe")
    # Same attention resolution as the training driver (finetune.py): on
    # TPU "auto" is the measured mix (encoder/cross splash — the
    # 1500-frame eval encoder is exactly where the splash win matters).
    attn_kwargs = (resolve_auto_impls() if args.attn_impl == "auto"
                   else {"attn_impl": args.attn_impl})
    fcfg = ForwardConfig(compute_dtype=args.dtype, **attn_kwargs)
    eval_step = make_eval_step(dims, fcfg, n_mels=dims.n_mels)
    mesh = get_data_mesh()

    names = args.names or [d.split("/")[-1] for d in args.datasets]
    builder = SampleBuilder(
        tokenizer, no_timestamp_training=True, prompt_use_rate=0.0,
        no_timestamps_rate=0.0,
    )
    loaders = {}
    for name, path in zip(names, args.datasets):
        hf = process_dataset([path], [args.select_n], args.split, [None])
        ds = SampleDataset(hf, builder)
        loader = BatchLoader(ds, batch_size=args.batch_size, shuffle=False)
        loaders[name] = (lambda l: (lambda: iter(l)))(loader)

    metrics, macro = evaluate_multiple_datasets(
        eval_step, params, loaders, tokenizer, mesh=mesh
    )
    result = {f"val/{m.dataset_name}_wer": m.wer for m in metrics}
    result.update({f"val/{k}": v for k, v in macro.items()})
    print(json.dumps(result, indent=2))


def cli() -> None:
    from whisper_finetune_tpu.utils import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser(description="Evaluate a checkpoint")
    parser.add_argument("--checkpoint", required=True,
                        help="OpenAI-format .pt path or preset name")
    parser.add_argument("--datasets", nargs="+", required=True)
    parser.add_argument("--names", nargs="*", default=None)
    parser.add_argument("--split", default="validation")
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--select-n", type=int, default=None)
    parser.add_argument("--language", default="de")
    parser.add_argument("--dtype", default="bfloat16")
    parser.add_argument("--attn-impl", default="auto",
                        help="xla | flash | splash | auto (measured TPU mix)")
    main(parser.parse_args())


if __name__ == "__main__":
    cli()
