"""Transcription CLI: decode audio files with a trained checkpoint.

On-TPU inference for quick checks of fine-tuned models (the reference
delegates all inference to the CT2/faster-whisper export; this runs the
framework's own KV-cached decoder, models/decoding.py — greedy by default,
beam search via --beam-size, with whisper's temperature fallback on
repetition-loop / low-confidence outputs). Audio is read
with scipy (wav) or numpy (raw f32 .npy), resampled to 16 kHz if needed, and
truncated/padded to the 30 s window.

Usage:
    python -m whisper_finetune_tpu.scripts.transcribe \
        --checkpoint best_model.pt audio1.wav audio2.wav [--language de]
"""

from __future__ import annotations

import argparse

import numpy as np


def load_audio(path: str, target_sr: int = 16000) -> np.ndarray:
    if path.endswith(".npy"):
        audio = np.load(path).astype(np.float32).reshape(-1)
        return audio
    from scipy.io import wavfile

    sr, data = wavfile.read(path)
    data = np.asarray(data, dtype=np.float32)
    if data.ndim > 1:
        data = data.mean(axis=1)
    if np.abs(data).max() > 1.5:  # integer-range wav
        data = data / 32768.0
    if sr != target_sr:
        idx = np.linspace(0, len(data) - 1, int(len(data) * target_sr / sr))
        data = np.interp(idx, np.arange(len(data)), data).astype(np.float32)
    return data


def main(args) -> None:
    from whisper_finetune_tpu.models import ForwardConfig, load_model
    from whisper_finetune_tpu.models.decoding import transcribe_batch
    from whisper_finetune_tpu.ops.attention import resolve_auto_impls
    from whisper_finetune_tpu.tokenizer import get_tokenizer

    params, dims = load_model(args.checkpoint)
    tokenizer = get_tokenizer(multilingual=True, language=args.language,
                              task="transcribe")

    batch = np.zeros((len(args.audio), 480000), np.float32)
    for i, path in enumerate(args.audio):
        audio = load_audio(path)[:480000]
        batch[i, : len(audio)] = audio

    # Same attention resolution as the training driver: on TPU "auto" is
    # the measured mix (encoder/cross splash); the decode loop itself uses
    # the KV-cached single-query path regardless.
    attn_kwargs = (resolve_auto_impls() if args.attn_impl == "auto"
                   else {"attn_impl": args.attn_impl})
    texts = transcribe_batch(
        params, dims, batch, tokenizer,
        fcfg=ForwardConfig(compute_dtype=args.dtype, **attn_kwargs),
        language=args.language, max_len=args.max_len,
        beam_size=args.beam_size,
        temperatures=tuple(args.temperatures),
        length_penalty=args.length_penalty,
    )
    for path, text in zip(args.audio, texts):
        print(f"{path}\t{text}")


def cli() -> None:
    from whisper_finetune_tpu.utils import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser(description="Transcribe audio files")
    parser.add_argument("audio", nargs="+", help="wav or .npy (f32 mono) files")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--language", default="de")
    parser.add_argument("--max-len", type=int, default=224)
    parser.add_argument("--dtype", default="bfloat16")
    parser.add_argument("--attn-impl", default="auto",
                        help="xla | flash | splash | auto (measured TPU mix)")
    parser.add_argument("--beam-size", type=int, default=None,
                        help="beam search width at temperature 0 (default greedy)")
    parser.add_argument("--temperatures", type=float, nargs="+",
                        default=[0.0, 0.2, 0.4, 0.6, 0.8, 1.0],
                        help="fallback temperature ladder")
    parser.add_argument("--length-penalty", type=float, default=None)
    main(parser.parse_args())


if __name__ == "__main__":
    cli()
