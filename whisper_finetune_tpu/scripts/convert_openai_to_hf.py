"""Convert an OpenAI-format Whisper checkpoint to a HuggingFace Transformers
model directory.

Capability parity with the reference's convert_openai_to_hf.py: the
OpenAI<->HF key-rename map (:89-124), dims -> WhisperConfig (:194-210), tied
embeddings exposed as ``proj_out`` (:223-226), and multilinguality /
num_languages inference from the vocab size (:229-230). The reference's
SHA256-verified *download* (:134-169) lives in the model-IO layer instead
(models/checkpoint.py fetch_checkpoint, opt-in via WFT_ALLOW_DOWNLOAD):
this framework is offline-first and converts local checkpoints (its own
training outputs or any OpenAI-format ``.pt``).

Usage:
    python -m whisper_finetune_tpu.scripts.convert_openai_to_hf \
        --checkpoint path/to/model.pt --pytorch_dump_folder_path out_dir
"""

from __future__ import annotations

import argparse
from typing import Dict, Tuple

# vocab sizes: 51865 = multilingual v1/v2 (99 langs), 51866 = large-v3 family
# (+yue), 51864 = english-only.
_ENGLISH_VOCAB = 51864
_V3_VOCAB = 51866


def _rename_map(side: str) -> Dict[str, str]:
    """Per-block suffix renames, OpenAI -> HF."""
    table = {
        "attn.query": "self_attn.q_proj",
        "attn.key": "self_attn.k_proj",
        "attn.value": "self_attn.v_proj",
        "attn.out": "self_attn.out_proj",
        "attn_ln": "self_attn_layer_norm",
        "mlp.0": "fc1",
        "mlp.2": "fc2",
        "mlp_ln": "final_layer_norm",
    }
    if side == "decoder":
        table.update(
            {
                "cross_attn.query": "encoder_attn.q_proj",
                "cross_attn.key": "encoder_attn.k_proj",
                "cross_attn.value": "encoder_attn.v_proj",
                "cross_attn.out": "encoder_attn.out_proj",
                "cross_attn_ln": "encoder_attn_layer_norm",
            }
        )
    return table


def openai_to_hf_state_dict(state_dict: Dict) -> Dict:
    """Rename every OpenAI key into the HF ``model.*`` namespace."""
    top = {
        "encoder.conv1.weight": "model.encoder.conv1.weight",
        "encoder.conv1.bias": "model.encoder.conv1.bias",
        "encoder.conv2.weight": "model.encoder.conv2.weight",
        "encoder.conv2.bias": "model.encoder.conv2.bias",
        "encoder.positional_embedding": "model.encoder.embed_positions.weight",
        "encoder.ln_post.weight": "model.encoder.layer_norm.weight",
        "encoder.ln_post.bias": "model.encoder.layer_norm.bias",
        "decoder.token_embedding.weight": "model.decoder.embed_tokens.weight",
        "decoder.positional_embedding": "model.decoder.embed_positions.weight",
        "decoder.ln.weight": "model.decoder.layer_norm.weight",
        "decoder.ln.bias": "model.decoder.layer_norm.bias",
    }
    out = {}
    for key, value in state_dict.items():
        if key in top:
            out[top[key]] = value
            continue
        parts = key.split(".")
        if len(parts) >= 4 and parts[1] == "blocks":
            side, _, idx = parts[0], parts[1], parts[2]
            suffix = ".".join(parts[3:-1])
            tensor = parts[-1]
            renames = _rename_map(side)
            if suffix in renames:
                out[f"model.{side}.layers.{idx}.{renames[suffix]}.{tensor}"] = value
                continue
        raise KeyError(f"Unrecognized OpenAI checkpoint key: {key}")
    return out


def dims_to_config(dims: Dict):
    from transformers import WhisperConfig

    vocab = int(dims["n_vocab"])
    extra = {}
    if vocab <= 50257:  # miniature test models: defaults would be out of range
        extra = dict(
            pad_token_id=vocab - 1,
            bos_token_id=vocab - 1,
            eos_token_id=vocab - 1,
            decoder_start_token_id=vocab - 1,
            suppress_tokens=None,
            begin_suppress_tokens=None,
        )
    return WhisperConfig(
        **extra,
        vocab_size=vocab,
        num_mel_bins=int(dims["n_mels"]),
        d_model=int(dims["n_audio_state"]),
        encoder_layers=int(dims["n_audio_layer"]),
        encoder_attention_heads=int(dims["n_audio_head"]),
        encoder_ffn_dim=4 * int(dims["n_audio_state"]),
        decoder_layers=int(dims["n_text_layer"]),
        decoder_attention_heads=int(dims["n_text_head"]),
        decoder_ffn_dim=4 * int(dims["n_text_state"]),
        max_source_positions=int(dims["n_audio_ctx"]),
        max_target_positions=int(dims["n_text_ctx"]),
        activation_function="gelu",
    )


def infer_multilinguality(vocab_size: int) -> Tuple[bool, int]:
    """(is_multilingual, num_languages) from vocab size
    (reference convert_openai_to_hf.py:229-230)."""
    is_multilingual = vocab_size != _ENGLISH_VOCAB
    num_languages = 99 + (vocab_size - _V3_VOCAB + 1) if is_multilingual else 0
    return is_multilingual, max(num_languages, 0)


def build_generation_config(
    is_multilingual: bool,
    num_languages: int = 100,
    openai_version: str = None,
):
    """Generation config for the converted model (reference
    convert_openai_to_hf.py:52-80).

    The reference fetches the matching ``openai/whisper-*`` generation config
    from the Hub; we try the same repo-selection tree first (works with a
    warm HF cache or network), and fall back to synthesizing the config
    OFFLINE from the in-repo tokenizer: language/task token ids, suppress
    lists, and decoder start sequence are all derivable from the tokenizer
    assets, which is everything faster-whisper/HF ``generate`` needs.
    """
    import warnings

    from transformers import GenerationConfig

    if openai_version is not None:
        repo = f"openai/whisper-{openai_version}"
    elif not is_multilingual:
        repo = "openai/whisper-medium.en"
    elif num_languages < 100:
        repo = "openai/whisper-large-v2"
    else:
        repo = "openai/whisper-large-v3"

    try:
        # cache-only: offline-first (no 5x-retry network stalls); a warm HF
        # cache yields the official config, otherwise we synthesize below
        gen_cfg = GenerationConfig.from_pretrained(repo, local_files_only=True)
        if openai_version is None:
            gen_cfg.alignment_heads = None
            warnings.warn(
                "Alignment heads are only available for original OpenAI "
                "checkpoints; word-level timestamps need them set manually."
            )
        return gen_cfg
    except Exception:
        pass  # offline: synthesize below

    from whisper_finetune_tpu.tokenizer import LANGUAGES, get_tokenizer

    if not is_multilingual:
        # English-only models are outside this framework's training surface
        # (the reference always builds the multilingual tokenizer,
        # finetune.py:591); without the Hub config, ship a minimal one.
        warnings.warn(
            "Offline generation-config synthesis for English-only Whisper is "
            "minimal (no suppress lists); warm the HF cache for the official "
            "openai/whisper-medium.en config."
        )
        return GenerationConfig(max_length=448, is_multilingual=False)

    tok = get_tokenizer(multilingual=is_multilingual, task="transcribe")
    sp = tok.special_tokens
    langs = list(LANGUAGES)[: num_languages or 99]
    gen_cfg = GenerationConfig(
        max_length=448,
        begin_suppress_tokens=[220, sp["<|endoftext|>"]],
        bos_token_id=sp["<|endoftext|>"],
        eos_token_id=sp["<|endoftext|>"],
        pad_token_id=sp["<|endoftext|>"],
        decoder_start_token_id=sp["<|startoftranscript|>"],
        suppress_tokens=sorted(tok.non_speech_tokens),
        no_timestamps_token_id=sp["<|notimestamps|>"],
        prev_sot_token_id=sp["<|startofprev|>"],
        is_multilingual=is_multilingual,
        lang_to_id={
            f"<|{code}|>": sp[f"<|{code}|>"] for code in langs if f"<|{code}|>" in sp
        }
        if is_multilingual
        else None,
        task_to_id={
            "transcribe": sp["<|transcribe|>"],
            "translate": sp["<|translate|>"],
        }
        if is_multilingual
        else None,
        return_timestamps=False,
        alignment_heads=None,
    )
    return gen_cfg


def convert_openai_whisper_to_tfms(checkpoint_path: str, pytorch_dump_folder_path: str):
    """Load an OpenAI ``.pt``, build the HF model, save with save_pretrained."""
    import torch
    from transformers import WhisperForConditionalGeneration

    with open(checkpoint_path, "rb") as fp:
        ckpt = torch.load(fp, map_location="cpu")
    dims = ckpt["dims"]
    state_dict = ckpt["model_state_dict"]

    config = dims_to_config(dims)
    model = WhisperForConditionalGeneration(config)

    hf_state = openai_to_hf_state_dict(
        {k: v.float() if hasattr(v, "float") else torch.tensor(v) for k, v in state_dict.items()}
    )
    missing, unexpected = model.model.load_state_dict(
        {k[len("model."):]: v for k, v in hf_state.items()}, strict=False
    )
    if unexpected:
        raise RuntimeError(f"Unexpected keys during conversion: {unexpected}")
    allowed_missing = {"proj_out.weight"}
    if set(missing) - allowed_missing:
        raise RuntimeError(f"Missing keys during conversion: {missing}")
    # tied output projection (reference :223-226)
    model.proj_out.weight.data = hf_state["model.decoder.embed_tokens.weight"]

    is_multilingual, num_languages = infer_multilinguality(config.vocab_size)
    model.generation_config.is_multilingual = is_multilingual
    if config.vocab_size > 50257:  # real whisper vocabs only, not test minis
        try:
            model.generation_config = build_generation_config(
                is_multilingual, num_languages or 100
            )
        except Exception as exc:  # noqa: BLE001 - config stays usable without
            print(f"generation config synthesis skipped: {exc}")

    if pytorch_dump_folder_path:
        model.save_pretrained(pytorch_dump_folder_path)
    return model, is_multilingual, num_languages


if __name__ == "__main__":
    from whisper_finetune_tpu.utils import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True, help="OpenAI-format .pt path")
    parser.add_argument(
        "--pytorch_dump_folder_path", required=True, help="Output HF model dir"
    )
    args = parser.parse_args()
    convert_openai_whisper_to_tfms(args.checkpoint, args.pytorch_dump_folder_path)
    print(f"Converted {args.checkpoint} -> {args.pytorch_dump_folder_path}")
