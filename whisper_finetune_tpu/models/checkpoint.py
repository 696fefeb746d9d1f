"""Checkpoint IO: OpenAI-whisper ``.pt`` format <-> JAX param pytrees.

The reference's whole model lifecycle rides on the OpenAI checkpoint dict
``{"model_state_dict": ..., "dims": ...}``: loading pretrained bases
(model_utils.py:330-379), saving best/step/last checkpoints in fp16
(model_utils.py:130-135), LoRA merging (merge_lora_weights.py) and the
HF/CTranslate2 deployment conversion (upload_model_to_hub.py). We keep that
format bit-for-bit so every downstream consumer (``whisper.load_model``,
faster-whisper, CT2 conversion) works on our outputs unchanged, while the
in-memory representation is the stacked-layer pytree of
:mod:`whisper_finetune_tpu.models.whisper`.

torch is used only here (CPU, for (de)serialization of the zipfile pickle
format); nothing in the compute path touches it.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from whisper_finetune_tpu.models.dims import ModelDimensions, get_preset_dims
from whisper_finetune_tpu.models.whisper import Params, sinusoids

# (our block-param path) -> (openai per-layer suffix, needs_transpose)
_BLOCK_MAP = [
    (("attn", "q_w"), "attn.query.weight", True),
    (("attn", "q_b"), "attn.query.bias", False),
    (("attn", "k_w"), "attn.key.weight", True),
    (("attn", "v_w"), "attn.value.weight", True),
    (("attn", "v_b"), "attn.value.bias", False),
    (("attn", "o_w"), "attn.out.weight", True),
    (("attn", "o_b"), "attn.out.bias", False),
    (("attn_ln", "scale"), "attn_ln.weight", False),
    (("attn_ln", "bias"), "attn_ln.bias", False),
    (("mlp", "fc1_w"), "mlp.0.weight", True),
    (("mlp", "fc1_b"), "mlp.0.bias", False),
    (("mlp", "fc2_w"), "mlp.2.weight", True),
    (("mlp", "fc2_b"), "mlp.2.bias", False),
    (("mlp_ln", "scale"), "mlp_ln.weight", False),
    (("mlp_ln", "bias"), "mlp_ln.bias", False),
]

_CROSS_MAP = [
    (("cross_attn", "q_w"), "cross_attn.query.weight", True),
    (("cross_attn", "q_b"), "cross_attn.query.bias", False),
    (("cross_attn", "k_w"), "cross_attn.key.weight", True),
    (("cross_attn", "v_w"), "cross_attn.value.weight", True),
    (("cross_attn", "v_b"), "cross_attn.value.bias", False),
    (("cross_attn", "o_w"), "cross_attn.out.weight", True),
    (("cross_attn", "o_b"), "cross_attn.out.bias", False),
    (("cross_attn_ln", "scale"), "cross_attn_ln.weight", False),
    (("cross_attn_ln", "bias"), "cross_attn_ln.bias", False),
]


def _get(tree: Dict[str, Any], path: Tuple[str, ...]):
    for k in path:
        tree = tree[k]
    return tree


def _set(tree: Dict[str, Any], path: Tuple[str, ...], value):
    for k in path[:-1]:
        tree = tree.setdefault(k, {})
    tree[path[-1]] = value


def _to_numpy(t) -> np.ndarray:
    if hasattr(t, "detach"):  # torch tensor
        return t.detach().to("cpu").float().numpy()
    return np.asarray(t, dtype=np.float32)


def state_dict_to_params(
    state_dict: Dict[str, Any], dims: ModelDimensions
) -> Params:
    """Convert an OpenAI-whisper state dict (torch tensors or numpy arrays)
    into the stacked-layer JAX pytree."""

    def grab(name: str, transpose: bool = False) -> jnp.ndarray:
        arr = _to_numpy(state_dict[name])
        if transpose:
            arr = arr.T
        return jnp.asarray(arr)

    params: Dict[str, Any] = {"encoder": {}, "decoder": {}}

    # conv weights: torch (out, in, k) -> ours (k, in, out)
    for conv in ("conv1", "conv2"):
        w = _to_numpy(state_dict[f"encoder.{conv}.weight"]).transpose(2, 1, 0)
        params["encoder"][conv] = {
            "w": jnp.asarray(w),
            "b": grab(f"encoder.{conv}.bias"),
        }
    params["encoder"]["ln_post"] = {
        "scale": grab("encoder.ln_post.weight"),
        "bias": grab("encoder.ln_post.bias"),
    }
    params["decoder"]["tok_emb"] = grab("decoder.token_embedding.weight")
    params["decoder"]["pos_emb"] = grab("decoder.positional_embedding")
    params["decoder"]["ln"] = {
        "scale": grab("decoder.ln.weight"),
        "bias": grab("decoder.ln.bias"),
    }

    for side, n_layers, maps in (
        ("encoder", dims.n_audio_layer, _BLOCK_MAP),
        ("decoder", dims.n_text_layer, _BLOCK_MAP + _CROSS_MAP),
    ):
        blocks: Dict[str, Any] = {}
        for path, suffix, transpose in maps:
            param_prefix = suffix[: -len(".weight")] if suffix.endswith(".weight") else None
            layers = []
            lora_a, lora_b = [], []
            for i in range(n_layers):
                key = f"{side}.blocks.{i}.{suffix}"
                if key in state_dict:
                    layers.append(_to_numpy(state_dict[key]))
                    continue
                # torch-parametrize / minLoRA layout (unmerged LoRA ckpt)
                base = f"{side}.blocks.{i}.{param_prefix}.parametrizations.weight"
                layers.append(_to_numpy(state_dict[f"{base}.original"]))
                lora_a.append(_to_numpy(state_dict[f"{base}.0.lora_A"]))
                lora_b.append(_to_numpy(state_dict[f"{base}.0.lora_B"]))
            stacked = np.stack(
                [a.T if transpose else a for a in layers], axis=0
            )
            _set(blocks, path, jnp.asarray(stacked))
            if lora_a:
                if len(lora_a) != n_layers:
                    raise ValueError(
                        f"Partial LoRA adapters for {side}.{suffix}: "
                        f"{len(lora_a)}/{n_layers} layers"
                    )
                _set(
                    blocks,
                    path[:-1] + (path[-1] + "_lora",),
                    {
                        # minLoRA: A (rank, in), B (out, rank); ours are the
                        # right-multiplication transposes.
                        "a": jnp.asarray(np.stack([a.T for a in lora_a])),
                        "b": jnp.asarray(np.stack([b.T for b in lora_b])),
                    },
                )
        params[side]["blocks"] = blocks

    return params


def params_to_state_dict(
    params: Params, dims: ModelDimensions, np_dtype=np.float16
) -> Dict[str, np.ndarray]:
    """Convert the JAX pytree back to an OpenAI-whisper state dict (numpy
    arrays; fp16 by default, matching the reference's ``save_model`` which
    halves before saving, model_utils.py:130-135).

    LoRA runs: unmerged adapters are written with torch-parametrize/minLoRA
    key names (``<linear>.parametrizations.weight.original`` +
    ``...weight.0.lora_A``/``lora_B``), so checkpoints interoperate with the
    reference's LoRA checkpoints and its merge CLI contract
    (merge_lora_weights.py:43-51)."""
    out: Dict[str, np.ndarray] = {}

    def put(name: str, arr, transpose: bool = False):
        a = np.asarray(arr, dtype=np.float32)
        if transpose:
            a = a.T
        out[name] = a.astype(np_dtype)

    enc, dec = params["encoder"], params["decoder"]
    for conv in ("conv1", "conv2"):
        put(f"encoder.{conv}.weight", np.asarray(enc[conv]["w"]).transpose(2, 1, 0))
        put(f"encoder.{conv}.bias", enc[conv]["b"])
    # Sinusoidal buffer is part of the official state dict.
    put(
        "encoder.positional_embedding",
        sinusoids(dims.n_audio_ctx, dims.n_audio_state),
    )
    put("encoder.ln_post.weight", enc["ln_post"]["scale"])
    put("encoder.ln_post.bias", enc["ln_post"]["bias"])
    put("decoder.token_embedding.weight", dec["tok_emb"])
    put("decoder.positional_embedding", dec["pos_emb"])
    put("decoder.ln.weight", dec["ln"]["scale"])
    put("decoder.ln.bias", dec["ln"]["bias"])

    for side, n_layers, maps in (
        ("encoder", dims.n_audio_layer, _BLOCK_MAP),
        ("decoder", dims.n_text_layer, _BLOCK_MAP + _CROSS_MAP),
    ):
        blocks = params[side]["blocks"]
        for path, suffix, transpose in maps:
            stacked = np.asarray(_get(blocks, path))
            lora = None
            try:
                lora = _get(blocks, path[:-1] + (path[-1] + "_lora",))
            except KeyError:
                pass
            for i in range(n_layers):
                if lora is None:
                    put(f"{side}.blocks.{i}.{suffix}", stacked[i], transpose=transpose)
                else:
                    prefix = suffix[: -len(".weight")]
                    base = f"{side}.blocks.{i}.{prefix}.parametrizations.weight"
                    put(f"{base}.original", stacked[i], transpose=transpose)
                    put(f"{base}.0.lora_A", np.asarray(lora["a"])[i], transpose=True)
                    put(f"{base}.0.lora_B", np.asarray(lora["b"])[i], transpose=True)

    return out


def load_checkpoint(path: str) -> Tuple[Params, ModelDimensions]:
    """Load an OpenAI-format ``.pt`` checkpoint file into (params, dims)."""
    import torch

    with open(path, "rb") as fp:
        ckpt = torch.load(fp, map_location="cpu")
    if "dims" not in ckpt or "model_state_dict" not in ckpt:
        raise ValueError(
            f"{path} is not an OpenAI-whisper checkpoint "
            "(missing 'dims'/'model_state_dict')"
        )
    dims = ModelDimensions.from_dict(ckpt["dims"])
    params = state_dict_to_params(ckpt["model_state_dict"], dims)
    return params, dims


def save_checkpoint(path: str, params: Params, dims: ModelDimensions) -> None:
    """Write ``{"model_state_dict", "dims"}`` in fp16, loadable by
    ``whisper.load_model`` (the reference's output contract)."""
    import torch

    params = jax.device_get(params)
    state = params_to_state_dict(params, dims)
    tensors = {k: torch.from_numpy(v.copy()) for k, v in state.items()}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    torch.save({"model_state_dict": tensors, "dims": dims.to_dict()}, path)


# Official OpenAI checkpoint digests (reference convert_openai_to_hf.py
# :37-50 embeds these as full URLs; the URL layout is
# <base>/<sha256>/<name>.pt, so only the digests are stored and the URL is
# derived). large-v3-turbo is not in the reference's table and is
# deliberately absent here — no unverifiable downloads.
_OFFICIAL_BASE_URL = "https://openaipublic.azureedge.net/main/whisper/models"
_OFFICIAL_SHA256 = {
    "tiny.en": "d3dd57d32accea0b295c96e26691aa14d8822fac7d9d27d5dc00b4ca2826dd03",
    "tiny": "65147644a518d12f04e32d6f3b26facc3f8dd46e5390956a9424a650c0ce22b9",
    "base.en": "25a8566e1d0c1e2231d1c762132cd20e0f96a85d16145c3a00adf5d1ac670ead",
    "base": "ed3a0b6b1c0edf879ad9b11b1af5a0e6ab5db9205f891f668f8b0e6c6326e34e",
    "small.en": "f953ad0fd29cacd07d5a9eda5624af0f6bcf2258be67c92b79389873d91e0872",
    "small": "9ecf779972d90ba49c06d968637d720dd632c55bbf19d441fb42bf17a411e794",
    "medium.en": "d7440d1dc186f76616474e0ff0b3b6b879abc9d1a4926b7adfa41db2d497ab4f",
    "medium": "345ae4da62f9b3d59415adc60127b97c714f32e89e936602e85993674d08dcb1",
    "large": "e4b87e7e0bf463eb8e6956e646f1e277e901512310def2c24bf0e11bd3c28e9a",
    "large-v2": "81f7c96c852ee8fc832187b0132e569d6c3065a3252ed18e56effd0b6a73e524",
    "large-v3": "e5b1a55b89c1367dacf97e3e19bfd829a01529dbfdeefa8caeb59b3f1b81dadb",
}


def _sha256_file(path: str) -> str:
    import hashlib

    digest = hashlib.sha256()
    with open(path, "rb") as fp:
        for chunk in iter(lambda: fp.read(1 << 20), b""):
            digest.update(chunk)
    return digest.hexdigest()


def fetch_checkpoint(name: str, root: str) -> str:
    """SHA256-verified download of an official OpenAI checkpoint into
    ``root`` and return its path (reference convert_openai_to_hf.py
    :134-169 behavior): a cached file whose digest matches is reused, a
    cached mismatch warns and re-downloads, and a post-download mismatch
    is a hard error. The base URL is overridable via
    ``WFT_CHECKPOINT_BASE_URL`` (tests point it at ``file://`` trees; the
    same knob serves internal mirrors)."""
    import urllib.request
    import warnings

    expected = _OFFICIAL_SHA256.get(name)
    if expected is None:
        raise ValueError(
            f"No official checkpoint digest for '{name}' "
            f"(available: {', '.join(sorted(_OFFICIAL_SHA256))})"
        )
    os.makedirs(root, exist_ok=True)
    target = os.path.join(root, f"{name}.pt")
    if os.path.exists(target) and not os.path.isfile(target):
        raise RuntimeError(f"{target} exists and is not a regular file")
    if os.path.isfile(target):
        if _sha256_file(target) == expected:
            return target
        warnings.warn(
            f"{target} exists, but the SHA256 checksum does not match; "
            "re-downloading"
        )
    base = os.environ.get("WFT_CHECKPOINT_BASE_URL", _OFFICIAL_BASE_URL)
    url = f"{base}/{expected}/{name}.pt"
    print(f"Downloading {url}")
    with urllib.request.urlopen(url) as source, open(target, "wb") as out:
        while True:
            buf = source.read(1 << 20)
            if not buf:
                break
            out.write(buf)
    if _sha256_file(target) != expected:
        raise RuntimeError(
            f"Downloaded {name}.pt but the SHA256 checksum does not match; "
            "retry the download."
        )
    return target


def load_model(name: str) -> Tuple[Params, ModelDimensions]:
    """Resolve a model by checkpoint path or preset name.

    The reference's ``whisper.load_model(name)`` downloads official weights;
    in this offline-first framework, a file path loads that checkpoint and a
    preset name (``tiny`` .. ``large-v3-turbo``) loads
    ``$WHISPER_CHECKPOINT_DIR/<name>.pt``. With ``WFT_ALLOW_DOWNLOAD=1`` a
    missing preset is fetched from the official distribution with SHA256
    verification (:func:`fetch_checkpoint`) into that directory (default
    ``~/.cache/whisper_finetune_tpu``).

    Missing pretrained weights are a HARD ERROR: silently fine-tuning a
    random init would burn a full run and produce garbage WER. Tests and
    deliberate from-scratch experiments opt in to random initialization with
    ``WFT_ALLOW_RANDOM_INIT=1``.
    """
    if os.path.isfile(name):
        return load_checkpoint(name)

    dims = get_preset_dims(name)
    if dims is None:
        raise ValueError(f"Unknown model name or missing checkpoint file: {name}")

    ckpt_dir = os.environ.get("WHISPER_CHECKPOINT_DIR")
    if ckpt_dir:
        candidate = os.path.join(ckpt_dir, f"{name}.pt")
        if os.path.isfile(candidate):
            return load_checkpoint(candidate)

    if os.environ.get("WFT_ALLOW_DOWNLOAD") and name in _OFFICIAL_SHA256:
        root = ckpt_dir or os.path.expanduser("~/.cache/whisper_finetune_tpu")
        return load_checkpoint(fetch_checkpoint(name, root))

    if not os.environ.get("WFT_ALLOW_RANDOM_INIT"):
        raise FileNotFoundError(
            f"No pretrained checkpoint for preset '{name}'. Point "
            f"WHISPER_CHECKPOINT_DIR at a directory containing {name}.pt "
            "(an OpenAI-format whisper checkpoint), pass an explicit "
            "checkpoint path as model.init_name, set WFT_ALLOW_DOWNLOAD=1 "
            "to fetch the official checkpoint (SHA256-verified), or set "
            "WFT_ALLOW_RANDOM_INIT=1 to deliberately train from random "
            "initialization."
        )

    from whisper_finetune_tpu.models.whisper import init_params

    print(
        f"No local checkpoint for '{name}'; initializing {name} architecture "
        "with random weights (WFT_ALLOW_RANDOM_INIT=1)."
    )
    params = init_params(jax.random.PRNGKey(0), dims)
    return params, dims
