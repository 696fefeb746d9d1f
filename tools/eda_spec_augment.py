"""SpecAugment / mel-spectrogram EDA — the reference's exploratory notebook
as a reproducible script.

Rebuilds what `_spec_tw_eda.ipynb` at the reference root does interactively
(load an example, compute the whisper log-mel, visualize time-warp /
frequency-mask / extremes-mask variants, check the normalized padding
value, and Griffin-Lim the warped mel back to audio) — against THIS
repo's on-device featurizer primitives (ops/spec_augment.py) and the
numpy/scipy mel inversion (data/inverse_mel.py) instead of
torchaudio/librosa.

Outputs, under --out (default /tmp/eda_spec_augment):
  panels.png   2x3 grid: original, time-warp, time+freq mask, extremes
               mask, deep-SpecAugment composition, and the mel of the
               Griffin-Lim round-trip
  original.wav / warped_roundtrip.wav   16 kHz mono
  stats printed to stdout (mel min/max per variant, the notebook's
  normalized padding-value arithmetic — cells 17-18)

Audio source: --dataset <path> (a datasets.load_from_disk dir, e.g.
data/debug_dataset made by tools/make_debug_dataset.py) or, absent that,
a synthesized harmonic sweep so the script runs with zero assets.

Usage: PYTHONPATH=/root/repo python tools/eda_spec_augment.py [--out DIR]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from whisper_finetune_tpu.utils import apply_platform_env

# EDA never needs the chip — force CPU (the axon profile exports
# JAX_PLATFORMS=axon, so setdefault would keep the TPU and contend with
# whatever training/bench run owns it).
os.environ["JAX_PLATFORMS"] = "cpu"
apply_platform_env()

import jax
import jax.numpy as jnp

from whisper_finetune_tpu.data.inverse_mel import inverse_mel_to_audio
from whisper_finetune_tpu.ops.mel import HOP_LENGTH, SAMPLE_RATE, log_mel_spectrogram
from whisper_finetune_tpu.ops.spec_augment import (
    extremes_freq_mask,
    time_and_freq_mask,
    time_warp,
)


def _load_example(dataset_path: str | None) -> np.ndarray:
    if dataset_path and os.path.isdir(dataset_path):
        import datasets

        ds = datasets.load_from_disk(dataset_path)
        if hasattr(ds, "keys"):  # DatasetDict — same pick as the notebook's ds[2]
            ds = ds[next(iter(ds.keys()))]
        return np.asarray(ds[2]["audio"]["array"], dtype=np.float32)
    # Synthetic stand-in: a harmonic series with a pitch sweep + noise floor,
    # rich enough that warp/mask structure is visible in the panels.
    t = np.arange(3 * SAMPLE_RATE) / SAMPLE_RATE
    f0 = 140.0 * 2.0 ** (t / 3.0)  # one octave over 3 s
    phase = 2.0 * np.pi * np.cumsum(f0) / SAMPLE_RATE
    wave = sum(0.4 / k * np.sin(k * phase) for k in (1, 2, 3, 5))
    wave += 0.01 * np.random.default_rng(0).standard_normal(len(t))
    return wave.astype(np.float32)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset", default="data/debug_dataset")
    parser.add_argument("--out", default="/tmp/eda_spec_augment")
    parser.add_argument("--n-mels", type=int, default=128)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    os.makedirs(args.out, exist_ok=True)

    audio = _load_example(args.dataset)
    mel = np.asarray(log_mel_spectrogram(jnp.asarray(audio), n_mels=args.n_mels))
    print(f"audio: {len(audio)} samples  mel: {mel.shape} "
          f"({mel.shape[1] * HOP_LENGTH / SAMPLE_RATE:.2f} s of frames)")

    # The notebook's padding-value arithmetic (cells 17-18): whisper's
    # log-mel floor is log10(1e-10) = -10 pre-normalization; after the
    # (x + 4) / 4 normalization the pad value is -1.5.
    pad_norm = (np.log10(1e-10) + 4.0) / 4.0
    print(f"normalized padding value: {pad_norm}  (notebook cell 18: -1.5)")

    key = jax.random.PRNGKey(args.seed)
    k_warp, k_mask, k_ext, k_deep = jax.random.split(key, 4)
    mb = jnp.asarray(mel)[None]  # batch of 1, like the featurizer sees it

    variants = {
        "original": mel,
        "time_warp W=80": np.asarray(time_warp(mb, k_warp, W=80))[0],
        "time+freq mask (100, 27)": np.asarray(
            time_and_freq_mask(mb, k_mask, 100, 27)
        )[0],
        "extremes mask (10, 40)": np.asarray(
            extremes_freq_mask(mb, k_ext, 10, 40)
        )[0],
        "composition (warp+masks)": np.asarray(
            time_and_freq_mask(
                extremes_freq_mask(time_warp(mb, k_warp, 80), k_ext, 10, 40),
                k_deep, 100, 27,
            )
        )[0],
    }
    for name, m in variants.items():
        print(f"  {name:28s} min={m.min():+.4f} max={m.max():+.4f}")

    # Griffin-Lim round trip of the warped mel (notebook cells 22-23).
    warped = variants["time_warp W=80"]
    rebuilt = inverse_mel_to_audio(warped, power=10)
    variants["round-trip mel (warped)"] = np.asarray(
        log_mel_spectrogram(
            jnp.asarray(np.pad(rebuilt, (0, max(0, len(audio) - len(rebuilt))))),
            n_mels=args.n_mels,
        )
    )

    from scipy.io import wavfile

    def _wav(path, wave):
        peak = float(np.max(np.abs(wave))) or 1.0
        wavfile.write(path, SAMPLE_RATE,
                      (wave / peak * 0.9 * 32767).astype(np.int16))

    _wav(os.path.join(args.out, "original.wav"), audio)
    _wav(os.path.join(args.out, "warped_roundtrip.wav"), rebuilt)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 3, figsize=(16, 7), constrained_layout=True)
    for ax, (name, m) in zip(axes.flat, variants.items()):
        im = ax.imshow(m, aspect="auto", origin="lower", cmap="viridis",
                       interpolation="nearest")
        ax.set_title(name, fontsize=10)
        fig.colorbar(im, ax=ax, shrink=0.8)
    panels = os.path.join(args.out, "panels.png")
    fig.savefig(panels, dpi=110)
    print(f"wrote {panels}, original.wav, warped_roundtrip.wav under {args.out}")


if __name__ == "__main__":
    main()
