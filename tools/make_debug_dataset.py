"""Generate the tiny synthetic dataset backing configs/DEBUG.yaml.

The reference's DEBUG configs point at small HuggingFace hub datasets
(configs/DEBUG.yaml); this environment is offline, so the debug smoke test
uses a locally generated dataset with the same schema the data pipeline
expects: ``audio`` ({"array", "sampling_rate"}), ``text``, ``language``,
``prompt``. Audio is deterministic tone+noise; texts exercise plain text,
timestamps, prompts and an empty (no-speech) utterance.

Usage: python tools/make_debug_dataset.py [--out data/debug_dataset] [--n 32]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

TEXTS = [
    "das ist ein test",
    "guten morgen zürich",
    "wir fahren mit dem zug nach bern",
    "<|0.00|> heute scheint die sonne <|2.00|>",
    "die katze sitzt auf dem dach",
    "<|0.00|> erster teil <|1.00|><|1.50|>",  # partial-segment ending
    "",  # no-speech sample
    "es regnet schon den ganzen tag",
]


def make_split(n: int, seed: int):
    rng = np.random.default_rng(seed)
    rows = {"audio": [], "text": [], "language": [], "prompt": []}
    for i in range(n):
        dur = float(rng.uniform(1.0, 3.0))
        t = np.arange(int(dur * 16000)) / 16000.0
        freq = float(rng.uniform(80, 500))
        wave = 0.1 * np.sin(2 * np.pi * freq * t) + 0.01 * rng.standard_normal(len(t))
        rows["audio"].append(
            {"array": wave.astype(np.float32), "sampling_rate": 16000}
        )
        rows["text"].append(TEXTS[i % len(TEXTS)])
        rows["language"].append("de")
        rows["prompt"].append("vorheriger satz" if i % 3 == 0 else "")
    return rows


def main(out: str, n: int) -> None:
    import datasets

    dd = datasets.DatasetDict(
        {
            "train": datasets.Dataset.from_dict(make_split(n, seed=0)),
            "validation": datasets.Dataset.from_dict(make_split(max(n // 4, 4), seed=1)),
        }
    )
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    dd.save_to_disk(out)
    print(f"Wrote debug dataset ({n} train / {max(n // 4, 4)} val rows) to {out}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="data/debug_dataset")
    parser.add_argument("--n", type=int, default=32)
    args = parser.parse_args()
    main(args.out, args.n)
