"""HuggingFace-dataset loading and multi-dataset preparation.

Behavioural parity with the reference's dataset processing
(src/whisper_finetune/data/utils.py:14-377): local-vs-hub autodetection,
split fallback, ``sentence``/``sentence_de`` -> ``text`` renaming, synthetic
``language``/``prompt`` columns, language normalization against Whisper's
language tables, per-dataset language-tag filtering *before* sampling,
subsampling (plain without replacement; group-by stratified with replacement
when groups are small), ``large_string`` -> ``string`` casting for concat
compatibility, and optional per-dataset size reporting for the warmup
sampler.
"""

from __future__ import annotations

import warnings
from collections import defaultdict
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

from whisper_finetune_tpu.tokenizer.languages import LANGUAGES, TO_LANGUAGE_CODE


def load_hf_dataset(path_or_name: str, **kwargs):
    """Local directory -> ``load_from_disk``; anything else -> hub
    ``load_dataset`` (reference data/utils.py:14-38)."""
    from datasets import load_dataset, load_from_disk

    if Path(path_or_name).exists():
        print(f"Loading local dataset from: {path_or_name}")
        return load_from_disk(str(path_or_name))
    print(f"Loading remote dataset: {path_or_name}")
    return load_dataset(path_or_name, **kwargs)


def _pad_with_none(values: Sequence, target_len: int, label: str) -> List:
    padded = list(values)
    if len(padded) < target_len:
        warnings.warn(
            f"{label} has {len(padded)} entries for {target_len} datasets; "
            f"padding with None.",
            stacklevel=2,
        )
        padded.extend([None] * (target_len - len(padded)))
    return padded


def normalize_language(language: str) -> str:
    """Map a language name/code onto Whisper's canonical codes
    (reference data/utils.py:360-377)."""
    if not isinstance(language, str):
        raise ValueError(f"Language value {language!r} is not a string.")
    normalized = language.strip().lower()
    if normalized in LANGUAGES:
        return normalized
    code = TO_LANGUAGE_CODE.get(normalized)
    if code is not None:
        return code
    raise ValueError(f"Unsupported language value {language!r}.")


def _ensure_columns(dataset):
    if "sentence" in dataset.column_names:
        dataset = dataset.rename_column("sentence", "text")
    if "sentence_de" in dataset.column_names:
        dataset = dataset.rename_column("sentence_de", "text")
    if "language" not in dataset.column_names:
        dataset = dataset.map(
            lambda batch: {"language": ["de"] * len(batch["text"])}, batched=True
        )
    else:
        dataset = dataset.map(
            lambda batch: {
                "language": [normalize_language(l) for l in batch["language"]]
            },
            batched=True,
        )
    if "prompt" not in dataset.column_names:
        dataset = dataset.map(
            lambda batch: {"prompt": [""] * len(batch["text"])}, batched=True
        )
    return dataset


def _filter_languages(dataset, language_tags, dataset_name: str):
    if language_tags is None:
        return dataset
    tags = set(language_tags)
    before = len(dataset)
    print(f"Filtering dataset {dataset_name} to language tag(s): {sorted(tags)}")
    dataset = dataset.filter(
        lambda batch: [lang in tags for lang in batch["language"]], batched=True
    )
    print(f"Filtered dataset size: {len(dataset)} (from {before})")
    return dataset


def _subsample(dataset, n: Optional[int], groupby_col: Optional[str], rng):
    if n is None:
        return dataset
    if groupby_col and groupby_col in dataset.column_names:
        print(f"Performing groupby sampling on column: {groupby_col}")
        groups = defaultdict(list)
        for idx, value in enumerate(dataset[groupby_col]):
            groups[value].append(idx)
        selected: List[int] = []
        for group_indices in groups.values():
            replace = len(group_indices) < n
            selected.extend(rng.choice(group_indices, size=n, replace=replace))
    else:
        print("Performing regular random sampling")
        count = min(n, len(dataset))
        selected = rng.choice(len(dataset), size=count, replace=False)
    dataset = dataset.select(selected)
    print(f"Number of samples selected: {len(dataset)}")
    return dataset


def _cast_large_strings(dataset):
    from datasets import Features, Value

    features = {}
    changed = False
    for name, feature in dataset.features.items():
        if isinstance(feature, Value) and feature.dtype == "large_string":
            features[name] = Value("string")
            changed = True
        else:
            features[name] = feature
    if changed:
        print("Casting large_string columns to string for schema alignment.")
        dataset = dataset.cast(Features(features))
    return dataset


def process_dataset(
    dataset_names: Sequence[str],
    select_n_per_ds: Sequence[Optional[int]],
    split_name: str,
    groupby_col: Sequence[Optional[str]],
    return_sizes: bool = False,
    select_language_tag: Optional[Sequence] = None,
    rng: Optional[np.random.Generator] = None,
):
    """Load, normalize, filter, subsample and concatenate the configured
    datasets (reference data/utils.py:238-352). Returns the concatenated
    dataset, plus per-dataset sizes when ``return_sizes``.

    Two deliberate divergences from the reference (PARITY.md §2a row 13):

    - Missing-split fallback is **per dataset**: the reference mutates its
      loop variable (data/utils.py:286-293 rebinds ``split_name``), so one
      dataset missing the requested split silently switches every LATER
      dataset in the list to the fallback split even when they have the
      requested one. That sticky behavior looks like a reference bug on
      multi-dataset configs with heterogeneous splits; here ``use_split``
      is re-derived from the configured ``split_name`` for each dataset.
    - The reference's ``print_examples``/``example_count`` debug params
      (data/utils.py:243-244,253-258: print a few filtered rows) are not
      carried — no config YAML in the reference corpus sets them, and the
      loader's lazy skip logs invalid rows as they surface instead.
    """
    from datasets import concatenate_datasets

    if rng is None:
        rng = np.random.default_rng()

    dataset_names = list(dataset_names)
    n_ds = len(dataset_names)
    select_n_per_ds = _pad_with_none(select_n_per_ds, n_ds, "select_n_per_ds")
    groupby_col = _pad_with_none(groupby_col, n_ds, "groupby_col")
    if select_language_tag is None:
        select_language_tag = [None] * n_ds
    else:
        select_language_tag = _pad_with_none(
            select_language_tag, n_ds, "select_language_tag"
        )

    processed = []
    sizes = []
    for name, n, group_col, lang_tag in zip(
        dataset_names, select_n_per_ds, groupby_col, select_language_tag
    ):
        dataset = load_hf_dataset(name)
        use_split = split_name
        if hasattr(dataset, "keys") and use_split not in dataset:
            available = list(dataset.keys())
            print(
                f"Split {use_split} not found in {name}. Available: {available}"
            )
            use_split = "train" if "train" in dataset else available[0]
            print(f"Defaulting to split: {use_split}")
        if hasattr(dataset, "keys"):
            dataset = dataset[use_split]

        print(f"Processing dataset: {name}")
        print(f"Original dataset size: {len(dataset)}")

        dataset = _ensure_columns(dataset)
        dataset = _filter_languages(dataset, lang_tag, name)
        dataset = _subsample(dataset, n, group_col, rng)
        dataset = _cast_large_strings(dataset)
        processed.append(dataset)
        sizes.append(len(dataset))

    concatenated = concatenate_datasets(processed)
    print(f"Total rows in concatenated dataset: {len(concatenated)}")
    if return_sizes:
        return concatenated, sizes
    return concatenated
