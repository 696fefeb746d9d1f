"""Native C++ core tests: builds with g++, matches the pure-Python BPE and
Levenshtein implementations exactly (dropout=0), and produces valid
stochastic segmentations under dropout."""

import random

import numpy as np
import pytest

from whisper_finetune_tpu.native import NativeBPE, get_lib, levenshtein_ids


pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native toolchain unavailable"
)


def test_levenshtein_native_matches_python():
    rng = np.random.default_rng(0)
    for _ in range(50):
        a = rng.integers(0, 5, rng.integers(0, 20)).tolist()
        b = rng.integers(0, 5, rng.integers(0, 20)).tolist()
        # brute force
        n, m = len(a), len(b)
        d = np.zeros((n + 1, m + 1), dtype=int)
        d[:, 0] = np.arange(n + 1)
        d[0, :] = np.arange(m + 1)
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                d[i, j] = min(
                    d[i - 1, j] + 1,
                    d[i, j - 1] + 1,
                    d[i - 1, j - 1] + (a[i - 1] != b[j - 1]),
                )
        assert levenshtein_ids(a, b) == d[n, m], (a, b)


def test_native_bpe_matches_python_encode():
    from whisper_finetune_tpu.tokenizer import get_tokenizer

    tok = get_tokenizer(language="de", task="transcribe")
    bpe = tok._bpe
    assert bpe._native is not None, "native BPE should be active in tests"

    texts = [
        "Das ist ein Test.",
        "Zürich läuft schön!",
        "hello world 1234",
        "  spaces\tand\nnewlines ",
        "emoji 🤖 and ümlauts ß",
    ]
    for text in texts:
        native_ids = bpe.encode(text)
        # force the python path
        saved = bpe._native
        bpe._native = None
        try:
            python_ids = bpe.encode(text)
        finally:
            bpe._native = saved
        assert native_ids == python_ids, text
        assert bpe.decode(native_ids) == text


def test_native_bpe_dropout_roundtrip():
    from whisper_finetune_tpu.tokenizer import get_tokenizer

    tok = get_tokenizer(language="de", task="transcribe")
    text = "Die Tokenisierung wird stochastisch segmentiert."
    base = tok.encode(text)
    rng = random.Random(0)
    seen_longer = False
    for _ in range(8):
        dropped = tok.encode(text, dropout_prob=0.4, rng=rng)
        assert tok.decode(dropped) == text  # always decodes back
        if len(dropped) > len(base):
            seen_longer = True
    assert seen_longer, "dropout should produce finer segmentations"


def test_native_bpe_encode_piece_direct():
    triples = [(0, 1, 10), (10, 2, 11)]  # ab -> 10, (ab)c -> 11
    nb = NativeBPE(triples)
    assert nb.encode_piece([0, 1, 2]) == [11]
    assert nb.encode_piece([1, 0, 2]) == [1, 0, 2]  # no applicable merges
    assert nb.encode_piece([]) == []
    # dropout=1.0: every merge suppressed
    assert nb.encode_piece([0, 1, 2], dropout=1.0, seed=42) == [0, 1, 2]
