"""Build the compact Whisper BPE asset shipped with whisper_finetune_tpu.

Reads a HuggingFace ``tokenizer.json`` for a multilingual Whisper model (for
example the deployment asset bundled with checkpoints on the Hub) and distills
it to the minimal data our tokenizer needs:

* the ordered BPE merge list (the byte-level base alphabet and the full vocab
  are derivable from it: ids 0..255 are the single-byte tokens in ByteLevel
  unicode form, id 256+k is the concatenation of merge k),
* any extra base-vocab entries not derivable from merges,
* the ordered special-token list (languages, task tokens, timestamps).

Usage:
    python tools/build_tokenizer_asset.py <tokenizer.json> \
        whisper_finetune_tpu/tokenizer/assets/multilingual.json.gz
"""

import gzip
import json
import sys


def main(src: str, dst: str) -> None:
    with open(src) as f:
        tj = json.load(f)

    model = tj["model"]
    assert model["type"] == "BPE"
    vocab = model["vocab"]
    merges = [
        m if isinstance(m, str) else " ".join(m) for m in model["merges"]
    ]

    inv = {i: s for s, i in vocab.items()}
    # Verify derivability and collect any non-derivable leftovers.
    extras = {}
    for token, idx in vocab.items():
        if idx < 256:
            if len(token) != 1:
                extras[token] = idx
            continue
        k = idx - 256
        if k < len(merges):
            left, right = merges[k].split(" ")
            if left + right != token:
                extras[token] = idx
        else:
            extras[token] = idx

    byte_alphabet = [inv[i] for i in range(256)]
    specials = sorted(
        ((t["id"], t["content"]) for t in tj.get("added_tokens", [])),
        key=lambda x: x[0],
    )

    asset = {
        "format_version": 1,
        "n_base_vocab": len(vocab),
        "byte_alphabet": byte_alphabet,
        "merges": merges,
        "extra_vocab": extras,
        "specials": specials,
    }
    with gzip.open(dst, "wt", encoding="utf-8") as f:
        json.dump(asset, f)
    print(
        f"Wrote {dst}: base vocab {len(vocab)}, merges {len(merges)}, "
        f"extras {len(extras)}, specials {len(specials)}"
    )


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
