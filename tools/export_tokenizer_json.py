"""Export the bundled Whisper vocabulary as an HF ``tokenizer.json``.

Deployment-asset parity with the reference's ``whisper_v3_utils/tokenizer.json``
(consumed by the HF/CTranslate2/faster-whisper toolchain at
upload_model_to_hub.py:409-413): rebuilds a fast-tokenizers BPE model from
the same compact asset the training tokenizer uses, including every special
token (control, language, timestamp) at the canonical ids.

Usage: python tools/export_tokenizer_json.py [--out whisper_v3_utils/tokenizer.json]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def export(out_path: str) -> None:
    from tokenizers import AddedToken, Tokenizer, decoders, models, pre_tokenizers

    from whisper_finetune_tpu.tokenizer.tokenizer import _build_vocab, _load_asset

    asset = _load_asset("multilingual")
    vocab, merges = _build_vocab(asset)
    merge_pairs = [tuple(m.split(" ")) for m in asset["merges"]]

    tok = Tokenizer(models.BPE(vocab=vocab, merges=merge_pairs))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()

    specials = sorted(asset["specials"], key=lambda pair: pair[0])
    tok.add_special_tokens(
        [AddedToken(content, special=True) for _, content in specials]
    )
    # verify the canonical id layout survived
    for idx, content in specials:
        got = tok.token_to_id(content)
        assert got == idx, f"special {content}: expected id {idx}, got {got}"

    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    tok.save(out_path)
    print(f"Wrote {out_path} ({len(vocab)} base tokens + {len(specials)} specials)")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="whisper_v3_utils/tokenizer.json")
    args = parser.parse_args()
    export(args.out)
