"""CLIP byte-level BPE tokenizer, written for behavior parity with the
reference's ``modules/tokenization_clip.py`` (itself the public OpenAI CLIP
tokenizer plus one HMMC-specific change).

Parity points:

- vocab of 49,408 entries built from the public
  ``bpe_simple_vocab_16e6.txt.gz`` merges file (bundled as a data asset);
- slot 49394 is overwritten with ``[MASK]`` for MLM pretraining
  (tokenization_clip.py:76) — this shadows the merged token that normally
  lives there;
- ``pad_token_id`` == id of ``<|endoftext|>`` (49407), ``cls_token_id`` ==
  ``<|startoftext|>`` (49406), ``mask_token_id`` == 49394
  (tokenization_clip.py:85-87);
- text normalization: ftfy fix (identity fallback when ftfy is unavailable,
  which only diverges on mojibake input), double html.unescape, whitespace
  collapse, lowercase (tokenization_clip.py:52-61,132).

The BPE merge loop is a fresh implementation of the standard algorithm:
repeatedly merge the lowest-rank adjacent pair until no ranked pair remains.
"""

from __future__ import annotations

import gzip
import html
import os
from functools import lru_cache
from typing import Dict, List, Tuple

import regex as re

try:  # optional; identity fallback only affects malformed unicode
    import ftfy

    def _fix_text(text: str) -> str:
        return ftfy.fix_text(text)
except ImportError:  # pragma: no cover - environment dependent
    def _fix_text(text: str) -> str:
        return text

_DEFAULT_BPE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets", "bpe_simple_vocab_16e6.txt.gz",
)

_WORD_PAT = re.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
    re.IGNORECASE,
)


@lru_cache()
def byte_to_unicode() -> Dict[int, str]:
    """Reversible byte<->printable-unicode table (GPT-2 scheme): printable
    latin bytes map to themselves, the rest are remapped above U+0100."""
    printable = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    table = {b: chr(b) for b in printable}
    offset = 0
    for b in range(256):
        if b not in table:
            table[b] = chr(256 + offset)
            offset += 1
    return table


def _clean(text: str) -> str:
    text = _fix_text(text)
    text = html.unescape(html.unescape(text))
    text = re.sub(r"\s+", " ", text)
    return text.strip()


class ClipTokenizer:
    """CLIP BPE with the HMMC ``[MASK]`` slot. Host-side only."""

    def __init__(self, bpe_path: str = _DEFAULT_BPE):
        self._b2u = byte_to_unicode()
        self._u2b = {u: b for b, u in self._b2u.items()}

        with gzip.open(bpe_path, "rt", encoding="utf-8") as f:
            lines = f.read().split("\n")
        # first line is a version header; CLIP uses exactly 48,894 merges
        # (49152 - 256 - 2 special tokens), matching tokenization_clip.py:69
        merge_lines = lines[1: 49152 - 256 - 2 + 1]
        merges: List[Tuple[str, str]] = [tuple(l.split()) for l in merge_lines]
        self.bpe_ranks: Dict[Tuple[str, str], int] = {
            pair: rank for rank, pair in enumerate(merges)
        }

        base = list(byte_to_unicode().values())
        vocab = base + [u + "</w>" for u in base]
        vocab.extend("".join(pair) for pair in merges)
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        vocab[49394] = "[MASK]"  # HMMC MLM slot (tokenization_clip.py:76)

        self.encoder: Dict[str, int] = {tok: i for i, tok in enumerate(vocab)}
        self.decoder: Dict[int, str] = {i: tok for tok, i in self.encoder.items()}
        self.vocab = self.encoder
        self.vocab_size = len(vocab)

        self.pad_token_id = self.encoder["<|endoftext|>"]
        self.cls_token_id = self.encoder["<|startoftext|>"]
        self.mask_token_id = self.encoder["[MASK]"]
        self.sep_token_id = self.encoder["<|endoftext|>"]

        self._cache: Dict[str, str] = {
            "<|startoftext|>": "<|startoftext|>",
            "<|endoftext|>": "<|endoftext|>",
            "[MASK]": "[MASK]",
        }

    # -- BPE core -----------------------------------------------------------

    def _bpe(self, token: str) -> str:
        cached = self._cache.get(token)
        if cached is not None:
            return cached
        if not token:
            return token
        word: List[str] = list(token[:-1]) + [token[-1] + "</w>"]
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if best not in self.bpe_ranks:
                break
            first, second = best
            merged: List[str] = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    merged.append(first + second)
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = merged
        out = " ".join(word)
        self._cache[token] = out
        return out

    # -- public API (same surface as the reference tokenizer) ---------------

    def tokenize(self, text: str) -> List[str]:
        tokens: List[str] = []
        text = _clean(text).lower()
        for piece in re.findall(_WORD_PAT, text):
            piece = "".join(self._b2u[b] for b in piece.encode("utf-8"))
            tokens.extend(self._bpe(piece).split(" "))
        return tokens

    def convert_tokens_to_ids(self, tokens: List[str]) -> List[int]:
        return [self.encoder[t] for t in tokens]

    def encode(self, text: str) -> List[int]:
        return self.convert_tokens_to_ids(self.tokenize(text))

    def decode(self, ids: List[int]) -> str:
        text = "".join(self.decoder[i] for i in ids)
        raw = bytearray(self._u2b[c] for c in text if c in self._u2b)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")
