"""BERT WordPiece tokenizer (for the Chinese text tower).

The reference uses HF ``BertTokenizer.from_pretrained("hfl/chinese-roberta-
wwm-ext")`` (main_task_retrieval.py:535-540), which needs a network fetch.
This is a self-contained implementation of the same algorithm (basic
tokenizer with CJK-character splitting + greedy longest-match-first
WordPiece) that loads any local ``vocab.txt``; :func:`load_bert_tokenizer`
prefers the HF class when the model is locally available so behavior matches
exactly on cached installations.
"""

from __future__ import annotations

import os
import unicodedata
from typing import Dict, List, Optional


def _is_whitespace(ch: str) -> bool:
    return ch in (" ", "\t", "\n", "\r") or unicodedata.category(ch) == "Zs"


def _is_control(ch: str) -> bool:
    if ch in ("\t", "\n", "\r"):
        return False
    return unicodedata.category(ch).startswith("C")


def _is_punctuation(ch: str) -> bool:
    cp = ord(ch)
    if ((33 <= cp <= 47) or (58 <= cp <= 64)
            or (91 <= cp <= 96) or (123 <= cp <= 126)):
        return True
    return unicodedata.category(ch).startswith("P")


def _is_cjk(cp: int) -> bool:
    return ((0x4E00 <= cp <= 0x9FFF) or (0x3400 <= cp <= 0x4DBF)
            or (0x20000 <= cp <= 0x2A6DF) or (0x2A700 <= cp <= 0x2B73F)
            or (0x2B740 <= cp <= 0x2B81F) or (0x2B820 <= cp <= 0x2CEAF)
            or (0xF900 <= cp <= 0xFAFF) or (0x2F800 <= cp <= 0x2FA1F))


class WordPieceTokenizer:
    """HF BertTokenizer-compatible surface: tokenize /
    convert_tokens_to_ids / vocab_size and the special-token ids."""

    def __init__(self, vocab_path: str, do_lower_case: bool = True,
                 max_chars_per_word: int = 100):
        self.vocab: Dict[str, int] = {}
        with open(vocab_path, "r", encoding="utf-8") as f:
            for i, line in enumerate(f):
                self.vocab[line.rstrip("\n")] = i
        self.ids_to_tokens = {i: t for t, i in self.vocab.items()}
        self.vocab_size = len(self.vocab)
        self.do_lower_case = do_lower_case
        self.max_chars_per_word = max_chars_per_word
        self.unk_token = "[UNK]"
        self.pad_token_id = self.vocab.get("[PAD]", 0)
        self.cls_token_id = self.vocab.get("[CLS]", 101)
        self.sep_token_id = self.vocab.get("[SEP]", 102)
        self.mask_token_id = self.vocab.get("[MASK]", 103)

    # -- basic tokenization --------------------------------------------------

    def _clean(self, text: str) -> str:
        out = []
        for ch in text:
            cp = ord(ch)
            if cp == 0 or cp == 0xFFFD or _is_control(ch):
                continue
            out.append(" " if _is_whitespace(ch) else ch)
        return "".join(out)

    def _split_basic(self, text: str) -> List[str]:
        text = self._clean(text)
        # pad CJK chars with spaces (BERT chinese handling)
        spaced = []
        for ch in text:
            if _is_cjk(ord(ch)):
                spaced.extend((" ", ch, " "))
            else:
                spaced.append(ch)
        tokens = "".join(spaced).split()
        out: List[str] = []
        for tok in tokens:
            if self.do_lower_case:
                tok = tok.lower()
                tok = "".join(c for c in unicodedata.normalize("NFD", tok)
                              if unicodedata.category(c) != "Mn")
            # split punctuation
            cur: List[str] = []
            for ch in tok:
                if _is_punctuation(ch):
                    if cur:
                        out.append("".join(cur))
                        cur = []
                    out.append(ch)
                else:
                    cur.append(ch)
            if cur:
                out.append("".join(cur))
        return out

    # -- wordpiece -----------------------------------------------------------

    def _wordpiece(self, word: str) -> List[str]:
        if len(word) > self.max_chars_per_word:
            return [self.unk_token]
        out: List[str] = []
        start = 0
        while start < len(word):
            end = len(word)
            piece: Optional[str] = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    piece = sub
                    break
                end -= 1
            if piece is None:
                return [self.unk_token]
            out.append(piece)
            start = end
        return out

    # -- public --------------------------------------------------------------

    def tokenize(self, text: str) -> List[str]:
        out: List[str] = []
        for word in self._split_basic(text):
            out.extend(self._wordpiece(word))
        return out

    def convert_tokens_to_ids(self, tokens: List[str]) -> List[int]:
        unk = self.vocab[self.unk_token]
        return [self.vocab.get(t, unk) for t in tokens]

    def encode(self, text: str) -> List[int]:
        return self.convert_tokens_to_ids(self.tokenize(text))


def load_bert_tokenizer(name_or_path: str):
    """HF BertTokenizer if locally resolvable, else the native WordPiece
    (requires ``name_or_path`` to be a dir containing vocab.txt or a
    vocab.txt path)."""
    if os.path.isfile(name_or_path):
        return WordPieceTokenizer(name_or_path)
    vocab = os.path.join(name_or_path, "vocab.txt")
    if os.path.isfile(vocab):
        return WordPieceTokenizer(vocab)
    from transformers import BertTokenizer  # may hit local HF cache

    return BertTokenizer.from_pretrained(name_or_path)
