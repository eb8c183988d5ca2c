"""Minimal BERT WordPiece tokenizer (offline, dependency-free).

The reference's lavis BLIP-2 uses the bert-base-uncased tokenizer; in
air-gapped deployments the vocab ships as a plain ``vocab.txt``. This
implementation covers the subset BLIP-2 prompts need: lowercasing,
punctuation splitting, greedy longest-match WordPiece with ``##``
continuations, [CLS]/[SEP] specials, and fixed-length padding (the scoring
graph wants static shapes).
"""

from __future__ import annotations

import string
from typing import Dict, List, Sequence, Tuple

import numpy as np


class WordPieceTokenizer:
    def __init__(self, vocab: Dict[str, int], max_len: int = 32):
        self.vocab = vocab
        self.max_len = max_len
        self.cls_id = vocab.get("[CLS]", 0)
        self.sep_id = vocab.get("[SEP]", 0)
        self.pad_id = vocab.get("[PAD]", 0)
        self.unk_id = vocab.get("[UNK]", 0)

    @classmethod
    def from_vocab_file(cls, path: str, max_len: int = 32) -> "WordPieceTokenizer":
        vocab = {}
        with open(path, encoding="utf-8") as f:
            for i, line in enumerate(f):
                vocab[line.rstrip("\n")] = i
        return cls(vocab, max_len)

    @staticmethod
    def _basic_tokenize(text: str) -> List[str]:
        text = text.lower().strip()
        out: List[str] = []
        word = ""
        for ch in text:
            if ch.isspace():
                if word:
                    out.append(word)
                    word = ""
            elif ch in string.punctuation:
                if word:
                    out.append(word)
                    word = ""
                out.append(ch)
            else:
                word += ch
        if word:
            out.append(word)
        return out

    def _wordpiece(self, word: str) -> List[int]:
        ids: List[int] = []
        start = 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                piece = word[start:end]
                if start > 0:
                    piece = "##" + piece
                if piece in self.vocab:
                    cur = self.vocab[piece]
                    break
                end -= 1
            if cur is None:
                return [self.unk_id]
            ids.append(cur)
            start = end
        return ids

    def encode(self, text: str) -> List[int]:
        ids = [self.cls_id]
        for w in self._basic_tokenize(text):
            ids.extend(self._wordpiece(w))
        ids = ids[: self.max_len - 1]
        ids.append(self.sep_id)
        return ids

    def encode_batch(self, texts: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        """(T, max_len) int32 ids + bool attention mask, padded."""
        out = np.full((len(texts), self.max_len), self.pad_id, np.int32)
        mask = np.zeros((len(texts), self.max_len), bool)
        for i, t in enumerate(texts):
            ids = self.encode(t)
            out[i, : len(ids)] = ids
            mask[i, : len(ids)] = True
        return out, mask


def toy_vocab(extra_words: Sequence[str] = ()) -> Dict[str, int]:
    """Tiny vocab for tests: specials + lowercase chars as continuations."""
    tokens = ["[PAD]", "[UNK]", "[CLS]", "[SEP]"]
    tokens += list(string.ascii_lowercase)
    tokens += ["##" + c for c in string.ascii_lowercase]
    tokens += list(extra_words)
    return {t: i for i, t in enumerate(tokens)}
