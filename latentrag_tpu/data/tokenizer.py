"""WordPiece tokenizer with character-offset mapping (host-side).

The reference leans on HF fast tokenizers (Rust) for offset-mapped WordPiece
(``utils/chunk_utils.py:114-121``); tokenization is a pre-TPU host stage
(SURVEY §2.4 item 4), so a self-contained implementation keeps the framework
dependency-free and offline-capable:

* loads a standard BERT ``vocab.txt`` when available (exact parity with the
  all-MiniLM-L6-v2 vocabulary);
* otherwise trains a frequency-based vocabulary from a corpus
  (whole words + suffix pieces + character fallback);
* `encode` returns token ids plus (start, end) char offsets per token —
  the contract the chunkers build on;
* BERT semantics: lowercasing, punctuation splitting, greedy
  longest-match-first WordPiece with ``##`` continuation pieces, [CLS]/[SEP]
  framing, [UNK] fallback.
"""

from __future__ import annotations

import collections
import json
import os
import re
import unicodedata
from dataclasses import dataclass
from typing import Iterable, Sequence

PAD, UNK, CLS, SEP, MASK = "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"
SPECIAL_TOKENS = (PAD, UNK, CLS, SEP, MASK)


def _is_punctuation(ch: str) -> bool:
    cp = ord(ch)
    if (
        33 <= cp <= 47
        or 58 <= cp <= 64
        or 91 <= cp <= 96
        or 123 <= cp <= 126
    ):
        return True
    return unicodedata.category(ch).startswith("P")


@dataclass
class Encoding:
    ids: list[int]
    tokens: list[str]
    offsets: list[tuple[int, int]]  # char spans into the ORIGINAL text


class WordPieceTokenizer:
    def __init__(
        self,
        vocab: dict[str, int],
        lowercase: bool = True,
        max_word_chars: int = 100,
    ):
        self.vocab = vocab
        self.inv_vocab = {i: t for t, i in vocab.items()}
        self.lowercase = lowercase
        self.max_word_chars = max_word_chars
        for tok in (PAD, UNK, CLS, SEP):
            if tok not in vocab:
                raise ValueError(f"vocab missing special token {tok}")
        self.pad_id = vocab[PAD]
        self.unk_id = vocab[UNK]
        self.cls_id = vocab[CLS]
        self.sep_id = vocab[SEP]

    # ------------------------------------------------------------ factories

    @classmethod
    def from_vocab_file(cls, path: str, **kw) -> "WordPieceTokenizer":
        vocab: dict[str, int] = {}
        with open(path, encoding="utf-8") as f:
            for i, line in enumerate(f):
                vocab[line.rstrip("\n")] = i
        return cls(vocab, **kw)

    @classmethod
    def train_from_corpus(
        cls,
        texts: Iterable[str],
        vocab_size: int = 30522,
        min_freq: int = 2,
        **kw,
    ) -> "WordPieceTokenizer":
        """Frequency-based vocabulary: all single characters (continuation
        pieces included) ensure no word is unencodable, then the most common
        whole words, then common suffix pieces."""
        word_counts: collections.Counter = collections.Counter()
        for text in texts:
            for w, _, _ in _pretokenize(text, lowercase=True):
                word_counts[w] += 1

        chars: set[str] = set()
        for w in word_counts:
            chars.update(w)

        vocab: dict[str, int] = {}
        for tok in SPECIAL_TOKENS:
            vocab[tok] = len(vocab)
        for ch in sorted(chars):
            for piece in (ch, "##" + ch):
                if piece not in vocab:
                    vocab[piece] = len(vocab)

        # common whole words
        for w, c in word_counts.most_common():
            if len(vocab) >= vocab_size:
                break
            if c >= min_freq and w not in vocab:
                vocab[w] = len(vocab)
        # common suffixes as continuation pieces
        if len(vocab) < vocab_size:
            suffix_counts: collections.Counter = collections.Counter()
            for w, c in word_counts.items():
                for ln in (2, 3, 4):
                    if len(w) > ln:
                        suffix_counts["##" + w[-ln:]] += c
            for s, c in suffix_counts.most_common():
                if len(vocab) >= vocab_size:
                    break
                if c >= min_freq and s not in vocab:
                    vocab[s] = len(vocab)
        return cls(vocab, **kw)

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w", encoding="utf-8") as f:
            json.dump(
                {"vocab": self.vocab, "lowercase": self.lowercase}, f
            )

    @classmethod
    def load(cls, path: str) -> "WordPieceTokenizer":
        with open(path, encoding="utf-8") as f:
            data = json.load(f)
        return cls(data["vocab"], lowercase=data.get("lowercase", True))

    # ------------------------------------------------------------- encoding

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    def _wordpiece(self, word: str) -> list[str] | None:
        """Greedy longest-match-first; None if unencodable."""
        if len(word) > self.max_word_chars:
            return None
        pieces = []
        start = 0
        while start < len(word):
            end = len(word)
            piece = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    piece = sub
                    break
                end -= 1
            if piece is None:
                return None
            pieces.append(piece)
            start = end
        return pieces

    def encode(
        self,
        text: str,
        add_special_tokens: bool = True,
        max_length: int | None = None,
    ) -> Encoding:
        ids: list[int] = []
        tokens: list[str] = []
        offsets: list[tuple[int, int]] = []
        if add_special_tokens:
            ids.append(self.cls_id)
            tokens.append(CLS)
            offsets.append((0, 0))
        body_budget = (
            None
            if max_length is None
            else max_length - (2 if add_special_tokens else 0)
        )
        for word, w_start, w_end in _pretokenize(text, self.lowercase):
            pieces = self._wordpiece(word)
            if pieces is None:
                pieces = [UNK]
            if body_budget is not None and len(tokens) - (
                1 if add_special_tokens else 0
            ) + len(pieces) > body_budget:
                break
            cursor = w_start
            for p in pieces:
                plen = len(p) - 2 if p.startswith("##") else len(p)
                if p == UNK:
                    span = (w_start, w_end)
                    cursor = w_end
                else:
                    span = (cursor, min(cursor + plen, w_end))
                    cursor = span[1]
                ids.append(self.vocab.get(p, self.unk_id))
                tokens.append(p)
                offsets.append(span)
        if add_special_tokens:
            end = len(text)
            ids.append(self.sep_id)
            tokens.append(SEP)
            offsets.append((end, end))
        return Encoding(ids=ids, tokens=tokens, offsets=offsets)

    def encode_batch(
        self,
        texts: Sequence[str],
        max_length: int = 256,
    ) -> tuple["np.ndarray", "np.ndarray"]:
        """Padded [B, L] (ids, attention_mask) int32 arrays for the encoder."""
        import numpy as np

        encs = [self.encode(t, max_length=max_length) for t in texts]
        ln = max((len(e.ids) for e in encs), default=1)
        ids = np.full((len(texts), ln), self.pad_id, dtype=np.int32)
        mask = np.zeros((len(texts), ln), dtype=np.int32)
        for i, e in enumerate(encs):
            ids[i, : len(e.ids)] = e.ids
            mask[i, : len(e.ids)] = 1
        return ids, mask

    def decode_tokens(self, ids: Sequence[int]) -> list[str]:
        return [self.inv_vocab.get(i, UNK) for i in ids]


def _pretokenize(text: str, lowercase: bool) -> list[tuple[str, int, int]]:
    """Split into (word, char_start, char_end); punctuation = own token.

    Offsets index the ORIGINAL text. Lowercasing preserves offsets (BERT's
    basic tokenizer semantics, minus accent stripping which can shift
    offsets).
    """
    out: list[tuple[str, int, int]] = []
    i = 0
    n = len(text)
    while i < n:
        ch = text[i]
        if ch.isspace():
            i += 1
            continue
        if _is_punctuation(ch):
            out.append((ch.lower() if lowercase else ch, i, i + 1))
            i += 1
            continue
        j = i
        while j < n and not text[j].isspace() and not _is_punctuation(text[j]):
            j += 1
        word = text[i:j]
        out.append((word.lower() if lowercase else word, i, j))
        i = j
    return out
