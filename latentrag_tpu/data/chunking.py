"""Document chunking: answer-aware, sliding-window, and semantic chunkers.

Capability parity with ``utils/chunk_utils.py`` (the reference's entire
long-input strategy — SURVEY §5 "long-context"): token-offset-based chunking
on the host, with chunk→doc mapping carried into retrieval for doc-level
MaxSim aggregation.

* ``sliding_window_chunker`` (ref ``chunk_utils.py:167-208``): fixed token
  windows at a stride, text slices cut on exact char offsets so chunk text
  never splits a word;
* ``semantic_window_chunker`` (ref ``:211-278``): chunk ends snapped to the
  last sentence-final punctuation within ``[min_tokens, max_tokens]``;
* ``chunk_context_with_alignment`` (ref ``:24-109``): training-time
  answer-aware chunking — a window centred on the answer span, plus sliding
  windows, deduplicated; integrity fallbacks guarantee the answer text
  survives in at least one chunk (full-context fallback on alignment
  failure);
* parquet chunk-index persistence (ref ``:396-403``).
"""

from __future__ import annotations

import logging
from dataclasses import asdict, dataclass
from typing import Sequence

from .tokenizer import WordPieceTokenizer

log = logging.getLogger("latentrag.utils")

_SENT_PUNCT = (".", "!", "?", ";", ":")


@dataclass(frozen=True)
class ChunkRecord:
    doc_id: int | str
    chunk_id: int
    text: str
    tok_start: int
    tok_end: int  # exclusive
    char_start: int
    char_end: int  # exclusive
    contains_answer: bool = False


def _body_tokens(tokenizer: WordPieceTokenizer, text: str):
    """Tokenize without special tokens; returns (tokens, offsets)."""
    enc = tokenizer.encode(text, add_special_tokens=False)
    return enc.tokens, enc.offsets


def _char_to_token_span(
    offsets: Sequence[tuple[int, int]], char_start: int, char_end: int
) -> tuple[int, int] | None:
    """Token [start, end) covering the char span; None if not alignable."""
    tok_start = tok_end = None
    for i, (s, e) in enumerate(offsets):
        if e <= s:
            continue
        if tok_start is None and e > char_start:
            tok_start = i
        if s < char_end:
            tok_end = i + 1
    if tok_start is None or tok_end is None or tok_start >= tok_end:
        return None
    return tok_start, tok_end


def _window_record(
    text: str,
    offsets: Sequence[tuple[int, int]],
    doc_id,
    chunk_id: int,
    tok_start: int,
    tok_end: int,
) -> ChunkRecord:
    char_start = offsets[tok_start][0]
    char_end = offsets[tok_end - 1][1]
    return ChunkRecord(
        doc_id=doc_id,
        chunk_id=chunk_id,
        text=text[char_start:char_end],
        tok_start=tok_start,
        tok_end=tok_end,
        char_start=char_start,
        char_end=char_end,
    )


def sliding_window_chunker(
    text: str,
    tokenizer: WordPieceTokenizer,
    max_tokens: int = 128,
    stride: int = 64,
    doc_id=0,
) -> list[ChunkRecord]:
    """Token windows of ``max_tokens`` every ``stride`` tokens."""
    if stride <= 0:
        raise ValueError("stride must be positive")
    _, offsets = _body_tokens(tokenizer, text)
    n = len(offsets)
    if n == 0:
        return []
    records = []
    start = 0
    cid = 0
    while start < n:
        end = min(start + max_tokens, n)
        records.append(
            _window_record(text, offsets, doc_id, cid, start, end)
        )
        cid += 1
        if end == n:
            break
        start += stride
    return records


def semantic_window_chunker(
    text: str,
    tokenizer: WordPieceTokenizer,
    max_tokens: int = 128,
    min_tokens: int = 48,
    doc_id=0,
) -> list[ChunkRecord]:
    """Windows whose ends snap to sentence punctuation in
    ``[min_tokens, max_tokens]`` when one exists; hard cut otherwise."""
    if min_tokens > max_tokens:
        raise ValueError("min_tokens must be <= max_tokens")
    tokens, offsets = _body_tokens(tokenizer, text)
    n = len(tokens)
    if n == 0:
        return []
    records = []
    start = 0
    cid = 0
    while start < n:
        hard_end = min(start + max_tokens, n)
        end = hard_end
        if hard_end < n:  # look for a punctuation snap point
            snapped = None
            lo = start + min_tokens
            for i in range(hard_end - 1, lo - 1, -1):
                if tokens[i] in _SENT_PUNCT:
                    snapped = i + 1  # include the punctuation token
                    break
            if snapped is not None:
                end = snapped
        records.append(_window_record(text, offsets, doc_id, cid, start, end))
        cid += 1
        if end >= n:
            break
        start = end
    return records


def chunk_context_with_alignment(
    context: str,
    answer_text: str,
    answer_char_start: int,
    tokenizer: WordPieceTokenizer,
    max_tokens: int = 128,
    stride: int = 64,
    doc_id=0,
) -> list[ChunkRecord]:
    """Answer-aware training chunker.

    Centred window around the answer token span + sliding windows, dedup by
    token span; integrity: if the answer text survives in no chunk, the full
    context is appended as a final chunk; if the answer span can't be
    aligned at all, the full context is the single chunk.
    """
    tokens, offsets = _body_tokens(tokenizer, context)
    n = len(tokens)

    def full_context(contains=True) -> list[ChunkRecord]:
        return [
            ChunkRecord(
                doc_id=doc_id,
                chunk_id=0,
                text=context,
                tok_start=0,
                tok_end=n,
                char_start=0,
                char_end=len(context),
                contains_answer=contains,
            )
        ]

    if n == 0:
        return full_context()
    if n <= max_tokens:
        return full_context()

    answer_char_end = answer_char_start + len(answer_text)
    span = _char_to_token_span(offsets, answer_char_start, answer_char_end)
    if span is None:
        log.debug("answer span alignment failed; full-context fallback")
        return full_context()
    a_start, a_end = span

    windows: list[tuple[int, int]] = []
    # centred window
    centre = (a_start + a_end) // 2
    w_start = max(0, min(centre - max_tokens // 2, n - max_tokens))
    windows.append((w_start, w_start + max_tokens))
    # sliding windows
    s = 0
    while s < n:
        e = min(s + max_tokens, n)
        windows.append((s, e))
        if e == n:
            break
        s += stride

    seen: set[tuple[int, int]] = set()
    records: list[ChunkRecord] = []
    for ws, we in windows:
        if (ws, we) in seen:
            continue
        seen.add((ws, we))
        rec = _window_record(context, offsets, doc_id, len(records), ws, we)
        contains = ws <= a_start and a_end <= we
        if not contains:
            # cheap text check catches answers repeated elsewhere
            contains = answer_text.lower() in rec.text.lower()
        records.append(
            ChunkRecord(**{**asdict(rec), "contains_answer": contains})
        )

    if not any(r.contains_answer for r in records):
        log.debug("answer lost by chunking; re-appending full context")
        records.append(
            ChunkRecord(
                doc_id=doc_id,
                chunk_id=len(records),
                text=context,
                tok_start=0,
                tok_end=n,
                char_start=0,
                char_end=len(context),
                contains_answer=True,
            )
        )
    return records


def build_chunked_corpus(
    examples: Sequence[dict],
    tokenizer: WordPieceTokenizer,
    max_tokens: int = 128,
    stride: int = 64,
) -> list[ChunkRecord]:
    """Answer-aware chunks for training examples
    ({context, answer_text, answer_start, doc_id})."""
    out: list[ChunkRecord] = []
    for ex in examples:
        out.extend(
            chunk_context_with_alignment(
                ex["context"],
                ex.get("answer_text", ""),
                ex.get("answer_start", 0),
                tokenizer,
                max_tokens=max_tokens,
                stride=stride,
                doc_id=ex.get("doc_id", 0),
            )
        )
    return out


def build_inference_corpus(
    texts: Sequence[str],
    doc_ids: Sequence | None,
    tokenizer: WordPieceTokenizer,
    mode: str = "sliding",
    max_tokens: int = 128,
    stride: int = 64,
    min_tokens: int = 48,
) -> list[ChunkRecord]:
    """Chunk an inference corpus; ``mode`` in {'sliding', 'semantic'}."""
    if doc_ids is None:
        doc_ids = list(range(len(texts)))
    out: list[ChunkRecord] = []
    for text, did in zip(texts, doc_ids):
        if mode == "sliding":
            out.extend(
                sliding_window_chunker(
                    text, tokenizer, max_tokens, stride, doc_id=did
                )
            )
        elif mode == "semantic":
            out.extend(
                semantic_window_chunker(
                    text, tokenizer, max_tokens, min_tokens, doc_id=did
                )
            )
        else:
            raise ValueError(f"unknown chunking mode {mode!r}")
    return out


def save_chunk_index(records: Sequence[ChunkRecord], path: str) -> None:
    import pandas as pd

    pd.DataFrame([asdict(r) for r in records]).to_parquet(path)


def load_chunk_index(path: str) -> list[ChunkRecord]:
    import pandas as pd

    df = pd.read_parquet(path)
    return [ChunkRecord(**row) for row in df.to_dict("records")]
