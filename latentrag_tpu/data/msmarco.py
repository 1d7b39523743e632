"""MS MARCO passage-ranking loader (scale-out corpus, BASELINE config 5).

Records stream either from the HF hub (``ms_marco`` v1.1) or from a local
jsonl file with the same record shape::

    {"query": "...", "passages": {"passage_text": [...], "is_selected": [...]}}

so the scale config's data path is exercised offline (the hub is gated on
connectivity; ``scripts/scale_bench.py`` falls back to synthetic latents).
Yields (queries, corpus, relevant) in the same shape as
``squad.load_evaluation_data``.
"""

from __future__ import annotations

import json
import logging
from typing import Iterable, Iterator, Mapping

log = logging.getLogger("latentrag.utils")


def _stream_records(
    split: str, source: str | None = None
) -> Iterable[Mapping]:
    """MS-MARCO-shaped records from a local jsonl (``source``) or the hub."""
    if source is not None:
        def gen():
            with open(source) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        yield json.loads(line)

        return gen()
    from datasets import load_dataset

    return load_dataset("ms_marco", "v1.1", split=split, streaming=True)


def load_msmarco_corpus(
    max_passages: int | None = None,
    source: str | None = None,
) -> Iterator[str]:
    """Stream passage texts from the MS MARCO passage collection."""
    n = 0
    for ex in _stream_records("train", source):
        for passage in ex["passages"]["passage_text"]:
            yield passage
            n += 1
            if max_passages is not None and n >= max_passages:
                return


def load_msmarco_eval(
    max_queries: int | None = 1000,
    source: str | None = None,
) -> tuple[list[str], list[str], list[int]]:
    """(queries, deduped passage corpus, relevant passage index per query).

    Relevance = the is_selected passage for each query; queries without a
    selected passage are skipped.
    """
    queries: list[str] = []
    corpus: list[str] = []
    index: dict[str, int] = {}
    relevant: list[int] = []
    for ex in _stream_records("validation", source):
        if max_queries is not None and len(queries) >= max_queries:
            break
        texts = ex["passages"]["passage_text"]
        selected = ex["passages"]["is_selected"]
        pos = next((t for t, s in zip(texts, selected) if s), None)
        if pos is None:
            continue
        for t in texts:
            if t not in index:
                index[t] = len(corpus)
                corpus.append(t)
        queries.append(ex["query"])
        relevant.append(index[pos])
    return queries, corpus, relevant
