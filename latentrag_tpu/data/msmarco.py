"""MS MARCO passage-ranking loader (scale-out corpus, BASELINE config 5).

Gated on HF hub connectivity like the SQuAD loader; the scale benchmark
(``scripts/scale_bench.py``) uses synthetic latents when the hub is
unreachable. Yields (queries, corpus, relevant) in the same shape as
``squad.load_evaluation_data``.
"""

from __future__ import annotations

import logging
from typing import Iterator

log = logging.getLogger("latentrag.utils")


def load_msmarco_corpus(
    max_passages: int | None = None,
) -> Iterator[str]:
    """Stream passage texts from the MS MARCO v1.1 passage collection."""
    from datasets import load_dataset

    ds = load_dataset("ms_marco", "v1.1", split="train", streaming=True)
    n = 0
    for ex in ds:
        for passage in ex["passages"]["passage_text"]:
            yield passage
            n += 1
            if max_passages is not None and n >= max_passages:
                return


def load_msmarco_eval(
    max_queries: int | None = 1000,
) -> tuple[list[str], list[str], list[int]]:
    """(queries, deduped passage corpus, relevant passage index per query).

    Relevance = the is_selected passage for each query; queries without a
    selected passage are skipped.
    """
    from datasets import load_dataset

    ds = load_dataset("ms_marco", "v1.1", split="validation", streaming=True)
    queries: list[str] = []
    corpus: list[str] = []
    index: dict[str, int] = {}
    relevant: list[int] = []
    for ex in ds:
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
