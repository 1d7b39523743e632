"""Retriever protocol (parity: ``retrieval/base.py:4-7``)."""

from __future__ import annotations

from typing import Protocol, Sequence, runtime_checkable

import numpy as np


@runtime_checkable
class BaseRetriever(Protocol):
    """Minimal text-in surface shared by sparse baselines (BM25/DPR)."""

    def build_index(self, corpus: Sequence[str]) -> None: ...

    def retrieve(self, query, top_k: int = 5): ...


@runtime_checkable
class DenseSearchAPI(Protocol):
    """Batch-first dense surface (embedding-in), the primary interface."""

    def search(
        self, queries: np.ndarray, k: int
    ) -> tuple[np.ndarray, np.ndarray]: ...

    def retrieve(self, query_emb: np.ndarray, top_k: int = 5): ...

    def get_stats(self, reset: bool = False) -> dict: ...
