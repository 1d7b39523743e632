"""Retriever wrapper over the native ANN tiers (HNSW / IVF-PQ).

Gives the C++ indexes the same batch-first ``search``/``retrieve``/
``get_stats`` surface as ``DenseRetriever`` so the factory can dispatch on
``retrieval.backend`` exactly like the reference dispatches FAISS index
types (``retrieval/retriever.py:17-34`` + ``FAISSEmbeddingRetriever``
``index_type`` handling).
"""

from __future__ import annotations

import logging
import time
from typing import Sequence

import numpy as np

from ..utils.config import RetrievalConfig
from ..utils.timing import StatsTracker
from .ann import HNSWIndex, IVFPQIndex

log = logging.getLogger("latentrag.retrieval")


def _normalize_rows(x: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(x, axis=1, keepdims=True)
    return x / np.maximum(n, 1e-12)


class ANNRetriever:
    """HNSW or IVF-PQ over (optionally normalized) embeddings."""

    # which metrics each native scorer can actually rank correctly:
    # HNSW scores inner products (cosine via normalization, raw dot);
    # IVF-PQ scores -L2 (euclidean natively; cosine via normalization,
    # where argmin L2 == argmax cosine on unit vectors). Anything else
    # would return plausible-looking WRONG rankings, so it is rejected —
    # the dense TPU tier supports every metric including mahalanobis.
    _SUPPORTED = {
        "hnsw": ("cosine", "dot"),
        "ivfpq": ("cosine", "euclidean"),
    }

    def __init__(self, cfg: RetrievalConfig, kind: str):
        if kind not in ("hnsw", "ivfpq"):
            raise ValueError(f"unknown ANN kind {kind!r}")
        if cfg.metric not in self._SUPPORTED[kind]:
            raise ValueError(
                f"{kind} backend cannot rank metric {cfg.metric!r} "
                f"(supports {self._SUPPORTED[kind]}); use backend='dense' "
                f"for euclidean/mahalanobis exact search"
            )
        self.cfg = cfg
        self.kind = kind
        self.texts: list = []
        self.doc_ids: list = []
        self.stats = StatsTracker()
        self._index = None
        self._normalize = cfg.metric == "cosine"

    def build(
        self,
        embeddings: np.ndarray,
        texts: Sequence[str],
        doc_ids: Sequence | None = None,
        **_: object,
    ) -> None:
        emb = np.ascontiguousarray(embeddings, dtype=np.float32)
        if self._normalize:
            emb = _normalize_rows(emb)
        self.texts = list(texts)
        self.doc_ids = (
            list(doc_ids) if doc_ids is not None else list(range(len(texts)))
        )
        t0 = time.perf_counter()
        if self.kind == "hnsw":
            ix = HNSWIndex(
                emb.shape[1],
                M=self.cfg.hnsw_m,
                ef_construction=self.cfg.hnsw_ef_construction,
                ef_search=self.cfg.hnsw_ef_search,
            )
            ix.add(emb)
        else:
            nlist = min(self.cfg.ivfpq_nlist, max(1, emb.shape[0] // 8))
            m = self.cfg.ivfpq_m
            while emb.shape[1] % m != 0:
                m //= 2
            ix = IVFPQIndex(
                emb.shape[1], nlist=nlist, m=m, nbits=self.cfg.ivfpq_nbits
            )
            ix.train(emb)
            ix.add(emb)
        self._index = ix
        self.stats.add_build(time.perf_counter() - t0)

    @property
    def is_built(self) -> bool:
        return self._index is not None

    def search(self, queries: np.ndarray, k: int):
        if self._index is None:
            raise RuntimeError("index not built")
        q = np.ascontiguousarray(queries, dtype=np.float32)
        if self._normalize:
            q = _normalize_rows(q)
        t0 = time.perf_counter()
        if self.kind == "hnsw":
            scores, ids = self._index.search(q, k)
        else:
            scores, ids = self._index.search(
                q, k, nprobe=max(1, self.cfg.ivfpq_nlist // 64)
            )
        self.stats.add_search_batch(time.perf_counter() - t0, q.shape[0])
        return scores, ids

    def retrieve(self, query_emb: np.ndarray, top_k: int = 5):
        q = np.asarray(query_emb, dtype=np.float32)
        if q.ndim == 1:
            q = q[None, :]
        scores, idx = self.search(q, top_k)
        sel = [j for j in idx[0] if j >= 0]
        return (
            [self.texts[j] for j in sel],
            scores[0][: len(sel)].tolist(),
            [self.doc_ids[j] for j in sel],
        )

    def get_stats(self, reset: bool = False) -> dict:
        return self.stats.get(reset)
