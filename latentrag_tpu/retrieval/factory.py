"""Retriever factory (parity: ``retrieval/retriever.py:17-34``)."""

from __future__ import annotations

import logging
from typing import Sequence

import numpy as np

from ..utils.config import RetrievalConfig
from .dense import DenseRetriever, make_fingerprint

log = logging.getLogger("latentrag.retrieval")


def build_retriever(
    embeddings: np.ndarray,
    texts: Sequence[str],
    doc_ids: Sequence | None,
    cfg: RetrievalConfig,
    *,
    mesh=None,
    embedding_model: str | None = None,
    ae_type: str | None = None,
    latent_dim: int | None = None,
    chunking: dict | None = None,
) -> DenseRetriever:
    """Config-driven dense retriever construction + build.

    Unlike the reference (which drops the fingerprint kwargs on the floor,
    ``main.py:248-253`` — SURVEY §2.2), the fingerprint always carries the
    full provenance so on-disk compatibility checks are meaningful.
    """
    if cfg.backend in ("hnsw", "ivfpq"):
        from .ann_retriever import ANNRetriever

        ann = ANNRetriever(cfg, cfg.backend)
        ann.build(embeddings, texts, doc_ids)
        return ann

    backend = {
        "dense": cfg.kernel,
        "bruteforce": "xla_exact",
    }.get(cfg.backend, "auto")
    retriever = DenseRetriever(
        metric=cfg.metric,
        backend=backend,
        block_size=cfg.block_size,
        recall_target=cfg.recall_target,
        store_dtype=cfg.store_dtype,
        binary_oversample=cfg.binary_oversample,
        index_path=cfg.index_path or None,
        mesh=mesh if cfg.shard_corpus else None,
    )
    fp = make_fingerprint(
        d=int(embeddings.shape[1]),
        embedding_model=embedding_model,
        ae_type=ae_type,
        latent_dim=latent_dim,
        chunking=chunking,
        metric=cfg.metric,
        normalize=cfg.normalize,
    )
    retriever.build(embeddings, texts, doc_ids, fingerprint=fp)
    return retriever
