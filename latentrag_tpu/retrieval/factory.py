"""Retriever factory (parity: ``retrieval/retriever.py:17-34``)."""

from __future__ import annotations

import logging
from typing import Sequence

import numpy as np

from ..utils.config import RetrievalConfig
from .dense import DenseRetriever, make_fingerprint

log = logging.getLogger("latentrag.retrieval")

# backends whose index consumes DEVICE arrays (the encode->index path can
# skip host materialisation); the C++ ANN tiers and BM25 consume numpy
DEVICE_BACKENDS = ("dense", "bruteforce")


def _make_dense(cfg: RetrievalConfig, mesh) -> DenseRetriever:
    """Construct (not build) a DenseRetriever from config — single source
    for the config->constructor mapping used by both the cold-build and
    warm-boot paths."""
    backend = {
        "dense": cfg.kernel,
        "bruteforce": "xla_exact",
    }.get(cfg.backend, "auto")
    return DenseRetriever(
        metric=cfg.metric,
        backend=backend,
        block_size=cfg.block_size,
        recall_target=cfg.recall_target,
        store_dtype=cfg.store_dtype,
        binary_oversample=cfg.binary_oversample,
        index_path=cfg.index_path or None,
        mesh=mesh if cfg.shard_corpus else None,
        ivf_nlist=cfg.ivf_nlist,
        ivf_cap=cfg.ivf_cap,
        ivf_nprobe=cfg.ivf_nprobe,
        ivf_query_limit=cfg.ivf_query_limit,
        ivf_selfcheck=cfg.ivf_selfcheck,
    )


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
    metadata: Sequence[dict] | None = None,
) -> DenseRetriever:
    """Config-driven dense retriever construction + build.

    Unlike the reference (which drops the fingerprint kwargs on the floor,
    ``main.py:248-253`` — SURVEY §2.2), the fingerprint always carries the
    full provenance so on-disk compatibility checks are meaningful.
    ``metadata`` (optional, row-aligned dicts) enables
    ``search(..., filter={"where": ...})`` on the dense and ANN tiers.
    """
    if cfg.backend in ("hnsw", "ivfpq"):
        from .ann_retriever import ANNRetriever

        ann = ANNRetriever(cfg, cfg.backend)
        ann.build(
            embeddings, texts, doc_ids,
            embedding_model=embedding_model, ae_type=ae_type,
            metadata=metadata,
        )
        return ann

    return _dense_retriever(
        cfg, embeddings, texts, doc_ids, mesh=mesh,
        embedding_model=embedding_model, ae_type=ae_type,
        latent_dim=latent_dim, chunking=chunking, metadata=metadata,
    )


def load_retriever(
    cfg: RetrievalConfig,
    *,
    mesh=None,
    expect: dict | None = None,
):
    """Warm boot: reconstruct a retriever purely from its persisted store —
    no embeddings, no corpus encode (the reference's mmap-load story,
    ``FAISSEmbeddingRetriever.py:65-69``, which its pipeline never uses
    because build() always re-encodes). Returns ``None`` when no loadable
    store exists or the persisted provenance contradicts ``expect`` —
    callers then fall back to the cold ``build_retriever`` path.

    ``expect`` maps fingerprint keys (``embedding_model``, ``ae_type``, …)
    to the values the caller is serving with; a stored value of ``None``
    (legacy store) is treated as a wildcard.
    """
    if not cfg.index_path:
        return None
    if cfg.backend in ("hnsw", "ivfpq"):
        from .ann_retriever import ANNRetriever

        ann = ANNRetriever(cfg, cfg.backend)
        return ann if ann.load_persisted(expect=expect) else None
    retriever = _make_dense(cfg, mesh)
    if not retriever.is_built:
        return None
    fp = retriever.fingerprint or {}
    for key, want in (expect or {}).items():
        have = fp.get(key)
        if have is not None and have != want:
            log.warning(
                "persisted index %s=%r contradicts requested %r; "
                "falling back to cold build", key, have, want,
            )
            return None
    return retriever


def _dense_retriever(
    cfg, embeddings, texts, doc_ids, *, mesh, embedding_model, ae_type,
    latent_dim, chunking, metadata=None,
):
    retriever = _make_dense(cfg, mesh)
    fp = make_fingerprint(
        d=int(embeddings.shape[1]),
        embedding_model=embedding_model,
        ae_type=ae_type,
        latent_dim=latent_dim,
        chunking=chunking,
        metric=cfg.metric,
        normalize=cfg.normalize,
    )
    retriever.build(embeddings, texts, doc_ids, fingerprint=fp,
                    metadata=metadata)
    return retriever
