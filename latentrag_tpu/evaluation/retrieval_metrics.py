"""Retrieval quality metrics (Recall@k, MRR@k, nDCG@k) as batch array ops.

Parity with ``evaluation/retrieval_metrics.py:14-96``: same metric
definitions (binary relevance; nDCG = 1/log2(rank+1) for the first relevant
hit normalised by the ideal DCG), same ``"Metric@k"`` string parsing, same
``{metric: {mean, std(ddof=1)}}`` output with optional per-query rows — but
computed over the whole query batch as one [Q, K] hit-matrix computation
instead of per-query Python loops.
"""

from __future__ import annotations

import re
from functools import partial
from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

_METRIC_RE = re.compile(r"^\s*([A-Za-z]+)\s*@\s*(\d+)\s*$")


def parse_metric(name: str) -> tuple[str, int]:
    m = _METRIC_RE.match(name)
    if not m:
        raise ValueError(f"metric {name!r} must look like 'Recall@10'")
    return m.group(1).lower(), int(m.group(2))


def hit_matrix(
    retrieved_ids: Sequence[Sequence], relevant_ids: Sequence
) -> np.ndarray:
    """[Q, K] boolean: retrieved j is relevant for query i.

    ``relevant_ids[i]`` may be a single id or a collection of ids. IDs may be
    any hashable type (doc-id strings included, as the reference pipeline
    passes them — ``main.py:321``).
    """
    nq = len(retrieved_ids)
    k = max((len(r) for r in retrieved_ids), default=0)
    out = np.zeros((nq, k), dtype=bool)
    for i, row in enumerate(retrieved_ids):
        rel = relevant_ids[i]
        if isinstance(rel, (str, bytes)) or not hasattr(rel, "__iter__"):
            rel = {rel}
        else:
            rel = set(rel)
        seen: set = set()  # duplicate retrieved ids count at most once
        for j, rid in enumerate(row):
            out[i, j] = rid in rel and rid not in seen
            seen.add(rid)
    return out


@partial(jax.jit, static_argnames=("k",))
def _metrics_from_hits(hits: jax.Array, n_relevant: jax.Array, k: int):
    """Per-query metric vectors from the [Q, K] hit matrix.

    recall@k: fraction of relevant found in top k;
    mrr@k: 1/rank of first hit within top k (0 if none);
    ndcg@k: DCG over hits / ideal DCG given n_relevant.
    """
    h = hits[:, :k].astype(jnp.float32)
    nrel = jnp.maximum(n_relevant.astype(jnp.float32), 1.0)
    recall = jnp.sum(h, axis=1) / nrel

    ranks = jnp.arange(1, k + 1, dtype=jnp.float32)[None, :]
    first = jnp.argmax(h, axis=1)  # first hit position (0 if none)
    has_hit = jnp.any(h > 0, axis=1)
    mrr = jnp.where(has_hit, 1.0 / (first + 1.0), 0.0)

    discounts = 1.0 / jnp.log2(ranks + 1.0)
    dcg = jnp.sum(h * discounts, axis=1)
    ideal_n = jnp.minimum(nrel, float(k))
    # ideal DCG: first ideal_n positions hit
    pos_mask = ranks <= ideal_n[:, None]
    idcg = jnp.sum(pos_mask * discounts, axis=1)
    ndcg = dcg / jnp.maximum(idcg, 1e-12)
    return {"recall": recall, "mrr": mrr, "ndcg": ndcg}


def evaluate_retrieval(
    retrieved_ids: Sequence[Sequence],
    relevant_ids: Sequence,
    metrics: Sequence[str] = ("Recall@10", "MRR@10", "nDCG@10"),
    return_per_query: bool = False,
) -> Mapping[str, dict]:
    """Batch evaluation -> {metric_name: {"mean":…, "std":…}}.

    Accepts single-query inputs for compat (wraps to a batch of one, mirror
    of ``retrieval_metrics.py:64-66``).
    """
    if retrieved_ids and not isinstance(retrieved_ids[0], (list, tuple, np.ndarray)):
        retrieved_ids = [retrieved_ids]
        relevant_ids = [relevant_ids]

    hits = hit_matrix(retrieved_ids, relevant_ids)
    n_rel = np.array(
        [
            len(r) if hasattr(r, "__len__") and not isinstance(r, (str, bytes)) else 1
            for r in relevant_ids
        ],
        dtype=np.int32,
    )

    out: dict[str, dict] = {}
    per_query: dict[str, np.ndarray] = {}
    for name in metrics:
        kind, k = parse_metric(name)
        if kind not in ("recall", "mrr", "ndcg"):
            raise ValueError(f"unknown metric kind {kind!r}")
        k_eff = min(k, hits.shape[1]) if hits.shape[1] else k
        vec = np.asarray(
            _metrics_from_hits(jnp.asarray(hits), jnp.asarray(n_rel), k_eff)[kind]
        )
        std = float(np.std(vec, ddof=1)) if len(vec) > 1 else 0.0
        out[name] = {"mean": float(np.mean(vec)) if len(vec) else 0.0, "std": std}
        per_query[name] = vec
    if return_per_query:
        return out, per_query
    return out
