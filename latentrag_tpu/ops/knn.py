"""All-pairs k-NN graph on the accelerator: the HNSW-build assist.

Graph ANN construction is the one tier that could not reach the 8.8M-row
parity corpus: per-insertion beam searches are pointer-chasing host work
(~10h single-core at 8.8M, docs/BACKENDS_200K.md). But the expensive part —
finding each row's nearest neighbours — is exactly what this framework's
blocked matmul + top-k kernels do at speed-of-light on the MXU: computing
k-NN lists for ALL rows is one [N, N] problem tiled as query blocks over
the resident corpus (8.8M x 8.8M x 64 ~= 10 PFLOP ~= minutes at the
measured 60-110 TFLOP/s), after which the graph ASSEMBLY (diversity
pruning + reverse links + a tiny beam-built hierarchy) is linear host work
(``native/latentrag_native.cpp::build_from_knn``).

The reference has no equivalent — FAISS builds HNSW on CPU
(``FAISSEmbeddingRetriever.py:95-99``); this is the TPU-native redesign of
that capability (SURVEY §2.4 item 1).
"""

from __future__ import annotations

import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

from .topk import approx_topk, exact_topk

log = logging.getLogger("latentrag.ops")


def strip_self(idx: np.ndarray, row_start: int, k: int) -> np.ndarray:
    """Drop each row's self-id (and invalid <0 ids) from candidate lists.

    ``idx`` is [rows, kk] best-first candidate ids for corpus rows
    ``row_start .. row_start+rows``; returns [rows, k] with the first k
    non-self valid entries per row, -1 sentinels where fewer exist.
    Vectorised: rank kept entries by position, scatter into the output.
    """
    rows = np.arange(row_start, row_start + idx.shape[0],
                     dtype=idx.dtype)[:, None]
    keep = (idx != rows) & (idx >= 0)
    keep_rank = np.cumsum(keep, axis=1) - 1  # position among kept
    take = keep & (keep_rank < k)
    out = np.full((idx.shape[0], k), -1, dtype=np.int32)
    r, c = np.nonzero(take)
    out[r, keep_rank[r, c]] = idx[r, c]
    return out


def knn_graph(
    corpus,
    k: int,
    *,
    metric: str = "cosine",
    query_block: int = 4096,
    block_size: int = 1048576,
    exact: bool = False,
    recall_target: float = 0.95,
) -> np.ndarray:
    """[N, k] int32 neighbour ids per row, self excluded, best-first.

    ``corpus`` must already be prepared for ``metric`` (normalized for
    cosine, whitened for mahalanobis — same contract as the top-k kernels).
    Queries are the corpus rows themselves, streamed in ``query_block``
    batches so the score working set stays [query_block, block_size].
    ``exact=False`` uses ``approx_max_k`` per block (recall_target applies
    per block; plenty for graph candidates — the assembly's diversity
    heuristic only needs a good candidate pool, not a perfect one).
    """
    corpus = jnp.asarray(corpus)
    n = int(corpus.shape[0])
    if n == 0:
        return np.zeros((0, k), np.int32)
    kk = min(k + 1, n)  # +1: the row itself ranks first and is dropped
    search = exact_topk if exact else approx_topk
    kwargs = {} if exact else {"recall_target": recall_target}

    # ONE compiled program with a TRACED start index: an eager per-offset
    # slice would make every batch a distinct constant-folded executable —
    # 256 remote compiles at 1M rows dominated the round-3 first measurement
    # (~0.4s each through the relay)
    @jax.jit
    def block_step(c, start):
        qb_rows = jax.lax.dynamic_slice_in_dim(c, start, query_block, axis=0)
        return search(qb_rows, c, k=kk, metric=metric,
                      block_size=block_size, **kwargs)[1]

    out = np.empty((n, k), dtype=np.int32)
    t0 = time.perf_counter()
    for qs in range(0, n, query_block):
        qe = min(qs + query_block, n)
        if qe - qs == query_block:
            idx = block_step(corpus, qs)
        else:  # remainder block: one extra compile at a different shape
            qb_rows = jax.lax.slice_in_dim(corpus, qs, qe, axis=0)
            _, idx = search(qb_rows, corpus, k=kk, metric=metric,
                            block_size=block_size, **kwargs)
        out[qs:qe] = strip_self(np.asarray(idx), qs, k)
    log.info(
        "knn_graph: %d x %d (k=%d, %s) in %.1fs on %s",
        n, int(corpus.shape[1]), k, "exact" if exact else "approx",
        time.perf_counter() - t0, jax.default_backend(),
    )
    return out
