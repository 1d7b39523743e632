"""Pod-scale k-NN graph construction: ring-rotated corpus shards.

The single-chip TPU-assisted HNSW build (``ops/knn.py`` + C++ assembly,
docs/BACKENDS_200K.md: 26x over insertion beams at 1M) is bounded by one
chip's HBM. This is the multi-chip version, designed mesh-first rather
than ported (the reference builds HNSW single-threaded on CPU inside
FAISS, ``FAISSEmbeddingRetriever.py:95-99``):

- corpus rows live **sharded** over the mesh axis — aggregate HBM scales
  with mesh size, so a v5e-8 holds corpora 8x beyond one chip;
- every device computes the k-NN lists for *its* row shard (the graph
  build needs every row as a query — embarrassingly parallel on the
  query side);
- the corpus makes one full trip around the ring: at each of P steps a
  device scores its (resident) query rows against the corpus shard it
  currently holds, folds the result into a running top-k, and forwards
  the shard to its neighbour with ``lax.ppermute`` — the classic
  systolic pattern, P matmuls of [n/P, n/P] per device with the corpus
  crossing ICI exactly once. Peak inter-chip traffic equals corpus size
  / P per step; the running top-k state stays [n/P, k'] per device.

Merging follows ``sharded_topk``'s padding discipline: ``shard_rows``
zero-pads to a mesh multiple, so each step requests P-1 extra candidates
and pad rows are masked to -inf before the final top-k, which can then
never displace a genuine neighbour.
"""

from __future__ import annotations

import logging
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.knn import strip_self
from ..ops.topk import NEG_INF, approx_topk, exact_topk
from .mesh import DATA_AXIS, shard_rows

log = logging.getLogger("latentrag.parallel")


def sharded_knn_graph(
    corpus,
    k: int,
    mesh: Mesh,
    *,
    metric: str = "cosine",
    exact: bool = False,
    recall_target: float = 0.95,
    block_size: int = 1048576,
    axis: str = DATA_AXIS,
) -> np.ndarray:
    """[N, k] int32 neighbour ids per row, self excluded, best-first.

    Same contract as ``ops.knn.knn_graph`` (corpus prepared for
    ``metric``; -1 sentinels when fewer than k neighbours exist), computed
    over ``mesh``. The corpus may arrive as a host array or any device
    layout; it is laid out row-sharded internally.
    """
    n = int(corpus.shape[0])
    if n == 0:
        return np.zeros((0, k), np.int32)
    p = mesh.shape[axis]
    c_shard = shard_rows(jnp.asarray(corpus), mesh, axis)
    padded = int(c_shard.shape[0])
    shard_n = padded // p
    kk = min(k + 1, n)  # +1: self ranks first and is dropped host-side
    local_k = min(kk + p - 1, shard_n)  # per-step candidates
    carry_k = min(kk + p - 1, padded)  # running top-k width

    if exact:
        def local_search(q, c):
            return exact_topk(q, c, k=local_k, metric=metric,
                              block_size=min(block_size, 8192))
    else:
        def local_search(q, c):
            return approx_topk(q, c, k=local_k, metric=metric,
                               block_size=block_size,
                               recall_target=recall_target)

    def _ring(rows):
        me = jax.lax.axis_index(axis)

        def step(t, carry):
            run_s, run_i, cur = carry
            # after t forward rotations device ``me`` holds the shard
            # that started at ring position (me - t) mod p
            src = jax.lax.rem(me - t + p, p)
            s, i = local_search(rows, cur)
            gi = i + src * shard_n
            cat_s = jnp.concatenate([run_s, s], axis=1)
            cat_i = jnp.concatenate([run_i, gi], axis=1)
            new_s, sel = jax.lax.top_k(cat_s, carry_k)
            new_i = jnp.take_along_axis(cat_i, sel, axis=1)
            cur = jax.lax.ppermute(
                cur, axis, perm=[(q, (q + 1) % p) for q in range(p)]
            )
            return new_s, new_i, cur

        init = (
            jnp.full((shard_n, carry_k), NEG_INF, jnp.float32),
            jnp.full((shard_n, carry_k), -1, jnp.int32),
            rows,
        )
        run_s, run_i, _ = jax.lax.fori_loop(0, p, step, init)
        # pad rows (global id >= n) must never survive the final cut
        run_s = jnp.where((run_i >= 0) & (run_i < n), run_s, NEG_INF)
        top_s, sel = jax.lax.top_k(run_s, min(kk, carry_k))
        top_i = jnp.take_along_axis(run_i, sel, axis=1)
        top_i = jnp.where(top_s > NEG_INF * 0.5, top_i, -1)
        return top_i

    jitted = jax.jit(shard_map(
        _ring, mesh=mesh, in_specs=(P(axis),), out_specs=P(axis),
        check_vma=False,
    ))
    t0 = time.perf_counter()
    ids = np.asarray(jitted(c_shard))[:n]  # drop pad query rows
    out = strip_self(ids, 0, k)
    log.info(
        "sharded_knn_graph: %d x %d (k=%d, %s) over %d devices in %.1fs",
        n, int(corpus.shape[1]), k, "exact" if exact else "approx", p,
        time.perf_counter() - t0,
    )
    return out
