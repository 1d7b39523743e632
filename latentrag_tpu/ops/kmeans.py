"""Lloyd's k-means on the accelerator: the IVF-PQ-build assist.

IVF-PQ construction is dominated by k-means assignment sweeps — n·k·d
FLOPs per iteration, which is 4.6 TFLOP/iteration at the 8.8M-row /
4096-list parity scale and takes tens of minutes on a CPU core
(``native/latentrag_native.cpp::kmeans``, measured 52 s just at 200k).
Assignment is a blocked matmul + argmax and the centroid update is a
one-hot-matmul reduction — both MXU-native, so the full train collapses
to seconds on device. Semantics mirror the C++ trainer exactly (plain L2
Lloyd's, empty clusters re-seeded from random rows) so device-trained
centroids drop into the same C++ serving index via ``ivfpq_set_trained``.

The reference wraps FAISS's CPU trainer (``IndexIVFPQ``,
``FAISSEmbeddingRetriever.py:100-102``); this is the TPU-native redesign
of that capability (SURVEY §2.4 item 1), same move as ``ops/knn.py`` for
the HNSW build.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k", "iters", "block_size"))
def kmeans(
    x: jax.Array,
    k: int,
    *,
    iters: int = 15,
    key: jax.Array,
    block_size: int = 131072,
) -> jax.Array:
    """[k, d] float32 centroids by Lloyd's iterations under L2.

    Rows are processed in blocks of ``block_size``: per block, assignment
    is ``argmax(x·cᵀ - ||c||²/2)`` (the ||x||² term is rank-neutral) and
    the update accumulates ``one_hotᵀ @ x`` — two matmuls per block, no
    [n, k] materialisation beyond one block. Empty clusters re-seed from
    random data rows (matching the C++ trainer); padding rows are
    assigned to a k-th ghost segment and never touch real sums.
    """
    n, d = x.shape
    # keep the big operand in its STORE dtype (int8/bf16 corpora): a
    # wholesale fp32 cast + padded copy materialises ~2 full fp32
    # corpora inside one program (8.2 GB each at 32M x 64 — the measured
    # r4 OOM); only the [block_size, d] slice is cast, exactly like the
    # search kernels
    k_eff = min(k, n)
    init_idx = jax.random.choice(key, n, (k_eff,), replace=False)
    cent = x[init_idx].astype(jnp.float32)
    if k_eff < k:  # degenerate tiny inputs: duplicate rows to keep shape
        reps = -(-k // k_eff)
        cent = jnp.tile(cent, (reps, 1))[:k]

    pad = (-n) % block_size
    xp = jnp.concatenate([x, jnp.zeros((pad, d), x.dtype)]) if pad else x
    n_blocks = xp.shape[0] // block_size
    row_ids = jnp.arange(block_size)

    def one_iter(it, cent):
        def block_step(carry, b):
            sums, counts = carry
            xb = jax.lax.dynamic_slice_in_dim(
                xp, b * block_size, block_size, axis=0
            ).astype(jnp.float32)
            scores = xb @ cent.T - 0.5 * jnp.sum(cent * cent, axis=1)[None, :]
            assign = jnp.argmax(scores, axis=1)
            valid = (b * block_size + row_ids) < n
            assign = jnp.where(valid, assign, k)  # ghost segment for pads
            onehot = jax.nn.one_hot(assign, k + 1, dtype=jnp.float32)
            sums = sums + onehot.T[:k] @ xb
            counts = counts + jnp.sum(onehot, axis=0)[:k]
            return (sums, counts), None

        (sums, counts), _ = jax.lax.scan(
            block_step,
            (jnp.zeros((k, d), jnp.float32), jnp.zeros((k,), jnp.float32)),
            jnp.arange(n_blocks, dtype=jnp.int32),
        )
        # empty clusters: re-seed from (deterministic) random data rows
        reseed = x[jax.random.randint(
            jax.random.fold_in(key, it), (k,), 0, n
        )].astype(jnp.float32)
        empty = counts < 0.5
        new_cent = sums / jnp.maximum(counts, 1.0)[:, None]
        return jnp.where(empty[:, None], reseed, new_cent)

    return jax.lax.fori_loop(0, iters, one_iter, cent)


@partial(jax.jit, static_argnames=("block_size",))
def assign_clusters(
    x: jax.Array, centroids: jax.Array, *, block_size: int = 131072
) -> jax.Array:
    """[n] int32 nearest-centroid (L2) ids, blocked like ``kmeans``.

    Like ``kmeans``, the big operand keeps its STORE dtype end to end
    (this is the sweep that touches EVERY corpus row — a wholesale fp32
    cast + padded copy is ~2 full fp32 corpora in one program, the
    measured r4 32M OOM); only the [block_size, d] slice is cast.
    """
    n, d = x.shape
    c = centroids.astype(jnp.float32)
    pad = (-n) % block_size
    xp = jnp.concatenate([x, jnp.zeros((pad, d), x.dtype)]) if pad else x
    n_blocks = xp.shape[0] // block_size

    def block_step(_, b):
        xb = jax.lax.dynamic_slice_in_dim(
            xp, b * block_size, block_size, axis=0
        ).astype(jnp.float32)
        scores = xb @ c.T - 0.5 * jnp.sum(c * c, axis=1)[None, :]
        return None, jnp.argmax(scores, axis=1).astype(jnp.int32)

    _, out = jax.lax.scan(
        block_step, None, jnp.arange(n_blocks, dtype=jnp.int32)
    )
    return out.reshape(-1)[:n]


def ivfpq_train_device(
    x,
    nlist: int,
    m: int,
    *,
    ksub: int = 256,
    iters: int = 15,
    seed: int = 0,
    block_size: int = 131072,
):
    """Device-trained IVF-PQ parameters: (coarse [nlist,d], codebooks
    [m,ksub,dsub]) as host float32 — drop-in for the C++ tier via
    ``IVFPQIndex.set_trained``. Mirrors ``ivfpq_train``'s semantics:
    L2 Lloyd's for the coarse quantizer, then per-subspace L2 Lloyd's on
    the residuals of each vector's nearest list."""
    import numpy as np

    x = jnp.asarray(x)
    n, d = x.shape
    dsub = d // m
    key = jax.random.PRNGKey(seed)
    coarse = kmeans(x, nlist, iters=iters, key=key, block_size=block_size)
    assigns = assign_clusters(x, coarse, block_size=block_size)
    resid = x.astype(jnp.float32) - coarse[assigns]
    books = []
    for s in range(m):  # m small; each call reuses one compiled program
        sub = jax.lax.slice_in_dim(resid, s * dsub, (s + 1) * dsub, axis=1)
        books.append(kmeans(
            sub, ksub, iters=iters, key=jax.random.fold_in(key, 1000 + s),
            block_size=block_size,
        ))
    return np.asarray(coarse), np.asarray(jnp.stack(books))


def ivfpq_encode_device(x, coarse, codebooks, *, block_size: int = 131072):
    """Device assignment + PQ encoding: (assigns [n] int32, codes [n,m]
    uint8) as host arrays for ``IVFPQIndex.add_encoded``."""
    import numpy as np

    x = jnp.asarray(x)
    cb = jnp.asarray(codebooks)
    coarse = jnp.asarray(coarse)
    assigns = assign_clusters(x, coarse, block_size=block_size)
    resid = x.astype(jnp.float32) - coarse[assigns]
    codes = pq_encode(resid, cb, m=int(cb.shape[0]),
                      block_size=min(block_size, 32768))
    return np.asarray(assigns), np.asarray(codes)


@partial(jax.jit, static_argnames=("m", "block_size"))
def pq_encode(
    resid: jax.Array, codebooks: jax.Array, *, m: int,
    block_size: int = 32768,
) -> jax.Array:
    """[n, m] uint8 PQ codes: per-subspace nearest codebook entry (L2).

    ``resid`` is [n, d] residuals (x - coarse centroid), ``codebooks`` is
    [m, ksub, dsub] — the same layout the C++ tier stores. Rows are
    processed in blocks like every other stage here: an unblocked
    [n, m, ksub] score tensor is ~144 GB fp32 at the 8.8M parity scale
    (the default 32k block keeps the per-block tensor at ~0.5 GB).
    """
    n, d = resid.shape
    dsub = d // m
    cb = codebooks.astype(jnp.float32)  # [m, ksub, dsub]
    half_norm = 0.5 * jnp.sum(cb * cb, axis=2)  # [m, ksub]
    pad = (-n) % block_size
    r = resid.astype(jnp.float32)
    if pad:
        r = jnp.concatenate([r, jnp.zeros((pad, d), jnp.float32)])
    n_blocks = r.shape[0] // block_size

    def block_step(_, b):
        rb = jax.lax.dynamic_slice_in_dim(
            r, b * block_size, block_size, axis=0
        ).reshape(block_size, m, dsub)
        scores = jnp.einsum("nmd,mkd->nmk", rb, cb) - half_norm[None, :, :]
        return None, jnp.argmax(scores, axis=2).astype(jnp.uint8)

    _, out = jax.lax.scan(
        block_step, None, jnp.arange(n_blocks, dtype=jnp.int32)
    )
    return out.reshape(-1, m)[:n]
