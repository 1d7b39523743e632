"""Exact dense top-k retrieval as tiled XLA ops (the differential oracle).

TPU-first replacement for the reference's exact search paths (FAISS
``IndexFlatIP``, ``FAISSEmbeddingRetriever.py:93-94``, and the torch
brute-force matmul, ``bruteforce.py:58-83``): the corpus is streamed in
fixed-size blocks through one fused matmul + running-top-k merge under
``lax.scan``, so the full [Q, N] score matrix is never materialised and the
working set stays HBM-bandwidth friendly at any corpus size.

All queries are scored in one batch (the reference searches one query at a
time through a batch API — SURVEY §3.1 flags this as the inefficiency to
remove).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .distances import pairwise_scores

# python float, NOT jnp.float32(...): a module-level jnp constant creates a
# concrete device array at import time, initialising the XLA backend — which
# breaks jax.distributed.initialize for any process that imports this package
# before wiring the multi-process runtime
NEG_INF = float(-3.4e38)


def _pad_corpus(corpus: jax.Array, block_size: int):
    """Pad corpus rows to a block multiple; returns (padded, n_valid)."""
    n = corpus.shape[0]
    pad = (-n) % block_size
    if pad:
        corpus = jnp.pad(corpus, ((0, pad), (0, 0)))
    return corpus, n


@partial(jax.jit, static_argnames=("n",))
def unpack_row_mask(packed: jax.Array, n: int) -> jax.Array:
    """uint8 [ceil(n/8)] little-endian bits -> bool [n] row mask.

    Filters upload PACKED over the host->device link (8x fewer bytes than
    a bool array — the remote-TPU tunnel runs ~MB/s) and unpack once on
    the VPU; retrievers cache the unpacked device mask per filter spec.
    """
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (packed[:, None] >> shifts[None, :]) & jnp.uint8(1)
    return bits.reshape(-1)[:n].astype(bool)


def _apply_mask(scores: jax.Array, mask_block) -> jax.Array:
    """Force masked-out corpus columns to NEG_INF (no-op for mask=None).
    A cheap [Q, B] select that XLA fuses into the matmul consumer, so
    filtered search keeps the unfiltered kernels' memory profile."""
    if mask_block is None:
        return scores
    return jnp.where(mask_block[None, :], scores, NEG_INF)


@partial(jax.jit, static_argnames=("k", "metric", "block_size"))
def exact_topk(
    queries: jax.Array,
    corpus: jax.Array,
    k: int,
    metric: str = "cosine",
    block_size: int = 8192,
    mask: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Top-k over the full corpus. Returns (scores [Q,k], indices [Q,k]).

    Inputs must already be prepared for ``metric`` (see
    ``distances.prepare_for_metric``). ``k`` is static; indices refer to
    original corpus rows; padded rows can never win (scores forced to -inf).
    ``mask`` (bool [N], optional) restricts eligibility to True rows —
    excluded rows score NEG_INF, so when fewer than k rows are eligible the
    tail carries NEG_INF scores (callers sentinel those ids to -1).
    """
    q = queries
    n_total = corpus.shape[0]
    k = min(k, n_total) if n_total else k
    if n_total <= block_size:
        scores = _apply_mask(pairwise_scores(q, corpus, metric), mask)
        top_s, top_i = jax.lax.top_k(scores, k)
        return top_s, top_i

    corpus_p, n_valid = _pad_corpus(corpus, block_size)
    n_blocks = corpus_p.shape[0] // block_size
    blocks = corpus_p.reshape(n_blocks, block_size, corpus.shape[1])
    if mask is not None:
        pad = corpus_p.shape[0] - n_total
        mask_p = jnp.pad(mask, (0, pad)) if pad else mask  # pads False
        mask_blocks = mask_p.reshape(n_blocks, block_size)
    nq = q.shape[0]

    init = (
        jnp.full((nq, k), NEG_INF, dtype=jnp.float32),
        jnp.zeros((nq, k), dtype=jnp.int32),
    )

    def body(carry, inp):
        run_s, run_i = carry
        block, m_blk, b_idx = inp
        scores = pairwise_scores(q, block, metric)  # [Q, B] fp32
        scores = _apply_mask(scores, m_blk)
        base = b_idx * block_size
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + base
        scores = jnp.where(col < n_valid, scores, NEG_INF)
        blk_s, blk_local = jax.lax.top_k(scores, k)
        blk_i = jnp.take_along_axis(col, blk_local, axis=1)
        cat_s = jnp.concatenate([run_s, blk_s], axis=1)
        cat_i = jnp.concatenate([run_i, blk_i], axis=1)
        new_s, sel = jax.lax.top_k(cat_s, k)
        new_i = jnp.take_along_axis(cat_i, sel, axis=1)
        return (new_s, new_i), None

    (top_s, top_i), _ = jax.lax.scan(
        body,
        init,
        (
            blocks,
            mask_blocks if mask is not None else None,
            jnp.arange(n_blocks, dtype=jnp.int32),
        ),
    )
    return top_s, top_i


def _merge_topk(parts_s, parts_i, k):
    """Concat per-block candidates and keep the global best k."""
    cat_s = jnp.concatenate(parts_s, axis=1)
    cat_i = jnp.concatenate(parts_i, axis=1)
    top_s, sel = jax.lax.top_k(cat_s, min(k, cat_s.shape[1]))
    return top_s, jnp.take_along_axis(cat_i, sel, axis=1)


def blocked_topk(block_fn, corpus, k, block_size, nq, *, unroll_limit=16,
                 axis=0):
    """Shared block-merge driver for every tiered top-k kernel (bf16
    ``approx_topk``, int8 ``sq8_topk``, 1-bit ``binary_topk``).

    ``block_fn(block_rows, base, kk) -> (scores [nq, kk], GLOBAL ids)``
    scores one corpus block. Up to ``unroll_limit`` blocks unroll in the
    trace over static slices of the ORIGINAL operand (no padded copy, no
    validity mask — the remainder gets its own smaller block, so pad rows
    never exist); past the limit a ``lax.scan`` runs one full block per
    step over dynamic slices to bound program size, with the remainder
    unrolled after the scan and merged once. Measured (r3, in-program
    methodology, docs/ROOFLINE.md "scan vs unroll"): scan ≈ unrolled for
    the bf16 matmul at >=1M-row blocks (within 4%) and 35-55% FASTER for
    the binary unpack kernel (which passes ``unroll_limit=0``) — the
    round-1 "scan defeats fusion ~3x" figure was a dispatch artifact.

    ``axis`` picks the corpus dimension that enumerates rows (1 for the
    transposed packed stores, whose row ids ride the lane dim).
    """
    n_total = corpus.shape[axis]
    if n_total <= unroll_limit * block_size:
        parts_s, parts_i = [], []
        b = 0
        while b < n_total:
            e = min(b + block_size, n_total)
            blk = jax.lax.slice_in_dim(corpus, b, e, axis=axis)
            s, i = block_fn(blk, b, min(k, e - b))
            parts_s.append(s)
            parts_i.append(i)
            b = e
        return _merge_topk(parts_s, parts_i, k)

    n_super = n_total // block_size
    init = (
        jnp.full((nq, k), NEG_INF, dtype=jnp.float32),
        jnp.zeros((nq, k), dtype=jnp.int32),
    )

    def scan_body(carry, b_idx):
        run_s, run_i = carry
        base = b_idx * block_size
        # dynamic slice of the CLOSED-OVER corpus: a reshape-into-xs scan
        # operand forces XLA to materialise a full corpus copy (OOM at
        # 32M x 64 bf16 on one chip)
        blk = jax.lax.dynamic_slice_in_dim(
            corpus, base, block_size, axis=axis
        )
        s, i = block_fn(blk, base, k)
        return _merge_topk([run_s, s], [run_i, i], k), None

    (top_s, top_i), _ = jax.lax.scan(
        scan_body, init, jnp.arange(n_super, dtype=jnp.int32)
    )
    parts_s, parts_i = [top_s], [top_i]
    b = n_super * block_size
    while b < n_total:
        e = min(b + block_size, n_total)
        blk = jax.lax.slice_in_dim(corpus, b, e, axis=axis)
        s, i = block_fn(blk, b, min(k, e - b))
        parts_s.append(s)
        parts_i.append(i)
        b = e
    if len(parts_s) > 1:
        top_s, top_i = _merge_topk(parts_s, parts_i, k)
    return top_s, top_i


@partial(
    jax.jit, static_argnames=("k", "metric", "block_size", "recall_target")
)
def approx_topk(
    queries: jax.Array,
    corpus: jax.Array,
    k: int,
    metric: str = "cosine",
    block_size: int = 1048576,
    recall_target: float = 0.99,
    mask: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Production top-k: tiled matmul + ``lax.approx_max_k`` per block.

    ``approx_max_k`` is XLA's native TPU-KNN partial reduction (Chern et al.,
    2022) and fuses into the matmul consumer; measured ~5x faster than exact
    ``lax.top_k`` streaming at 1M×64 on v5e. Per-block recall is
    ``recall_target``; returned *scores are exact values* of the selected
    candidates (only the candidate set is approximate), so the merge across
    blocks and the final ordering are exact over that set.

    For euclidean/mahalanobis (mahalanobis inputs arrive pre-whitened, see
    ``distances.prepare_for_metric``, so the two are the same kernel here —
    matching ``pairwise_scores``), ranking per query ignores the constant
    ||q||² inside the reduction and re-adds it at the end so returned scores
    equal -||q-c||².
    """
    q = queries
    n_total = corpus.shape[0]
    k = min(k, n_total)
    distance_like = metric in ("euclidean", "mahalanobis")

    def block_scores(block, m_blk=None):
        dots = jax.lax.dot_general(
            q,
            block,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if distance_like:
            c_sq = jnp.sum(jnp.square(block.astype(jnp.float32)), axis=-1)
            dots = 2.0 * dots - c_sq[None, :]
        return _apply_mask(dots, m_blk)

    def finalize(scores):
        if distance_like:
            q_sq = jnp.sum(jnp.square(q.astype(jnp.float32)), axis=-1)
            # masked-out slots stay at NEG_INF so callers can sentinel them
            return jnp.where(
                scores > NEG_INF * 0.5, scores - q_sq[:, None], scores
            )
        return scores

    if n_total <= 8192:
        # approx_max_k's bin reduction carries a ~1 ms fixed cost that
        # dwarfs tiny corpora (measured r2 on v5e: 2000q x 315 exact top_k
        # 0.80 ms vs approx 1.83 ms; crossover ~16k rows) — a plain fused
        # matmul + top_k is both exact AND faster here
        top_s, top_i = jax.lax.top_k(block_scores(corpus, mask), k)
        return finalize(top_s), top_i

    if n_total <= block_size:
        s, i = jax.lax.approx_max_k(
            block_scores(corpus, mask), k, recall_target=recall_target
        )
        return finalize(s), i

    def block_fn(blk, base, kk):
        m_blk = None
        if mask is not None:
            m_blk = jax.lax.dynamic_slice_in_dim(mask, base, blk.shape[0])
        s, i = jax.lax.approx_max_k(
            block_scores(blk, m_blk), kk, recall_target=recall_target
        )
        return s, i + base

    top_s, top_i = blocked_topk(
        block_fn, corpus, k, block_size, q.shape[0]
    )
    return finalize(top_s), top_i


@partial(jax.jit, static_argnames=("k",))
def maxsim_aggregate(
    chunk_scores: jax.Array,
    chunk_doc_ids: jax.Array,
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Doc-level MaxSim over retrieved chunk candidates, as array ops.

    Replaces the reference's per-query Python dict loop (``main.py:274-281``):
    given per-query candidate chunk scores [Q, C] and their doc ids [Q, C],
    each doc's score is the max over its chunks; duplicate docs are masked to
    -inf so a doc appears once; returns top-k (doc_scores, doc_ids) [Q, k].

    O(C²) per query on the VPU — C is the candidate count (tens), so this is
    far cheaper than a scatter over the global doc space.
    """
    same = chunk_doc_ids[:, :, None] == chunk_doc_ids[:, None, :]  # [Q,C,C]
    s = chunk_scores.astype(jnp.float32)
    agg = jnp.max(
        jnp.where(same, s[:, None, :], NEG_INF), axis=-1
    )  # [Q, C]: per-candidate doc max
    c = chunk_scores.shape[1]
    earlier = jnp.tril(jnp.ones((c, c), dtype=bool), k=-1)[None]  # j < i
    is_dup = jnp.any(same & earlier, axis=-1)  # [Q, C]
    agg = jnp.where(is_dup, NEG_INF, agg)
    kk = min(k, c)
    top_s, sel = jax.lax.top_k(agg, kk)
    top_ids = jnp.take_along_axis(chunk_doc_ids, sel, axis=1)
    return top_s, top_ids
