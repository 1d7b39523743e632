"""Pallas TPU kernel: fused distance matmul + top-k over streamed corpus tiles.

TPU-native replacement for FAISS exact search
(``retrieval/FAISSEmbeddingRetriever.py:93-94``): one kernel streams corpus
tiles from HBM through the MXU against a resident query tile and folds each
tile's scores into a running top-k held in VMEM — the [Q, N] score matrix
never exists, so HBM traffic is one corpus read per query batch plus the
[Q, k] result write.

Two merge strategies (``mode``):

* ``"fold"`` (default, fast): the TPU-KNN recipe (Chern et al., 2022 —
  the algorithm behind ``jax.lax.approx_max_k``), fused with the distance
  matmul. Scores are bit-packed with their tile-local column index into one
  sortable int32 (monotone float→int map, low 12 bits = index), so a plain
  lane-wise max reduction carries argmax identity for free. Each [TQ, TN]
  tile folds to 128 lane-maxima, then k cheap extraction passes pull the tile
  top-k and merge it with the running top-k. Quasi-exact: a candidate is lost
  only when two of the true global top-k collide in the same (tile, lane)
  slot — P(miss) ≈ C(k,2)·L/N per query (≈1e-3 for k=10, N=1e6) — and scores
  are quantized to 20 bits. The host wrapper exactly rescores the winning
  candidates, so returned scores are full precision and the candidate set's
  internal ranking is exact.

* ``"exact"`` (oracle-grade): k max-extract passes over the raw [TQ, K+TN]
  concat per tile. Bit-exact against the numpy oracle; ~5-10x more VPU work.

Grid layout: corpus tiles OUTER (each tile DMA'd from HBM exactly once,
regardless of query count), query tiles inner; running per-query-tile state
lives in VMEM scratch that persists across the whole grid.

Measured guidance (v5e, 1M x 64, k=10 — see CLAUDE.md): XLA's fused
matmul + ``lax.approx_max_k`` (``ops.topk.approx_topk``) is the fastest
production path (~1.9 ms @256q / ~2.6-4.4 ms @1024q) because its PartialReduce
fuses into the matmul consumer and the per-element reduction work is already
near the VPU floor; this kernel's fold mode lands ~2-5x behind it (the
K max-extract merge dominates on the VPU), and its exact mode is the
on-device oracle (bit-exact, ~5-10x more VPU work). Keep ``approx_topk`` as
the default backend; reach for this kernel when fusing extra per-tile work
into the stream (masking, on-the-fly dequantization) that XLA cannot.

Round-2 update (docs/ROOFLINE.md): the dequantization niche is measured
closed — a Mosaic int8 matmul probe reaches 59 TOP/s vs XLA's 67, and
``sq8_topk`` at recall_target=0.95 sits at 98% of the int8 matmul+rowmax
floor, so a fused int8 variant of this kernel has ≤2% to win. This kernel's
remaining roles: the on-device exact oracle, and a worked example of the
tile/scratch/fold structure for future ops with genuinely unfusable
per-tile work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -3.4e38  # python literals: pallas kernels must not capture jnp consts
_BIG_I32 = 2**30
_MIN_I32 = -(2**31) + 1
_IDX_BITS = 13  # tile-local column index bits => block_n <= 8192
_IDX_MASK = (1 << _IDX_BITS) - 1
_LANES = 128


def _monotone_i32(s: jax.Array) -> jax.Array:
    """Order-preserving f32 -> int32 bit map (negatives: flip value bits)."""
    bits = pltpu.bitcast(s, jnp.int32)
    return jnp.where(bits >= 0, bits, jnp.bitwise_xor(bits, 0x7FFFFFFF))


def _unmonotone_f32(m: jax.Array) -> jax.Array:
    bits = jnp.where(m >= 0, m, jnp.bitwise_xor(m, 0x7FFFFFFF))
    return pltpu.bitcast(bits, jnp.float32)


def _scores_tile(q_ref, c_ref, csq_ref, metric: str) -> jax.Array:
    """[TQ, TN] fp32 scores for one corpus tile (higher = better)."""
    q = q_ref[:]
    dots = jax.lax.dot_general(
        q,
        c_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if metric == "euclidean":
        q_sq = jnp.sum(jnp.square(q.astype(jnp.float32)), axis=1, keepdims=True)
        return 2.0 * dots - q_sq - csq_ref[:]
    return dots


def _extract_k(values, indices, k):
    """k max-extract passes over (values [TQ, W] int32, indices [TQ, W] i32).

    Returns (top_vals [TQ, k], top_idx [TQ, k]). Packed int32 values make
    duplicates impossible only within one tile; across sources we break ties
    by first occurrence. ~6 VPU ops per pass over W.
    """
    col = jax.lax.broadcasted_iota(jnp.int32, values.shape, 1)
    out_v, out_i = [], []
    for _ in range(k):
        m = jnp.max(values, axis=1, keepdims=True)
        at_max = values == m
        pos = jnp.min(jnp.where(at_max, col, _BIG_I32), axis=1, keepdims=True)
        onehot = col == pos
        out_v.append(m)
        out_i.append(jnp.sum(jnp.where(onehot, indices, 0), axis=1, keepdims=True))
        values = jnp.where(onehot, _MIN_I32, values)
    return jnp.concatenate(out_v, axis=1), jnp.concatenate(out_i, axis=1)


def _fold_body(
    s, out_s_ref, out_i_ref, run_s_ref, run_i_ref, *, k, block_q,
    block_n, n_valid
):
    """Shared fold merge: pack scores with tile-local cols, lane-fold,
    extract the tile top-k and merge into the per-query-tile running
    state (emitting on the final corpus tile). ``s`` is the [TQ, TN]
    fp32 score tile from any front-end (dense matmul, packed unpack)."""
    j = pl.program_id(0)  # corpus tile (outer: each tile DMA'd once)
    i = pl.program_id(1)  # query tile (inner)
    rows = pl.ds(i * block_q, block_q)  # this q-tile's slice of scratch state

    @pl.when(j == 0)
    def _init():
        run_s_ref[rows, :] = jnp.full((block_q, k), _MIN_I32, jnp.int32)
        run_i_ref[rows, :] = jnp.zeros((block_q, k), jnp.int32)

    base = j * block_n
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    valid = (col + base) < n_valid

    mono = _monotone_i32(s)
    packed = jnp.bitwise_or(
        jnp.bitwise_and(mono, ~_IDX_MASK), col
    )  # 19-bit score | 13-bit local col
    packed = jnp.where(valid, packed, _MIN_I32)

    tq = s.shape[0]
    r = block_n // _LANES
    folded = jnp.max(packed.reshape(tq, r, _LANES), axis=1)  # [TQ, 128]

    lane = jax.lax.broadcasted_iota(jnp.int32, folded.shape, 1)
    tile_v, _ = _extract_k(folded, lane, k)  # lane idx unused
    tile_i = jnp.bitwise_and(tile_v, _IDX_MASK) + base  # global corpus row
    tile_s = jnp.bitwise_and(tile_v, ~_IDX_MASK)  # quantized packed score

    comb_v = jnp.concatenate([run_s_ref[rows, :], tile_s], axis=1)  # [TQ, 2K]
    comb_i = jnp.concatenate([run_i_ref[rows, :], tile_i], axis=1)
    new_v, new_i = _extract_k(comb_v, comb_i, k)
    run_s_ref[rows, :] = new_v
    run_i_ref[rows, :] = new_i

    @pl.when(j == pl.num_programs(0) - 1)
    def _emit():
        out_s_ref[:] = new_v
        out_i_ref[:] = new_i


def _fold_kernel(
    q_ref,
    c_ref,
    csq_ref,
    out_s_ref,
    out_i_ref,
    run_s_ref,
    run_i_ref,
    *,
    k,
    block_q,
    block_n,
    n_valid,
    metric,
):
    s = _scores_tile(q_ref, c_ref, csq_ref, metric)  # [TQ, TN] f32
    _fold_body(s, out_s_ref, out_i_ref, run_s_ref, run_i_ref, k=k,
               block_q=block_q, block_n=block_n, n_valid=n_valid)


def _exact_kernel(
    q_ref,
    c_ref,
    csq_ref,
    out_s_ref,
    out_i_ref,
    run_s_ref,
    run_i_ref,
    *,
    k,
    block_q,
    block_n,
    n_valid,
    metric,
):
    j = pl.program_id(0)
    i = pl.program_id(1)
    rows = pl.ds(i * block_q, block_q)

    @pl.when(j == 0)
    def _init():
        run_s_ref[rows, :] = jnp.full((block_q, k), _MIN_I32, jnp.int32)
        run_i_ref[rows, :] = jnp.zeros((block_q, k), jnp.int32)

    s = _scores_tile(q_ref, c_ref, csq_ref, metric)
    base = j * block_n
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    gcol = col + base
    mono = jnp.where(gcol < n_valid, _monotone_i32(s), _MIN_I32)

    comb_v = jnp.concatenate([run_s_ref[rows, :], mono], axis=1)
    comb_i = jnp.concatenate([run_i_ref[rows, :], gcol], axis=1)
    new_v, new_i = _extract_k(comb_v, comb_i, k)
    run_s_ref[rows, :] = new_v
    run_i_ref[rows, :] = new_i

    @pl.when(j == pl.num_programs(0) - 1)
    def _emit():
        out_s_ref[:] = new_v
        out_i_ref[:] = new_i


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "mode", "block_q", "block_n", "interpret"),
)
def pallas_topk_raw(
    queries: jax.Array,
    corpus: jax.Array,
    corpus_sq: jax.Array | None = None,
    *,
    k: int,
    metric: str = "cosine",
    mode: str = "fold",
    block_q: int = 128,
    block_n: int = 4096,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused top-k search. Returns (scores [Q, k] f32, indices [Q, k] i32).

    Inputs must be prepared for ``metric`` (cosine: pre-normalized — scoring
    is then a plain dot; euclidean: raw vectors plus optional precomputed
    ``corpus_sq`` row norms²; mahalanobis: pre-whitened vectors, scored as
    euclidean IN the whitened space — whitening does not make dot ranking
    equivalent, unlike cosine normalization). bf16 inputs take the native
    MXU path. ``mode='fold'`` scores are 19-bit-quantized (use
    ``pallas_topk`` for exactly rescored output); ``mode='exact'`` is
    bit-exact on scores.
    """
    if metric in ("cosine", "dot"):
        metric_kind = "dot"
    elif metric in ("euclidean", "mahalanobis"):
        metric_kind = "euclidean"
    else:
        raise ValueError(f"unsupported metric {metric!r}")
    if block_n > (1 << _IDX_BITS):
        raise ValueError(f"block_n must be <= {1 << _IDX_BITS}")
    if block_n % _LANES != 0:
        raise ValueError(f"block_n must be a multiple of {_LANES}")

    nq, d = queries.shape
    n = corpus.shape[0]
    k_eff = min(k, n)
    if mode == "fold" and k_eff > _LANES:
        # the fold keeps one candidate per lane per tile: beyond 128 the
        # extraction would emit fabricated sentinel candidates
        raise ValueError(
            f"fold mode supports k <= {_LANES} (got {k_eff}); use exact mode"
        )

    block_q = min(block_q, max(8, nq))
    pad_q = (-nq) % block_q
    if pad_q:
        queries = jnp.pad(queries, ((0, pad_q), (0, 0)))
    pad_n = (-n) % block_n
    if pad_n:
        corpus = jnp.pad(corpus, ((0, pad_n), (0, 0)))
    n_pad = corpus.shape[0]

    if metric_kind == "euclidean":
        if corpus_sq is None:
            corpus_sq = jnp.sum(jnp.square(corpus.astype(jnp.float32)), axis=1)
        elif pad_n:
            corpus_sq = jnp.pad(corpus_sq, (0, pad_n))
        csq = corpus_sq.reshape(1, n_pad).astype(jnp.float32)
    else:
        csq = jnp.zeros((1, n_pad), dtype=jnp.float32)

    # Corpus tiles on the OUTER grid axis, query tiles inner: each corpus
    # tile is DMA'd from HBM exactly once (its block index is constant across
    # the inner query sweep), so total corpus HBM traffic is one read
    # independent of query-batch size. Running top-k blocks are tiny [TQ, K]
    # and cheaply swap per inner step.
    grid = (n_pad // block_n, queries.shape[0] // block_q)
    kernel_fn = _fold_kernel if mode == "fold" else _exact_kernel
    kernel = functools.partial(
        kernel_fn,
        k=k_eff,
        block_q=block_q,
        block_n=block_n,
        n_valid=n,
        metric=metric_kind,
    )

    out_v, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_q, d), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (block_q, k_eff), lambda j, i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (block_q, k_eff), lambda j, i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((queries.shape[0], k_eff), jnp.int32),
            jax.ShapeDtypeStruct((queries.shape[0], k_eff), jnp.int32),
        ],
        # Running per-query-tile state lives in scratch VMEM, which persists
        # across the whole grid (output blocks are only written on the final
        # corpus tile — non-consecutive output revisiting is not defined).
        scratch_shapes=[
            pltpu.VMEM((queries.shape[0], k_eff), jnp.int32),
            pltpu.VMEM((queries.shape[0], k_eff), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * queries.shape[0] * n_pad * d,
            bytes_accessed=(
                queries.shape[0] * d * queries.dtype.itemsize
                + n_pad * d * corpus.dtype.itemsize
                + queries.shape[0] * k_eff * 8
            ),
            transcendentals=0,
        ),
    )(queries, corpus, csq)

    scores = _unmonotone_f32(
        jnp.bitwise_and(out_v, ~_IDX_MASK) if mode == "fold" else out_v
    )
    return scores[:nq], out_i[:nq]


def _binary_fold_kernel(
    q_ref,
    c_ref,
    out_s_ref,
    out_i_ref,
    run_s_ref,
    run_i_ref,
    *,
    k,
    block_q,
    block_n,
    n_valid,
    d,
):
    """Packed-word stage 1: the corpus tile arrives as TRANSPOSED sign
    words [W, TN] uint32 (8 B/row at d=64 — 1/8 the bf16 DMA), unpacks
    to ±1 bf16 [d, TN] in VMEM with corpus rows on the 128-lane axis
    (every shift/mask at full lane width), scores on the MXU, and folds
    through the shared merge. The [N, d] unpacked corpus never exists
    anywhere — not even in HBM."""
    pk = c_ref[:]  # [W, TN] uint32
    w, tn = pk.shape
    # strictly 2D unpack: broadcasting one word row across 32 sublanes
    # and shifting by a per-sublane iota keeps every op a plain [32, TN]
    # vector op — a [W, 32, TN] broadcast + reshape would relayout
    # across sublanes (measured 10x+ slower than the whole tile's MXU
    # work). {0,1} routes through int32 -> f32 (Mosaic has no
    # uint32 -> bf16 cast).
    shifts = jax.lax.broadcasted_iota(jnp.uint32, (32, tn), 0)
    parts = []
    for wi in range(w):
        bits = jax.lax.shift_right_logical(
            jnp.broadcast_to(pk[wi : wi + 1], (32, tn)), shifts
        ) & jnp.uint32(1)
        parts.append(
            (2 * bits.astype(jnp.int32) - 1)
            .astype(jnp.float32)
            .astype(jnp.bfloat16)
        )
    c = (parts[0] if w == 1 else jnp.concatenate(parts, axis=0))[:d]
    s = jax.lax.dot_general(
        q_ref[:],
        c,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TQ, TN]
    _fold_body(s, out_s_ref, out_i_ref, run_s_ref, run_i_ref, k=k,
               block_q=block_q, block_n=block_n, n_valid=n_valid)


@functools.partial(
    jax.jit,
    static_argnames=("k", "d", "block_q", "block_n", "interpret"),
)
def pallas_binary_topk(
    queries: jax.Array,
    packed_t: jax.Array,
    *,
    d: int,
    k: int,
    block_q: int = 128,
    block_n: int = 4096,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused packed-binary top-k over a transposed sign-bit store.

    ``packed_t`` is ``binary_quantize_t`` output ([W, N] uint32). Returns
    (scores [Q, k] f32, ids [Q, k] i32) with scores EXACTLY rescored
    (the fold's 19-bit quantization only picks the candidate set; the
    [Q, k] winners are re-dotted against their unpacked rows). Same
    estimator as ``ops.binary.binary_topk`` — dot(q, sign(c)).

    The Mosaic attempt at the one plausibly-unfused niche left
    (docs/ROOFLINE.md): XLA's packed sweep is unpack-rate-bound
    (``dense.py`` packed tiers), and here the unpack runs tile-wise in
    VMEM fused between the DMA and the MXU.
    """
    from .binary import binary_unpack

    nq, dq = queries.shape
    if dq != d:
        raise ValueError(f"queries dim {dq} != d {d}")
    w, n = packed_t.shape
    k_eff = min(k, n)
    if k_eff > _LANES:
        raise ValueError(f"fold supports k <= {_LANES} (got {k_eff})")
    if block_n > (1 << _IDX_BITS) or block_n % _LANES:
        raise ValueError(f"block_n must be <=8192 and a multiple of 128")

    q = queries.astype(jnp.bfloat16)
    block_q = min(block_q, max(8, nq))
    pad_q = (-nq) % block_q
    if pad_q:
        q = jnp.pad(q, ((0, pad_q), (0, 0)))
    pad_n = (-n) % block_n
    pk = jnp.pad(packed_t, ((0, 0), (0, pad_n))) if pad_n else packed_t
    n_pad = pk.shape[1]

    grid = (n_pad // block_n, q.shape[0] // block_q)
    kernel = functools.partial(
        _binary_fold_kernel,
        k=k_eff, block_q=block_q, block_n=block_n, n_valid=n, d=d,
    )
    out_v, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_q, d), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, block_n), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_q, k_eff), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, k_eff), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q.shape[0], k_eff), jnp.int32),
            jax.ShapeDtypeStruct((q.shape[0], k_eff), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((q.shape[0], k_eff), jnp.int32),
            pltpu.VMEM((q.shape[0], k_eff), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * q.shape[0] * n_pad * d,
            bytes_accessed=(
                q.shape[0] * d * 2 + n_pad * w * 4
                + q.shape[0] * k_eff * 8
            ),
            transcendentals=0,
        ),
    )(q, pk)
    out_i = out_i[:nq]

    # exact rescore of the winners: gather their packed words, unpack,
    # re-dot in fp32 (Q*k*d flops — noise) so returned scores are the
    # exact sign-dots and in-set ranking is exact
    cand = jnp.take(packed_t, out_i.reshape(-1), axis=1).T  # [Q*k, W]
    rows = binary_unpack(cand, d).astype(jnp.float32).reshape(nq, k_eff, d)
    # bf16-round queries first: the estimator everywhere else
    # (binary_topk and this kernel's MXU tile) dots bf16 queries, so the
    # rescored scores must be the same numbers
    qf = queries.astype(jnp.bfloat16).astype(jnp.float32)
    scores = jnp.einsum("qd,qkd->qk", qf, rows,
                        precision=jax.lax.Precision.HIGHEST)
    order = jnp.argsort(-scores, axis=1)
    return (jnp.take_along_axis(scores, order, axis=1),
            jnp.take_along_axis(out_i, order, axis=1))


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "mode", "block_q", "block_n", "interpret"),
)
def pallas_topk(
    queries: jax.Array,
    corpus: jax.Array,
    corpus_sq: jax.Array | None = None,
    *,
    k: int,
    metric: str = "cosine",
    mode: str = "fold",
    block_q: int = 128,
    block_n: int = 4096,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """``pallas_topk_raw`` + exact rescoring of the winning candidates.

    The [Q, k] candidate rows are gathered and rescored with a full-precision
    einsum (Q·k·D flops — noise), so returned scores are exact and the
    ranking within the candidate set is exact even in ``fold`` mode.
    """
    _, idx = pallas_topk_raw(
        queries,
        corpus,
        corpus_sq,
        k=k,
        metric=metric,
        mode=mode,
        block_q=block_q,
        block_n=block_n,
        interpret=interpret,
    )
    cand = corpus[idx]  # [Q, k, D]
    qf = queries.astype(jnp.float32)
    cf = cand.astype(jnp.float32)
    dots = jnp.einsum("qd,qkd->qk", qf, cf, precision=jax.lax.Precision.HIGHEST)
    if metric in ("euclidean", "mahalanobis"):
        scores = (
            2.0 * dots
            - jnp.sum(jnp.square(qf), axis=1, keepdims=True)
            - jnp.sum(jnp.square(cf), axis=2)
        )
    else:
        scores = dots
    order = jnp.argsort(-scores, axis=1)
    return jnp.take_along_axis(scores, order, axis=1), jnp.take_along_axis(
        idx, order, axis=1
    )
