"""Device-side IVF-Flat: cluster-pruned top-k as one XLA program.

The exhaustive device tiers (``ops/topk.py``, ``ops/quantization.py``)
read the whole corpus from HBM per search — optimal for large query
batches (the matmul amortises the sweep over Q rows), but a SINGLE query
at 8.8M x 64 pays the same ~0.6-1.1 GB HBM sweep as 1024 queries. The
reference covers that regime with FAISS's inverted-file indexes
(``FAISSEmbeddingRetriever.py:100-102``); our C++ tier mirrors them on
the host. This module is the TPU-native redesign of the same idea, kept
entirely on device:

* build: k-means centroids (``ops/kmeans.py``, MXU-trained), rows
  grouped by nearest list into fixed-``cap`` **blocks** — a big list
  spans several blocks, the last block of each list is padded with -1
  ids. Static shapes everywhere; the layout is one device sort + one
  scatter + one gather, so an 8.8M corpus never round-trips the host.
* search: queries rank lists by centroid score, take the top ``nprobe``
  blocks (ties within a list resolve in block order, so a near list is
  scanned front-to-back), gather just those blocks from HBM, and run a
  fused batched-matvec + running top-k over them. HBM traffic per query
  drops from N*d bytes to ``nprobe*cap*d`` — the pruning IS the speedup,
  exactly the inverted-file contract.

Scores of visited rows are exact (same kernels' arithmetic); only the
candidate set is approximate, parameterised by ``nprobe``. With
``nprobe == nblocks`` the search degenerates to the exact oracle — the
differential test anchor. Supports every prepared-space metric (cosine /
dot / euclidean / whitened mahalanobis), fp32/bf16/int8 block stores
plus the two packed cascade stage-1 stores (uint32 sign bits, uint8 SQ4
nibbles), and the packed row-mask predicate filters of the exhaustive
tiers.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .kmeans import assign_clusters, kmeans
from .topk import NEG_INF, _merge_topk


@partial(jax.jit, static_argnames=("d", "kind", "block_size"))
def _assign_packed(packed, centroids, d, kind="binary", block_size=262144):
    """Nearest-centroid ids for a PACKED corpus (sign bits or SQ4
    nibbles): each block unpacks on the VPU and scores on the MXU — the
    packed words stay the only full-corpus HBM resident (the whole point
    of the packed tiers; an unpacked [N, d] copy would be 8x / 2x the
    store)."""
    from .binary import binary_unpack

    n = packed.shape[0]
    c = centroids.astype(jnp.float32)
    c_half = 0.5 * jnp.sum(c * c, axis=1)[None, :]
    pad = (-n) % block_size
    pk = (
        jnp.concatenate(
            [packed, jnp.zeros((pad, packed.shape[1]), packed.dtype)]
        )
        if pad
        else packed
    )
    n_blocks = pk.shape[0] // block_size

    def block_step(_, b):
        blk = jax.lax.dynamic_slice_in_dim(
            pk, b * block_size, block_size, axis=0
        )
        if kind == "sq4":
            from .quantization import sq4_unpack

            xb = sq4_unpack(blk, d).astype(jnp.bfloat16)
        else:
            xb = binary_unpack(blk, d).astype(jnp.bfloat16)
        scores = (
            jax.lax.dot_general(
                xb,
                c.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            - c_half
        )
        return None, jnp.argmax(scores, axis=1).astype(jnp.int32)

    _, out = jax.lax.scan(
        block_step, None, jnp.arange(n_blocks, dtype=jnp.int32)
    )
    return out.reshape(-1)[:n]


class IVFIndex(NamedTuple):
    """Device-resident inverted-file layout (a pytree — jit-friendly)."""

    centroids: jax.Array  # [nlist, d] fp32, prepared space
    blocks: jax.Array  # [nblocks, cap, w] store dtype (fp32/bf16/int8/u32/u8)
    block_ids: jax.Array  # [nblocks, cap] int32 original row ids, -1 pad
    block2list: jax.Array  # [nblocks] int32 owning list per block

    @property
    def nblocks(self) -> int:
        return int(self.blocks.shape[0])

    @property
    def cap(self) -> int:
        return int(self.block_ids.shape[1])

    @property
    def row_width(self) -> int:
        """Stored row width: d for float/int8 blocks, D/32 uint32 words
        (sign bits) or ceil(D/2) bytes (SQ4 nibbles) for packed blocks."""
        return int(self.blocks.shape[2])


@partial(jax.jit, static_argnames=("nblocks", "cap"))
def _layout_device(assign, sizes_dev, block_start_dev, nblocks, cap):
    """[nblocks*cap] int32 slot->row map (-1 pads), built on device.

    Row r of list c with within-list rank j lands in slot
    ``block_start[c]*cap + j`` — lists occupy consecutive blocks, ranks
    fill them front-to-back, the tail of the last block stays -1.
    """
    n = assign.shape[0]
    order = jnp.argsort(assign, stable=True)
    sorted_assign = jnp.take(assign, order)
    cluster_start = jnp.cumsum(sizes_dev) - sizes_dev  # exclusive, rows
    rank = jnp.arange(n, dtype=jnp.int32) - jnp.take(
        cluster_start, sorted_assign
    )
    slot = jnp.take(block_start_dev, sorted_assign) * cap + rank
    flat = jnp.full((nblocks * cap,), -1, dtype=jnp.int32)
    return flat.at[slot].set(order.astype(jnp.int32))


def _grouped_blocks(rows, assign, nlist, cap, *, id_base=0):
    """Group ``rows`` by their ``assign`` list into padded cap-blocks.

    Returns (blocks [nb, cap, d], block_ids [nb, cap] holding
    ``id_base + local_row`` or -1, block2list [nb] host np). Only the
    [nlist] size vector touches the host.
    """
    n, d = int(rows.shape[0]), int(rows.shape[1])
    sizes_dev = jnp.zeros((nlist,), jnp.int32).at[assign].add(jnp.int32(1))
    sizes = np.asarray(sizes_dev)  # [nlist] ints — the only host fetch
    nblk = -(-sizes // cap)  # ceil; empty lists own zero blocks
    nblocks = int(nblk.sum())
    block_start = np.concatenate(([0], np.cumsum(nblk)[:-1])).astype(
        np.int32
    )
    block2list = np.repeat(np.arange(nlist, dtype=np.int32), nblk)
    flat = _layout_device(
        assign, sizes_dev, jnp.asarray(block_start), nblocks, cap
    )
    # gather index: -1 pads must NOT wrap to rows[n-1] (jnp.take wraps
    # negatives before the fill check) — remap to n, which IS
    # out-of-bounds, so mode="fill" zeroes the padding deterministically
    gidx = jnp.where(flat < 0, jnp.int32(n), flat)
    packed_dtype = rows.dtype in (jnp.uint32, jnp.uint8)
    if packed_dtype and nblocks * cap > 8_388_608:
        # packed rows are narrow (W~2 uint32 words, or d/2 uint8
        # nibbles); a one-shot [total, W] gather materialises in
        # lane-padded layout (2 -> 128 lanes = 64x — a measured 55 GB
        # allocation at 100M). Chunked gather + rewrite keeps the
        # transient bounded (~2 GB per chunk).
        total = nblocks * cap
        step = 4_194_304 - (4_194_304 % cap)
        blocks = jnp.zeros((nblocks, cap, d), rows.dtype)
        for s in range(0, total, step):
            e = min(s + step, total)
            part = jnp.take(
                rows,
                jax.lax.slice_in_dim(gidx, s, e),
                axis=0,
                mode="fill",
                fill_value=0,
            ).reshape((e - s) // cap, cap, d)
            blocks = jax.lax.dynamic_update_slice_in_dim(
                blocks, part, s // cap, axis=0
            )
    else:
        blocks = jnp.take(
            rows, gidx, axis=0, mode="fill", fill_value=0
        ).reshape(nblocks, cap, d)
    ids = flat.reshape(nblocks, cap)
    if id_base:
        ids = jnp.where(ids >= 0, ids + jnp.int32(id_base), ids)
    return blocks, ids, block2list


def ivf_build(
    corpus: jax.Array,
    nlist: int,
    cap: int = 1024,
    *,
    seed: int = 0,
    kmeans_iters: int = 15,
    train_rows: int | None = None,
) -> IVFIndex:
    """Build the inverted-file layout over a PREPARED device corpus.

    ``corpus`` is the retriever's prepared matrix (normalized/whitened;
    fp32, bf16 or int8 SQ8 codes — a global SQ8 scale commutes out of
    k-means, so codes cluster identically to their float values). Only
    O(nlist) integers touch the host: the big arrays (assignments, the
    permutation, the blocks) stay device-resident end to end.

    ``train_rows`` subsamples the k-means training set (the classic IVF
    recipe — assignment still sweeps every row); default trains on
    min(n, max(100k, 64*nlist)) rows.
    """
    n, d = int(corpus.shape[0]), int(corpus.shape[1])
    if n == 0:
        raise ValueError("cannot build an IVF over an empty corpus")
    nlist = max(1, min(nlist, n))
    cap = max(8, min(cap, n))
    key = jax.random.PRNGKey(seed)
    k_train, k_sub = jax.random.split(key)
    if train_rows is None:
        train_rows = min(n, max(100_000, 64 * nlist))
    if train_rows < n:
        sub = jax.random.choice(k_sub, n, (train_rows,), replace=False)
        train = jnp.take(corpus, sub, axis=0)
    else:
        train = corpus
    centroids = kmeans(train, nlist, key=k_train, iters=kmeans_iters)
    assign = assign_clusters(corpus, centroids)
    blocks, ids, block2list = _grouped_blocks(corpus, assign, nlist, cap)
    return IVFIndex(
        centroids=centroids,
        blocks=blocks,
        block_ids=ids,
        block2list=jnp.asarray(block2list),
    )


def ivf_build_binary(
    packed: jax.Array,
    d: int,
    nlist: int,
    cap: int = 1024,
    *,
    seed: int = 0,
    kmeans_iters: int = 15,
    train_rows: int | None = None,
) -> IVFIndex:
    """Inverted file over a PACKED sign-bit corpus (the 1-bit cascade's
    stage 1; ``ops/binary.py``). Blocks store the packed uint32 words —
    HBM stays D/8 bytes/vector — while centroids live in the unpacked
    ±1 space, trained on a subsampled unpack (the only rows ever
    unpacked outside a streaming block). Search gathers packed blocks,
    unpacks on the VPU and scores asymmetrically, exactly like the
    exhaustive kernel; the SQ8 rescore stage stays wherever the caller
    keeps it (host-side in the retriever).
    """
    n = int(packed.shape[0])
    if n == 0:
        raise ValueError("cannot build an IVF over an empty corpus")
    from .binary import binary_unpack

    nlist = max(1, min(nlist, n))
    cap = max(8, min(cap, n))
    key = jax.random.PRNGKey(seed)
    k_train, k_sub = jax.random.split(key)
    if train_rows is None:
        train_rows = min(n, max(100_000, 64 * nlist))
    if train_rows < n:
        sub = jax.random.choice(k_sub, n, (train_rows,), replace=False)
        train_pk = jnp.take(packed, sub, axis=0)
    else:
        train_pk = packed
    train = binary_unpack(train_pk, d)  # ±1 int8; kmeans casts per block
    centroids = kmeans(train, nlist, key=k_train, iters=kmeans_iters)
    assign = _assign_packed(packed, centroids, d)
    blocks, ids, block2list = _grouped_blocks(packed, assign, nlist, cap)
    return IVFIndex(
        centroids=centroids,
        blocks=blocks,
        block_ids=ids,
        block2list=jnp.asarray(block2list),
    )


def ivf_build_sq4(
    packed: jax.Array,
    d: int,
    nlist: int,
    cap: int = 1024,
    *,
    seed: int = 0,
    kmeans_iters: int = 15,
    train_rows: int | None = None,
) -> IVFIndex:
    """Inverted file over a PACKED int4 corpus (the SQ4 cascade's
    stage 1; ``ops/quantization.py``). Blocks store the packed nibble
    bytes — HBM stays ceil(D/2) bytes/vector — while centroids live in
    the unpacked int4 CODE space (the global SQ4 scale commutes out of
    k-means, exactly like the SQ8 build's note), trained on a
    subsampled unpack. Search gathers packed blocks, unpacks on the VPU
    and scores as the same int8 x int8 MXU matmul as ``sq4_topk``; the
    exact SQ8 rescore stage stays wherever the caller keeps it
    (host-side in the retriever)."""
    n = int(packed.shape[0])
    if n == 0:
        raise ValueError("cannot build an IVF over an empty corpus")
    from .quantization import sq4_unpack

    nlist = max(1, min(nlist, n))
    cap = max(8, min(cap, n))
    key = jax.random.PRNGKey(seed)
    k_train, k_sub = jax.random.split(key)
    if train_rows is None:
        train_rows = min(n, max(100_000, 64 * nlist))
    if train_rows < n:
        sub = jax.random.choice(k_sub, n, (train_rows,), replace=False)
        train_pk = jnp.take(packed, sub, axis=0)
    else:
        train_pk = packed
    train = sq4_unpack(train_pk, d)  # int8 codes; kmeans casts per block
    centroids = kmeans(train, nlist, key=k_train, iters=kmeans_iters)
    assign = _assign_packed(packed, centroids, d, kind="sq4")
    blocks, ids, block2list = _grouped_blocks(packed, assign, nlist, cap)
    return IVFIndex(
        centroids=centroids,
        blocks=blocks,
        block_ids=ids,
        block2list=jnp.asarray(block2list),
    )


def ivf_build_binary_streaming(
    chunk_fn,
    n: int,
    d: int,
    nlist: int,
    cap: int = 1024,
    *,
    chunk_rows: int = 4_194_304,
    seed: int = 0,
    kmeans_iters: int = 10,
    train_rows: int | None = None,
    centroids: jax.Array | None = None,
    assign_block: int = 32768,
    timings: dict | None = None,
) -> IVFIndex:
    """Inverted file over a packed sign-bit corpus that NEVER exists as
    one array — the capacity-flagship build path (~1B x 64 on a single
    chip's HBM).

    ``ivf_build_binary`` needs corpus + blocks live together (2x the
    store) plus an [N]-row argsort; at 1B x 64 that is ~20 GB — past a
    v5e's HBM. This builder streams instead: ``chunk_fn(i)`` returns
    packed chunk ``i`` ([>= rows_i, W] uint32, trimmed to the chunk's
    true size), and the only full-size residents are the OUTPUT blocks
    + ids. Three phases, all device-side:

    1. train: k-means over an evenly-strided sample unpacked from a few
       chunks (the classic IVF subsample recipe);
    2. count: one assignment sweep accumulating per-list sizes — fixes
       the block layout (sizes / block_start / block2list are the only
       host-visible values, O(nlist) ints);
    3. place: per chunk, re-derive assignments (deterministic — same
       program, same data), compute each row's within-list rank from a
       chunk-local sort plus running per-list counters, and scatter
       rows + ids straight into their final block slots. The big
       arrays are DONATED through the per-chunk step, so XLA updates
       them in place — peak HBM ~= blocks + ids + one chunk of
       transients.

    The layout is bit-identical to ``ivf_build_from_assign`` over the
    same assignments (ranks are assigned in row order within each
    list). A final counter check (``running == sizes``) guards the
    determinism assumption between the two sweeps. ``centroids`` skips
    phase 1 (the centroids-only warm boot: persisting [nlist, d] fp32
    is ~MBs, while re-deriving assignments on device outruns fetching
    an [N] sidecar through a slow host link at this scale).
    ``timings`` (optional dict) receives per-phase wall seconds.
    """
    if n <= 0:
        raise ValueError("cannot build an IVF over an empty corpus")
    import time as _time

    nlist = max(1, min(nlist, n))
    cap = max(8, min(cap, n))
    nchunks = -(-n // chunk_rows)
    sizes_of = [
        min(chunk_rows, n - i * chunk_rows) for i in range(nchunks)
    ]

    t0 = _time.perf_counter()
    if centroids is None:
        from .binary import binary_unpack
        from .kmeans import kmeans

        if train_rows is None:
            train_rows = min(n, max(100_000, 64 * nlist))
        sample_chunks = np.unique(
            np.linspace(0, nchunks - 1, min(nchunks, 8)).astype(int)
        )
        per = -(-train_rows // len(sample_chunks))
        parts = []
        for ci in sample_chunks:
            pk = chunk_fn(int(ci))[: sizes_of[ci]]
            stride = max(1, sizes_of[ci] // per)
            parts.append(binary_unpack(pk[::stride][:per], d))
        train = jnp.concatenate(parts)[:train_rows]
        # scale the assignment block to the list count: kmeans scores a
        # [block, nlist] fp32 tile per step, and the 131072-row default
        # is an 8.6 GB tile at nlist=16384 — cap the tile at ~512 MB
        km_block = int(max(1024, min(131072, (1 << 27) // max(nlist, 1))))
        centroids = kmeans(
            train, nlist, key=jax.random.PRNGKey(seed),
            iters=kmeans_iters, block_size=km_block,
        )
        centroids.block_until_ready()
    else:
        centroids = jnp.asarray(centroids, jnp.float32)
        nlist = int(centroids.shape[0])
    t1 = _time.perf_counter()

    @jax.jit
    def count_step(sizes, pk):
        a = _assign_packed(
            pk, centroids, d, block_size=assign_block
        )
        return sizes.at[a].add(jnp.int32(1))

    sizes_dev = jnp.zeros((nlist,), jnp.int32)
    for i in range(nchunks):
        sizes_dev = count_step(sizes_dev, chunk_fn(i)[: sizes_of[i]])
    sizes = np.asarray(sizes_dev)  # [nlist] ints — tiny host fetch
    t2 = _time.perf_counter()

    nblk = -(-sizes // cap)
    nblocks = int(nblk.sum())
    if nblocks * cap >= 2**31:
        raise ValueError(
            f"flat slot space {nblocks * cap} overflows int32 — "
            "shard the corpus (parallel/) past ~2.1B slots"
        )
    block_start = np.concatenate(([0], np.cumsum(nblk)[:-1])).astype(
        np.int32
    )
    block2list = np.repeat(np.arange(nlist, dtype=np.int32), nblk)
    w = int(chunk_fn(0).shape[1])
    bs_dev = jnp.asarray(block_start)

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def place_step(blocks, ids, running, pk, base):
        # ``base`` is a TRACED scalar: a static base would recompile the
        # whole place program once per chunk (239 remote compiles at 1B
        # through the relay — hours); traced, every full chunk shares one
        # executable and only the trimmed tail chunk compiles again
        m = pk.shape[0]
        a = _assign_packed(pk, centroids, d, block_size=assign_block)
        order = jnp.argsort(a, stable=True)
        sa = jnp.take(a, order)
        csz = jnp.zeros((nlist,), jnp.int32).at[a].add(jnp.int32(1))
        cstart = jnp.cumsum(csz) - csz
        rank_sorted = jnp.arange(m, dtype=jnp.int32) - jnp.take(
            cstart, sa
        )
        rank = jnp.zeros((m,), jnp.int32).at[order].set(rank_sorted)
        slot = (
            jnp.take(bs_dev, a) * jnp.int32(cap)
            + jnp.take(running, a)
            + rank
        )
        b_idx, s_idx = slot // cap, slot % cap
        blocks = blocks.at[b_idx, s_idx].set(pk)
        ids = ids.at[b_idx, s_idx].set(
            jnp.int32(base) + jnp.arange(m, dtype=jnp.int32)
        )
        return blocks, ids, running + csz

    blocks = jnp.zeros((nblocks, cap, w), jnp.uint32)
    ids = jnp.full((nblocks, cap), -1, jnp.int32)
    running = jnp.zeros((nlist,), jnp.int32)
    for i in range(nchunks):
        blocks, ids, running = place_step(
            blocks, ids, running,
            chunk_fn(i)[: sizes_of[i]], base=jnp.int32(i * chunk_rows),
        )
    if not np.array_equal(np.asarray(running), sizes):
        # the count and place sweeps disagreed on some row's nearest
        # centroid — the determinism assumption broke (would silently
        # overwrite block slots); refuse rather than serve a corrupt
        # layout
        raise RuntimeError(
            "streaming IVF build: assignment sweeps diverged between "
            "the count and place phases "
            f"({int((np.asarray(running) != sizes).sum())} lists differ)"
        )
    t3 = _time.perf_counter()
    if timings is not None:
        timings.update(
            train_s=t1 - t0, count_s=t2 - t1, place_s=t3 - t2
        )
    return IVFIndex(
        centroids=centroids,
        blocks=blocks,
        block_ids=ids,
        block2list=jnp.asarray(block2list),
    )


def ivf_assignments(index: IVFIndex, n: int) -> jax.Array:
    """[n] int32 list id per ORIGINAL row, recovered from the layout.

    The inverse of the build's grouping (every row 0..n-1 occupies
    exactly one block slot; appended blocks included). Powers IVF
    persistence: centroids + assignments are the only state whose
    recomputation is expensive (k-means + the full assignment sweep ~=
    95% of an 86 s build at 8.8M) — the block layout itself is one
    deterministic device gather away (``ivf_build_from_assign``).
    """
    ids = index.block_ids.reshape(-1)
    b2l = jnp.repeat(index.block2list, index.cap)
    # -1 pad slots must not scatter anywhere: route them to index n,
    # which mode="drop" discards (negative indices would WRAP)
    safe = jnp.where(ids >= 0, ids, jnp.int32(n))
    return (
        jnp.zeros((n,), jnp.int32)
        .at[safe]
        .set(b2l.astype(jnp.int32), mode="drop")
    )


def ivf_build_from_assign(
    corpus: jax.Array,
    centroids: jax.Array,
    assign: jax.Array,
    cap: int,
) -> IVFIndex:
    """Rebuild the inverted-file layout from PERSISTED centroids +
    assignments — no k-means, no assignment sweep. The grouping is
    deterministic, so the restored index serves bit-identical candidate
    sets to the one that was saved (same corpus, same cap)."""
    nlist = int(centroids.shape[0])
    blocks, ids, block2list = _grouped_blocks(
        corpus, jnp.asarray(assign, jnp.int32), nlist, cap
    )
    return IVFIndex(
        centroids=jnp.asarray(centroids, jnp.float32),
        blocks=blocks,
        block_ids=ids,
        block2list=jnp.asarray(block2list),
    )


def ivf_append(
    index: IVFIndex, new_rows: jax.Array, id_base: int, dim: int = 0
) -> IVFIndex:
    """Append rows to an existing layout without re-clustering.

    New rows are assigned to the EXISTING centroids and packed into NEW
    blocks appended after the current ones (existing blocks and their
    tail padding are untouched). ``block2list`` gains extra entries for
    already-represented lists, which search handles by construction —
    every block of a probed list carries that list's centroid score.
    ``id_base`` is the corpus position of the first new row (append-only
    stores keep prior row ids stable — the retriever's ``add``).

    Trade-off: each append materialises at least one cap-row block per
    touched list, so many tiny appends accrete padding; callers bound
    that by rebuilding once appended rows exceed a fraction of the
    corpus (see ``DenseRetriever._ivf_append_budget``).
    """
    if int(new_rows.shape[0]) == 0:
        return index
    nlist = int(index.centroids.shape[0])
    if index.blocks.dtype in (jnp.uint32, jnp.uint8):  # packed store
        if not dim:
            raise ValueError("packed IVF append requires dim=<vector dim>")
        kind = "sq4" if index.blocks.dtype == jnp.uint8 else "binary"
        assign = _assign_packed(new_rows, index.centroids, dim, kind=kind)
    else:
        new_rows = new_rows.astype(index.blocks.dtype)
        assign = assign_clusters(new_rows, index.centroids)
    blocks, ids, block2list = _grouped_blocks(
        new_rows, assign, nlist, index.cap, id_base=id_base
    )
    return IVFIndex(
        centroids=index.centroids,
        blocks=jnp.concatenate([index.blocks, blocks], axis=0),
        block_ids=jnp.concatenate([index.block_ids, ids], axis=0),
        block2list=jnp.concatenate(
            [index.block2list, jnp.asarray(block2list)], axis=0
        ),
    )


@partial(
    jax.jit,
    static_argnames=(
        "k", "nprobe", "metric", "group_bytes", "exact_select", "dim",
        "recall_target", "max_list_blocks",
    ),
)
def ivf_search(
    queries: jax.Array,
    index: IVFIndex,
    k: int,
    nprobe: int,
    metric: str = "cosine",
    scale: Any = None,
    mask: jax.Array | None = None,
    group_bytes: int = 256 << 20,
    exact_select: bool = False,
    dim: int = 0,
    recall_target: float = 0.95,
    max_list_blocks: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Top-k over the ``nprobe`` best blocks per query.

    ``max_list_blocks`` (static) is the build-time max blocks in any one
    list — it sizes the per-list expansion of the wide-index probe path
    (``np.bincount(block2list).max()`` host-side); None uses a 4x-average
    bound that can clip a pathologically skewed list's tail.

    ``queries`` are prepared [Q, d] floats; ``scale`` is the global SQ8
    scale when ``index.blocks`` is int8 (scores return in float space,
    matching ``sq8_topk``); ``mask`` is the standard [N] bool row mask.
    Returns (scores [Q, k] fp32, ORIGINAL row ids [Q, k] int32); slots
    beyond the eligible candidate set come back as (-inf, -1).

    Probed blocks are processed in GROUPS sized by ``group_bytes`` of
    gathered rows — one gather + one batched matmul + one top-k per
    group (a per-probe loop costs ~10 us of fixed VPU/dispatch work per
    step, which dominated the 5 MB of useful traffic a single query
    probes — measured r4, docs/ROOFLINE.md IVF section). Small serving
    batches typically fit in ONE group, so the whole refine stage is a
    single fused gather->matmul->top_k chain.
    """
    q = queries.astype(jnp.float32)
    nq = q.shape[0]
    nblocks = index.nblocks
    cap = index.cap
    d = index.row_width  # stored row width (words for packed blocks)
    nprobe = max(1, min(nprobe, nblocks))
    distance_like = metric in ("euclidean", "mahalanobis")
    is_int8 = index.blocks.dtype == jnp.int8
    # packed blocks (ivf_build_binary / ivf_build_sq4): d above is
    # WORDS / nibble bytes; the true vector dim arrives via ``dim``
    is_binary = index.blocks.dtype == jnp.uint32
    is_sq4 = index.blocks.dtype == jnp.uint8
    if (is_binary or is_sq4) and not dim:
        raise ValueError("packed IVF blocks require dim=<vector dim>")
    if (is_int8 or is_binary or is_sq4) and distance_like:
        # the scaled int8 dots / sign-bit proxy and the unscaled norms
        # would mix spaces; the retriever forbids these combinations too
        raise ValueError("quantized IVF blocks support cosine/dot only")

    # ---- coarse stage: rank blocks by their list's centroid score
    cdots = jax.lax.dot_general(
        q,
        index.centroids,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if distance_like:
        c_sq = jnp.sum(jnp.square(index.centroids), axis=-1)
        cscore = 2.0 * cdots - c_sq[None, :]
    else:
        cscore = cdots
    # block2list == -1 marks PAD blocks (the mesh-sharded build pads
    # every shard's block count to a uniform shape): they score NEG_INF
    # so no probe budget is ever spent on them
    b2l = index.block2list
    if nblocks > 8192 and not exact_select:
        # rank LISTS exactly, then expand each selected list to ALL of
        # its blocks. The previous design ranked the block-replicated
        # score row ([Q, nblocks]) with approx_max_k — on TPU its bin
        # reduction returns ~one block per contiguous equal-score run,
        # so a list spanning B blocks contributed ~1/B of its rows
        # (measured r5: 1B x 64, 60 blocks/list — stage-1 recall 0.15
        # vs 1.0 from the same index with exact selection). Exact top_k
        # over the [Q, nlist] list scores is NARROW (lists, not blocks)
        # and probing whole lists is the classic IVF contract.
        #
        # The expansion goes through a (list, storage-order) argsort of
        # block2list rather than assuming each list's blocks are
        # contiguous — ivf_append places a grown list's new blocks at
        # the TAIL, so a start+offset window would skip appended rows
        # and overrun into the next list. Static probe geometry:
        # L lists x b_cap block slots per query; invalid slots point at
        # the ``nblocks`` sentinel (gather-filled rows score NEG_INF
        # and ids -1 downstream). Note the effective scanned budget is
        # n_lists * b_cap slots — up to b_cap/avg_b more than the
        # requested nprobe when the build is skewed (whole-list probing
        # is the correctness contract; tune ``fraction``/nprobe, not
        # partial lists).
        nlist_real = index.centroids.shape[0]
        real = b2l >= 0
        safe_l = jnp.maximum(b2l, 0)
        nblk_l = jnp.zeros((nlist_real,), jnp.int32).at[safe_l].add(
            real.astype(jnp.int32)
        )
        # stable sort by list id: pads (-1) first, then each list's
        # blocks in storage order
        order = jnp.argsort(b2l, stable=True).astype(jnp.int32)
        n_pads = jnp.sum(~real).astype(jnp.int32)
        start_sorted = (
            n_pads + jnp.cumsum(nblk_l) - nblk_l
        )  # [nlist] first sorted position of each list's run
        avg_b = max(1.0, nblocks / nlist_real)
        n_lists = max(1, min(nlist_real, int(round(nprobe / avg_b))))
        if max_list_blocks is not None:
            b_cap = int(max_list_blocks)
        else:
            # generous static bound; a pathologically skewed list loses
            # its tail blocks — pass the build-time max to remove the cap
            b_cap = min(nblocks, int(np.ceil(avg_b * 4)) + 8)
        _, lsel = jax.lax.top_k(cscore, n_lists)  # [Q, L] exact
        starts = jnp.take(start_sorted, lsel)
        counts = jnp.take(nblk_l, lsel)
        offs = jnp.arange(b_cap, dtype=jnp.int32)
        pos = starts[:, :, None] + offs[None, None, :]
        ok_slot = offs[None, None, :] < counts[:, :, None]
        bsel = jnp.take(order, jnp.minimum(pos, nblocks - 1), axis=0)
        sel = jnp.where(ok_slot, bsel, nblocks).reshape(
            nq, n_lists * b_cap
        )
        nprobe = sel.shape[1]
    else:
        # exact top_k over the block-replicated scores (ties break by
        # low index, so equal-score runs select whole lists in order);
        # ``exact_select=True`` pins this everywhere — with
        # nprobe == nblocks that makes the whole search the exact
        # oracle, the differential-test anchor
        bscore = jnp.take(
            cscore, jnp.maximum(b2l, 0), axis=1
        )  # [Q, nblocks]
        bscore = jnp.where(b2l[None, :] >= 0, bscore, NEG_INF)
        _, sel = jax.lax.top_k(bscore, nprobe)  # [Q, nprobe]

    if is_int8 or is_sq4:
        from .quantization import sq8_quantize

        # sq4: same arithmetic as sq4_topk — int8-quantized queries
        # against the unpacked int4 codes, one combined scale out front
        qv, q_scale = sq8_quantize(q)
        factor = (q_scale * scale).astype(jnp.float32)
    elif is_binary:
        qv = q.astype(jnp.bfloat16)  # asymmetric: full-precision queries
    else:
        qv = q.astype(index.blocks.dtype)

    # ---- probe-group geometry (all static); packed stores budget by
    # their UNPACKED working set (bf16 / int8), not the smaller read
    if is_binary:
        esize = 2 * dim // d
    elif is_sq4:
        esize = -(-dim // d)  # ~2 int8 bytes per stored nibble byte
    else:
        esize = index.blocks.dtype.itemsize
    g = max(1, min(nprobe, group_bytes // max(1, nq * cap * d * esize)))
    n_groups = -(-nprobe // g)
    pad = n_groups * g - nprobe
    if pad:
        # out-of-range block id: gathers fill rows of 0 and ids of -1,
        # which the validity mask drops — padding never duplicates rows
        sel = jnp.concatenate(
            [sel, jnp.full((nq, pad), nblocks, dtype=sel.dtype)], axis=1
        )
    sel_g = sel.reshape(nq, n_groups, g)

    def score_group(bsel):
        """bsel [Q, g] -> (scores [Q, g*cap] fp32, ids [Q, g*cap])."""
        rows = jnp.take(
            index.blocks, bsel, axis=0, mode="fill", fill_value=0
        )  # [Q, g, cap, d]
        ids = jnp.take(
            index.block_ids, bsel, axis=0, mode="fill", fill_value=-1
        ).reshape(nq, g * cap)
        rows = rows.reshape(nq, g * cap, d)
        if is_binary:
            from .binary import binary_unpack

            rows = binary_unpack(
                rows.reshape(nq * g * cap, d), dim
            ).reshape(nq, g * cap, dim).astype(jnp.bfloat16)
        elif is_sq4:
            from .quantization import sq4_unpack

            rows = sq4_unpack(
                rows.reshape(nq * g * cap, d), dim
            ).reshape(nq, g * cap, dim)
        int_dot = is_int8 or is_sq4
        dots = jax.lax.dot_general(
            qv,
            rows,
            dimension_numbers=(((1,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32 if int_dot else jnp.float32,
        )  # [Q, g*cap]
        scores = dots.astype(jnp.float32) * factor if int_dot else dots
        if distance_like:
            r_sq = jnp.sum(jnp.square(rows.astype(jnp.float32)), axis=-1)
            scores = 2.0 * scores - r_sq
        valid = ids >= 0
        if mask is not None:
            valid &= jnp.take(mask, ids, mode="fill", fill_value=False)
        return jnp.where(valid, scores, NEG_INF), ids

    def select(scores, kk):
        """Top-kk over a [Q, g*cap] score row: exact when narrow, the
        fused approx_max_k reduction when wide (visited-row SCORES stay
        exact either way; only marginal candidate order is approximate,
        the same contract as the exhaustive ``approx_topk``)."""
        if scores.shape[1] > 8192 and not exact_select:
            return jax.lax.approx_max_k(
                scores, kk, recall_target=recall_target
            )
        return jax.lax.top_k(scores, kk)

    k_eff = min(k, g * cap)
    if n_groups == 1:
        scores, ids = score_group(sel_g[:, 0, :])
        top_s, loc = select(scores, k_eff)
        top_i = jnp.take_along_axis(ids, loc, axis=1)
        if k_eff < k:  # fewer eligible slots than k: pad the tail
            w = k - k_eff
            top_s = jnp.concatenate(
                [top_s, jnp.full((nq, w), NEG_INF, jnp.float32)], axis=1
            )
            top_i = jnp.concatenate(
                [top_i, jnp.full((nq, w), -1, jnp.int32)], axis=1
            )
    else:
        # UNROLLED group loop (n_groups is static and small — the byte
        # budget keeps it single-digit): a lax.scan here forces XLA to
        # relayout the whole blocks store for the in-loop gather (a
        # measured 55 GB allocation at 100M packed), while per-group
        # static gathers compile like the single-group path
        parts_s, parts_i = [], []
        for gi in range(n_groups):
            scores, ids = score_group(sel_g[:, gi, :])
            s, loc = select(scores, k_eff)
            parts_s.append(s)
            parts_i.append(jnp.take_along_axis(ids, loc, axis=1))
        top_s, top_i = _merge_topk(parts_s, parts_i, k)
        if top_s.shape[1] < k:  # fewer candidates than k overall
            w = k - top_s.shape[1]
            top_s = jnp.concatenate(
                [top_s, jnp.full((nq, w), NEG_INF, jnp.float32)], axis=1
            )
            top_i = jnp.concatenate(
                [top_i, jnp.full((nq, w), -1, jnp.int32)], axis=1
            )

    live = top_s > NEG_INF * 0.5
    if distance_like:
        q_sq = jnp.sum(jnp.square(q), axis=-1, keepdims=True)
        top_s = jnp.where(live, top_s - q_sq, top_s)
    top_i = jnp.where(live, top_i, -1)
    return top_s, top_i


def auto_nprobe(nblocks: int, fraction: float = 0.02) -> int:
    """Default probe budget: ~``fraction`` of the blocks, at least 32.

    The floor keeps small indexes honest (scanning 32 blocks of a
    few-hundred-block index is cheap and recall-rich); the fraction
    keeps the big-index scan sublinear. Candidate recall at a given
    fraction is data-dependent (tests/test_ivf_ops.py sweeps a hard
    synthetic; the docs/ROOFLINE.md round-4 IVF table has on-chip
    numbers) — pin ``nprobe`` to trade latency against recall
    explicitly.
    """
    return max(32, min(nblocks, int(np.ceil(nblocks * fraction))))
