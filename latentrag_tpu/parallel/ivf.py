"""Mesh-sharded device IVF: per-shard inverted files, all-gather merge.

Extends the small-batch latency tier (``ops/ivf.py``) across a mesh the
same way ``sharded_topk`` extends the exhaustive kernels: corpus rows
are row-sharded over the ``data`` axis (``parallel.shard_rows``), each
device owns an independent inverted file over ITS rows, and a search
probes every shard's best blocks locally before one ``all_gather`` of
[P, Q, local_k] candidates — so a v5e-8 serves ~8x the corpus at the
single-chip probe latency plus one ICI collective. The reference has no
distributed story at all (SURVEY §2.3); FAISS's sharded IVF equivalent
lives in faiss-gpu's multi-GPU wrappers.

Build is HOST-orchestrated but device-resident: each process builds the
inverted files for its addressable shards only (multi-process safe),
per-shard block counts are padded to a uniform shape (pad blocks carry
``block2list = -1`` and are never probed — ``ops/ivf.ivf_search`` masks
them), and the per-shard structures are assembled into global arrays
with a leading mesh axis via ``make_array_from_single_device_arrays``
— no shard ever crosses a device boundary.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.ivf import (
    IVFIndex, ivf_assignments, ivf_build, ivf_build_binary,
    ivf_build_from_assign, ivf_build_sq4, ivf_search,
)
from .mesh import DATA_AXIS

NEG_INF = float(-3.4e38)


class ShardedIVF(NamedTuple):
    """Per-shard IVF structures stacked on a leading mesh axis."""

    centroids: jax.Array  # [P, nlist_shard, d]
    blocks: jax.Array  # [P, nb, cap, w]
    block_ids: jax.Array  # [P, nb, cap] LOCAL row ids, -1 pad
    block2list: jax.Array  # [P, nb], -1 marks pad blocks
    rows_per_shard: int

    @property
    def nblocks(self) -> int:
        return int(self.blocks.shape[1])


def _pad_index(idx: IVFIndex, nb: int) -> IVFIndex:
    """Pad an IVFIndex to ``nb`` blocks (pad blocks are never probed)."""
    extra = nb - idx.nblocks
    if extra <= 0:
        return idx
    cap, w = idx.cap, idx.row_width
    return IVFIndex(
        centroids=idx.centroids,
        blocks=jnp.concatenate(
            [idx.blocks, jnp.zeros((extra, cap, w), idx.blocks.dtype)]
        ),
        block_ids=jnp.concatenate(
            [idx.block_ids, jnp.full((extra, cap), -1, jnp.int32)]
        ),
        block2list=jnp.concatenate(
            [idx.block2list, jnp.full((extra,), -1, jnp.int32)]
        ),
    )


def build_sharded_ivf(
    corpus_sharded: jax.Array,
    mesh: Mesh,
    nlist: int,
    cap: int = 512,
    *,
    dim: int = 0,
    axis: str = DATA_AXIS,
    seed: int = 0,
) -> ShardedIVF:
    """Per-shard inverted files over a row-sharded corpus.

    ``corpus_sharded`` comes from ``parallel.shard_rows`` (row-sharded,
    zero-padded to a mesh multiple; pad rows are masked at merge by
    ``n_valid`` exactly like the exhaustive sharded path). ``nlist`` is
    the TOTAL budget — each shard trains ``nlist // P`` lists over its
    own rows, preserving mean list size. ``dim`` (vector dim) marks a
    packed corpus (uint32 sign-bit words or uint8 SQ4 nibbles).
    """
    p = mesh.shape[axis]
    nlist_shard = max(1, nlist // p)
    is_binary = corpus_sharded.dtype == jnp.uint32
    is_sq4 = corpus_sharded.dtype == jnp.uint8
    shards = sorted(
        corpus_sharded.addressable_shards, key=lambda s: s.index[0].start
    )
    built: list[IVFIndex] = []
    for sh in shards:
        x = sh.data  # device-resident; compute stays on that device
        if is_binary or is_sq4:
            if not dim:
                raise ValueError("packed corpus requires dim=<vector dim>")
            build_packed = ivf_build_sq4 if is_sq4 else ivf_build_binary
            built.append(
                build_packed(x, dim, nlist_shard, cap, seed=seed)
            )
        else:
            built.append(ivf_build(x, nlist_shard, cap, seed=seed))

    local_max = max(b.nblocks for b in built)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        nb = int(
            np.max(multihost_utils.process_allgather(np.int64(local_max)))
        )
    else:
        nb = local_max
    built = [_pad_index(b, nb) for b in built]

    rows_per_shard = corpus_sharded.shape[0] // p
    d = built[0].centroids.shape[1]
    cap_eff, w = built[0].cap, built[0].row_width

    def _stack(field, global_tail, spec):
        arrays = [
            jax.device_put(getattr(b, field)[None], sh.device)
            for b, sh in zip(built, shards)
        ]
        return jax.make_array_from_single_device_arrays(
            (p,) + global_tail,
            NamedSharding(mesh, spec),
            arrays,
        )

    return ShardedIVF(
        centroids=_stack(
            "centroids", (nlist_shard, d), P(axis, None, None)
        ),
        blocks=_stack(
            "blocks", (nb, cap_eff, w), P(axis, None, None, None)
        ),
        block_ids=_stack("block_ids", (nb, cap_eff), P(axis, None, None)),
        block2list=_stack("block2list", (nb,), P(axis, None)),
        rows_per_shard=rows_per_shard,
    )


def _ordered_shards(arr):
    """Addressable shards of a leading-axis-sharded array, mesh order."""
    return sorted(arr.addressable_shards, key=lambda s: s.index[0].start)


def local_shard_index(sivf: ShardedIVF, pos: int = 0) -> IVFIndex:
    """Device-resident ``IVFIndex`` view of one shard's inverted file.

    ``pos`` indexes this PROCESS's addressable shards in mesh order.
    No data crosses a device boundary — each field's shard slice is the
    shard's own buffer. Powers the per-shard recall probe (the sharded
    merge program is per-(k, nprobe); shards share corpus geometry, so
    one shard's candidate recall transfers)."""
    fields = (
        sivf.centroids, sivf.blocks, sivf.block_ids, sivf.block2list
    )
    cent, blocks, bids, b2l = (
        _ordered_shards(f)[pos].data[0] for f in fields
    )
    return IVFIndex(cent, blocks, bids, b2l)


def sharded_ivf_assignments(sivf: ShardedIVF) -> np.ndarray:
    """[P, rows_per_shard] int32 LOCAL list id per shard-local row.

    The mesh analogue of ``ops.ivf.ivf_assignments``: recovered per
    shard from its own block layout (device compute + one
    [rows_per_shard] fetch each). Together with the [P, nlist_shard, d]
    centroids this is the whole expensive state of a sharded build —
    k-means + the assignment sweep per shard — so persisting the pair
    lets a warm boot regroup each shard with one deterministic gather
    (``build_sharded_ivf_from_assign``). Single-controller: assumes all
    shards are addressable (multi-process ranks rebuild cold instead).
    """
    rps = sivf.rows_per_shard
    out = []
    for pos in range(len(sivf.blocks.addressable_shards)):
        idx = local_shard_index(sivf, pos)
        out.append(np.asarray(ivf_assignments(idx, rps), dtype=np.int32))
    return np.stack(out)


def build_sharded_ivf_from_assign(
    corpus_sharded: jax.Array,
    mesh: Mesh,
    centroids: np.ndarray,
    assign: np.ndarray,
    cap: int,
    *,
    axis: str = DATA_AXIS,
) -> ShardedIVF:
    """Restore a ``ShardedIVF`` from persisted per-shard centroids
    [P, nlist_shard, d] + assignments [P, rows_per_shard] — no k-means,
    no assignment sweep. Each shard's regrouping is the same
    deterministic gather as ``ops.ivf.ivf_build_from_assign``, so the
    restored index serves candidate sets identical to the saved one
    (same sharded corpus, same cap). The mesh geometry must match the
    save (callers check ``P == mesh.shape[axis]`` before calling)."""
    p = mesh.shape[axis]
    if centroids.shape[0] != p or assign.shape[0] != p:
        raise ValueError(
            f"sidecar geometry ({centroids.shape[0]} shards) does not "
            f"match the mesh ({p} devices)"
        )
    shards = _ordered_shards(corpus_sharded)
    built = [
        ivf_build_from_assign(
            sh.data,
            jnp.asarray(centroids[i], jnp.float32),
            np.ascontiguousarray(assign[i]),
            cap,
        )
        for i, sh in enumerate(shards)
    ]
    nb = max(b.nblocks for b in built)
    built = [_pad_index(b, nb) for b in built]
    rows_per_shard = corpus_sharded.shape[0] // p
    cap_eff, w = built[0].cap, built[0].row_width

    def _stack(field, global_tail, spec):
        arrays = [
            jax.device_put(getattr(b, field)[None], sh.device)
            for b, sh in zip(built, shards)
        ]
        return jax.make_array_from_single_device_arrays(
            (p,) + global_tail, NamedSharding(mesh, spec), arrays
        )

    return ShardedIVF(
        centroids=_stack(
            "centroids", centroids.shape[1:], P(axis, None, None)
        ),
        blocks=_stack(
            "blocks", (nb, cap_eff, w), P(axis, None, None, None)
        ),
        block_ids=_stack("block_ids", (nb, cap_eff), P(axis, None, None)),
        block2list=_stack("block2list", (nb,), P(axis, None)),
        rows_per_shard=rows_per_shard,
    )


def make_sharded_ivf_topk(
    mesh: Mesh,
    *,
    k: int,
    nprobe: int,
    metric: str = "cosine",
    dim: int = 0,
    axis: str = DATA_AXIS,
    recall_target: float = 0.95,
    filtered: bool = False,
):
    """Build a jitted sharded-IVF search.

    Call: ``fn(q, sivf, n_valid, scale, mask_shard=None)`` ->
    (scores [Q, k], GLOBAL row ids [Q, k]; (-inf, -1) pads). ``q`` and
    results are replicated; ``sivf`` is a ``ShardedIVF``; ``scale`` is
    the global SQ8 scale or None; ``mask_shard`` (when ``filtered``) is
    the corpus-row-sharded bool mask.

    Per-shard ``local_k = k + P - 1`` follows ``sharded_topk``'s pad-row
    discipline: the <= P-1 zero pad rows (all on the last shard) can win
    local slots, and over-fetching means masking them at merge can never
    displace a genuine global top-k member.
    """
    p = mesh.shape[axis]
    local_k = k + p - 1

    def build(rows_per_shard: int):
        def _search(
            q, cent, blocks, bids, b2l, n_valid, scale, m_shard=None
        ):
            idx = IVFIndex(cent[0], blocks[0], bids[0], b2l[0])
            s, i = ivf_search(
                q, idx, k=local_k, nprobe=nprobe, metric=metric,
                scale=scale, mask=m_shard, dim=dim,
                recall_target=recall_target,
            )  # [Q, local_k] LOCAL rows, -1 pads
            offset = jax.lax.axis_index(axis) * rows_per_shard
            gi = jnp.where(i >= 0, i + offset, -1)
            s = jnp.where((i >= 0) & (gi < n_valid), s, NEG_INF)
            all_s = jax.lax.all_gather(s, axis, axis=0)  # [P, Q, lk]
            all_i = jax.lax.all_gather(gi, axis, axis=0)
            nq, kk = s.shape
            cat_s = jnp.moveaxis(all_s, 0, 1).reshape(nq, p * kk)
            cat_i = jnp.moveaxis(all_i, 0, 1).reshape(nq, p * kk)
            k_out = min(k, p * kk)
            top_s, sel = jax.lax.top_k(cat_s, k_out)
            top_i = jnp.take_along_axis(cat_i, sel, axis=1)
            top_i = jnp.where(top_s > NEG_INF * 0.5, top_i, -1)
            return top_s, top_i

        specs_in = [
            P(),  # q (replicated)
            P(axis, None, None),  # centroids
            P(axis, None, None, None),  # blocks
            P(axis, None, None),  # block_ids
            P(axis, None),  # block2list
            P(),  # n_valid
            P(),  # scale (dummy scalar for non-int8 stores)
        ]
        if filtered:
            specs_in.append(P(axis))  # corpus-row-sharded mask

        fn = shard_map(
            _search,
            mesh=mesh,
            in_specs=tuple(specs_in),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return jax.jit(fn)

    compiled = {}

    def search(q, sivf: ShardedIVF, n_valid, scale=None, mask_shard=None):
        fn = compiled.get(sivf.rows_per_shard)
        if fn is None:
            fn = build(sivf.rows_per_shard)
            compiled[sivf.rows_per_shard] = fn
        scale_arr = (
            jnp.float32(1.0) if scale is None else jnp.asarray(scale)
        )
        args = [
            q,
            sivf.centroids,
            sivf.blocks,
            sivf.block_ids,
            sivf.block2list,
            jnp.int32(n_valid),
            scale_arr,
        ]
        if filtered:
            if mask_shard is None:
                raise ValueError(
                    "this sharded IVF was built with filtered=True; "
                    "pass the row-sharded mask"
                )
            args.append(mask_shard)
        elif mask_shard is not None:
            raise ValueError(
                "mask_shard passed to a sharded IVF built without "
                "filtered=True; the mask would be silently ignored"
            )
        return fn(*args)

    return search
