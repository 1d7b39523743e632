"""Distributed exact/approx top-k: corpus sharded over the mesh, local top-k
per device, all-gather + merge.

This is the framework's distributed-communication deliverable (SURVEY §2.3 /
§7 step 5c): the reference has no multi-device story at all; here corpus rows
live sharded across the ``data`` axis, every device scores its shard against
the (replicated) query batch with the single-device kernels, and the [P, Q, k]
partial results are merged with one ``all_gather`` over ICI — k·Q·P numbers,
thousands of times smaller than the corpus, so scaling is essentially linear
in mesh size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.topk import approx_topk, exact_topk

# python float, not jnp.float32: see ops/topk.py — no device constants at
# import time, or jax.distributed.initialize breaks in worker processes
NEG_INF = float(-3.4e38)


def make_sharded_topk(
    mesh: Mesh,
    *,
    k: int,
    metric: str = "cosine",
    backend: str = "approx",
    block_size: int = 1048576,
    recall_target: float = 0.99,
    axis: str = "data",
    d: int | None = None,
    filtered: bool = False,
):
    """Build a jitted ``(queries, corpus_sharded, n_valid) -> (scores, idx)``.

    ``corpus_sharded`` is row-sharded over ``axis`` (see
    ``mesh.shard_rows``); queries and results are replicated. ``n_valid`` is
    the true (pre-padding) corpus row count — padded rows are masked in the
    merge. Indices returned are global corpus rows.

    ``filtered=True`` compiles the predicate-filter variant: the call takes
    a trailing bool mask row-sharded EXACTLY like the corpus (same
    ``shard_rows`` padding, so local row offsets line up shard-by-shard);
    masked-out rows score NEG_INF in the local kernels and surface as the
    same -1 sentinels the pad-row masking already produces.
    """
    # shard_rows zero-pads the corpus to a mesh multiple; the <= P-1 pad
    # rows all land on the LAST shard and can outscore genuine candidates
    # (a zero row scores 0 for dot, -||q||^2 for euclidean). Request P-1
    # extra local candidates so masking them afterwards can never displace
    # a real top-k member.
    local_k = k + mesh.shape[axis] - 1

    if backend == "sq8":
        from ..ops.quantization import sq8_topk

        def local_search(q, c_shard, scale, m_shard):
            return sq8_topk(
                q, c_shard, scale, k=local_k, block_size=block_size,
                recall_target=recall_target, mask=m_shard,
            )

    elif backend == "sq4":
        # packed int4 shards ([N/P, d/2] uint8 — half SQ8's row bytes);
        # per-shard unpack + int8 MXU scoring, same merge as every tier
        from ..ops.quantization import sq4_topk

        if d is None:
            raise ValueError("backend='sq4' requires d (true vector dim)")

        def local_search(q, c_shard, scale, m_shard):
            return sq4_topk(
                q, c_shard, scale, d=d, k=local_k,
                block_size=block_size,
                recall_target=recall_target, mask=m_shard,
            )

    elif backend == "binary":
        # stage 1 of the 1-bit cascade: asymmetric sign-bit scoring over
        # the PACKED uint32 shard ([N/P, d/32] — same row sharding as
        # SQ8); the caller rescores the gathered candidates host-side.
        # ``d`` is the true vector dim (packed stores carry d/32 words).
        from ..ops.binary import binary_topk

        if d is None:
            raise ValueError("backend='binary' requires d (true vector dim)")

        def local_search(q, c_shard, scale, m_shard):
            del scale
            return binary_topk(
                q, c_shard, d=d, k=local_k, block_size=block_size,
                recall_target=recall_target, mask=m_shard,
            )

    else:
        inner = {
            "approx": functools.partial(
                approx_topk, k=local_k, metric=metric, block_size=block_size,
                recall_target=recall_target,
            ),
            "exact": functools.partial(
                exact_topk, k=local_k, metric=metric,
                block_size=min(block_size, 8192),
            ),
        }[backend]

        def local_search(q, c_shard, scale, m_shard):
            del scale
            return inner(q, c_shard, mask=m_shard)

    def _search(q, c_shard, n_valid, scale, m_shard=None):
        shard_rows_n = c_shard.shape[0]
        s, i = local_search(q, c_shard, scale, m_shard)  # [Q, local_k]
        offset = jax.lax.axis_index(axis) * shard_rows_n
        gi = i + offset
        s = jnp.where(gi < n_valid, s, NEG_INF)
        all_s = jax.lax.all_gather(s, axis, axis=0)  # [P, Q, local_k]
        all_i = jax.lax.all_gather(gi, axis, axis=0)
        p, nq, kk = all_s.shape
        cat_s = jnp.moveaxis(all_s, 0, 1).reshape(nq, p * kk)
        cat_i = jnp.moveaxis(all_i, 0, 1).reshape(nq, p * kk)
        k_out = min(k, p * kk)
        top_s, sel = jax.lax.top_k(cat_s, k_out)
        top_i = jnp.take_along_axis(cat_i, sel, axis=1)
        # slots filled by masked pad rows (score NEG_INF) carry global
        # indices >= n_valid; return the -1 sentinel instead so callers
        # never index past their texts/doc_ids lists
        top_i = jnp.where(top_s > NEG_INF * 0.5, top_i, -1)
        return top_s, top_i

    in_specs = (P(), P(axis), P(), P())
    if filtered:
        in_specs = in_specs + (P(axis),)
    sharded = shard_map(
        _search,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(), P()),
        check_vma=False,
    )
    jitted = jax.jit(sharded)

    def call(q, c_shard, n_valid, scale=None, mask_shard=None):
        if scale is None:
            scale = jnp.float32(1.0)
        if filtered:
            if mask_shard is None:
                raise ValueError(
                    "this sharded top-k was built with filtered=True; "
                    "pass the row-sharded mask"
                )
            return jitted(q, c_shard, n_valid, scale, mask_shard)
        if mask_shard is not None:
            raise ValueError(
                "mask_shard passed to a sharded top-k built without "
                "filtered=True; the mask would be silently ignored"
            )
        return jitted(q, c_shard, n_valid, scale)

    return call
