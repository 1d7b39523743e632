"""Streaming binary IVF build (``ivf_build_binary_streaming``) vs the
materialized builders — the capacity-flagship path's CPU oracle.

The streaming builder never holds the packed corpus as one array; with
identical centroids its layout must be BIT-identical to
``ivf_build_from_assign`` over the same assignments (same within-list
row order), and a from-scratch build must serve the exhaustive result
at full probe. Chunk-boundary arithmetic is exercised with a corpus
size that is NOT a chunk multiple.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from latentrag_tpu.ops.binary import binary_quantize, binary_topk
from latentrag_tpu.ops.ivf import (
    _assign_packed,
    ivf_build_binary,
    ivf_build_binary_streaming,
    ivf_build_from_assign,
    ivf_search,
)

N, D, K = 50_003, 64, 10  # deliberately not a chunk multiple
CHUNK = 8_192


def _clustered(n, d, seed=0, n_centers=64, spread=0.12):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_centers, d)).astype(np.float32)
    which = rng.integers(0, n_centers, size=n)
    x = centers[which] + spread * rng.normal(size=(n, d)).astype(
        np.float32
    )
    return (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(
        np.float32
    )


@pytest.fixture(scope="module")
def packed():
    return binary_quantize(jnp.asarray(_clustered(N, D)))


def _chunk_fn(packed):
    def fn(i):
        return packed[i * CHUNK : (i + 1) * CHUNK]

    return fn


def test_streaming_layout_bit_identical_to_from_assign(packed):
    """With shared centroids, the streaming build's blocks / ids /
    block2list equal ``ivf_build_from_assign`` over the full-corpus
    assignment sweep exactly (same within-list row order)."""
    ref0 = ivf_build_binary(packed, D, nlist=64, cap=128, seed=3)
    cent = ref0.centroids
    assign = _assign_packed(packed, cent, D)
    ref = ivf_build_from_assign(packed, cent, np.asarray(assign), 128)

    timings = {}
    idx = ivf_build_binary_streaming(
        _chunk_fn(packed), N, D, nlist=64, cap=128,
        chunk_rows=CHUNK, centroids=cent, timings=timings,
    )
    np.testing.assert_array_equal(
        np.asarray(idx.block2list), np.asarray(ref.block2list)
    )
    np.testing.assert_array_equal(
        np.asarray(idx.block_ids), np.asarray(ref.block_ids)
    )
    np.testing.assert_array_equal(
        np.asarray(idx.blocks), np.asarray(ref.blocks)
    )
    # centroids supplied: the "train" phase is just an asarray, never
    # a k-means run (which takes >=10 s at this size on CPU)
    assert timings.get("train_s", 0.0) < 1.0
    assert timings["count_s"] > 0 and timings["place_s"] > 0


def test_streaming_full_probe_equals_exhaustive(packed):
    """From-scratch streaming build (k-means trained on the strided
    chunk sample): full probe must return the exhaustive packed sweep's
    scores."""
    idx = ivf_build_binary_streaming(
        _chunk_fn(packed), N, D, nlist=64, cap=128,
        chunk_rows=CHUNK, kmeans_iters=5, train_rows=20_000,
    )
    q = jnp.asarray(_clustered(8, D, seed=9))
    s, i = ivf_search(
        q, idx, k=K, nprobe=idx.nblocks, dim=D, exact_select=True
    )
    s_ref, i_ref = binary_topk(q, packed, d=D, k=K)
    np.testing.assert_allclose(
        np.asarray(s), np.asarray(s_ref), atol=1e-5
    )
    # every row is placed exactly once
    ids = np.asarray(idx.block_ids).reshape(-1)
    real = ids[ids >= 0]
    assert len(real) == N and len(np.unique(real)) == N


def test_streaming_rejects_empty():
    with pytest.raises(ValueError, match="empty"):
        ivf_build_binary_streaming(lambda i: None, 0, D, nlist=4)


def test_wide_index_probe_expands_whole_lists():
    """>8192-block indexes take the list-rank + contiguous-expansion
    probe path. Regression for the r5 1B finding: ranking the
    block-replicated score row with approx_max_k returned ~one block
    per contiguous equal-score run, collapsing batched stage-1 recall
    to ~0.15 where exact selection answered 1.0. Probing ~12% of lists
    on this clustered corpus must stay near the exhaustive sweep."""
    n = 80_000  # cap clamps at 8, so >8192 blocks needs 80k rows
    pk = binary_quantize(jnp.asarray(_clustered(n, D, seed=5)))
    idx = ivf_build_binary_streaming(
        lambda i: pk[i * CHUNK : (i + 1) * CHUNK], n, D, nlist=256,
        cap=8, chunk_rows=CHUNK, kmeans_iters=5, train_rows=20_000,
    )
    assert idx.nblocks > 8192  # the path under test
    b2l = np.asarray(idx.block2list)
    mlb = int(np.bincount(b2l[b2l >= 0]).max())
    q = jnp.asarray(_clustered(16, D, seed=11))
    s_ref, i_ref = binary_topk(q, pk, d=D, k=K)
    # ~30 lists' worth of blocks
    nprobe = 30 * idx.nblocks // 256
    s, i = ivf_search(q, idx, k=K, nprobe=nprobe, dim=D,
                      max_list_blocks=mlb)
    hits = sum(
        len(set(map(int, a)) & set(map(int, b)))
        for a, b in zip(np.asarray(i), np.asarray(i_ref))
    )
    recall = hits / i_ref.size
    assert recall >= 0.9, recall
    # the default (no max_list_blocks) 4x-average bound must behave
    # identically on this balanced layout
    s2, i2 = ivf_search(q, idx, k=K, nprobe=nprobe, dim=D)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i2))
