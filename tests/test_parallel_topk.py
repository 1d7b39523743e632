"""Sharded top-k over an 8-device CPU mesh must match the single-device
oracle — the multi-"node" simulation strategy from SURVEY §4.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latentrag_tpu.ops import exact_topk, l2_normalize
from latentrag_tpu.parallel import make_mesh, make_sharded_topk, shard_rows


@pytest.mark.parametrize("metric", ["cosine", "euclidean"])
@pytest.mark.parametrize("n", [999, 4096])
def test_sharded_matches_single_device(rng, eight_devices, metric, n):
    mesh = make_mesh(8)
    q = rng.standard_normal((6, 32)).astype(np.float32)
    c = rng.standard_normal((n, 32)).astype(np.float32)
    if metric == "cosine":
        qj = l2_normalize(jnp.asarray(q))
        cj = l2_normalize(jnp.asarray(c))
    else:
        qj, cj = jnp.asarray(q), jnp.asarray(c)

    s0, i0 = exact_topk(qj, cj, k=5, metric=metric)

    c_sharded = shard_rows(cj, mesh)
    search = make_sharded_topk(mesh, k=5, metric=metric, backend="exact")
    s1, i1 = search(qj, c_sharded, jnp.int32(n))

    np.testing.assert_allclose(
        np.asarray(s0), np.asarray(s1), rtol=1e-4, atol=1e-4
    )
    # identical candidate sets (ties may reorder within equal scores)
    for r in range(q.shape[0]):
        assert set(np.asarray(i0)[r].tolist()) == set(np.asarray(i1)[r].tolist())


def test_sharded_approx_backend_high_recall(rng, eight_devices):
    mesh = make_mesh(8)
    n = 20000
    q = rng.standard_normal((8, 16)).astype(np.float32)
    c = rng.standard_normal((n, 16)).astype(np.float32)
    qj, cj = l2_normalize(jnp.asarray(q)), l2_normalize(jnp.asarray(c))
    s0, i0 = exact_topk(qj, cj, k=10, metric="cosine")
    search = make_sharded_topk(mesh, k=10, metric="cosine", backend="approx")
    s1, i1 = search(qj, shard_rows(cj, mesh), jnp.int32(n))
    i0 = np.asarray(i0)
    i1 = np.asarray(i1)
    recall = np.mean([len(set(i0[r]) & set(i1[r])) / 10 for r in range(8)])
    assert recall >= 0.9


def test_small_corpus_padding_masked(rng, eight_devices):
    """Corpus smaller than the mesh: padded rows must never appear."""
    mesh = make_mesh(8)
    q = rng.standard_normal((3, 8)).astype(np.float32)
    c = rng.standard_normal((5, 8)).astype(np.float32)
    qj, cj = l2_normalize(jnp.asarray(q)), l2_normalize(jnp.asarray(c))
    search = make_sharded_topk(mesh, k=5, metric="cosine", backend="exact")
    s1, i1 = search(qj, shard_rows(cj, mesh), jnp.int32(5))
    assert int(np.asarray(i1).max()) < 5
