"""Ring-systolic sharded k-NN graph over an 8-device CPU mesh must match
the single-device ops.knn.knn_graph oracle exactly (exact mode — CPU
approx_max_k is exact too, so both modes are checked against argsort)."""

import numpy as np
import pytest

import jax.numpy as jnp

from latentrag_tpu.ops import l2_normalize
from latentrag_tpu.ops.knn import knn_graph
from latentrag_tpu.parallel import make_mesh, sharded_knn_graph


@pytest.mark.parametrize("n", [9, 63, 64, 100, 257])
@pytest.mark.parametrize("exact", [True, False])
def test_matches_single_device(rng, eight_devices, n, exact):
    mesh = make_mesh(8)
    k = min(8, n - 1)
    c = l2_normalize(jnp.asarray(
        rng.standard_normal((n, 16)).astype(np.float32)))
    got = sharded_knn_graph(c, k, mesh, metric="cosine", exact=exact)
    want = knn_graph(c, k, metric="cosine", exact=True)
    assert got.shape == want.shape == (n, k)
    # identical neighbour sets AND identical best-first order (ties are
    # measure-zero on random floats)
    np.testing.assert_array_equal(got, want)


def test_k_exceeds_corpus(rng, eight_devices):
    mesh = make_mesh(8)
    n, k = 5, 9
    c = l2_normalize(jnp.asarray(
        rng.standard_normal((n, 16)).astype(np.float32)))
    got = sharded_knn_graph(c, k, mesh, exact=True)
    assert got.shape == (n, k)
    for r in range(n):
        row = got[r]
        valid = row[row >= 0]
        # every other row appears once; the rest are -1 sentinels
        assert sorted(valid) == sorted(set(range(n)) - {r})
        assert (row[len(valid):] == -1).all()


def test_euclidean_metric(rng, eight_devices):
    mesh = make_mesh(8)
    n, k = 70, 6
    c = jnp.asarray(rng.standard_normal((n, 12)).astype(np.float32))
    got = sharded_knn_graph(c, k, mesh, metric="euclidean", exact=True)
    d2 = ((np.asarray(c)[:, None, :] - np.asarray(c)[None, :, :]) ** 2
          ).sum(-1)
    np.fill_diagonal(d2, np.inf)
    want = np.argsort(d2, axis=1)[:, :k]
    np.testing.assert_array_equal(got, want)
