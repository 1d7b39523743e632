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


def test_sharded_sq8_backend(rng, eight_devices):
    from latentrag_tpu.ops.quantization import sq8_quantize
    import jax

    mesh = make_mesh(8)
    n = 4096
    c = rng.standard_normal((n, 16)).astype(np.float32)
    q = rng.standard_normal((6, 16)).astype(np.float32)
    cj = l2_normalize(jnp.asarray(c))
    qj = l2_normalize(jnp.asarray(q))
    s0, i0 = exact_topk(qj, cj, k=5)
    codes, scale = sq8_quantize(cj)
    search = make_sharded_topk(mesh, k=5, metric="cosine", backend="sq8")
    s1, i1 = search(qj, shard_rows(codes, mesh), jnp.int32(n), scale)
    i0, i1 = np.asarray(i0), np.asarray(i1)
    recall = np.mean([len(set(i0[r]) & set(i1[r])) / 5 for r in range(6)])
    assert recall >= 0.8


def test_sharded_int8_dense_retriever(rng, eight_devices):
    from latentrag_tpu.retrieval import DenseRetriever

    mesh = make_mesh(8)
    c = rng.standard_normal((500, 16)).astype(np.float32)
    c = c / np.linalg.norm(c, axis=1, keepdims=True)
    r0 = DenseRetriever(backend="xla_exact", store_dtype="float32")
    r0.build(c, [f"t{i}" for i in range(500)])
    _, i0 = r0.search(c[:8], 5)

    r8 = DenseRetriever(backend="xla", store_dtype="int8", mesh=mesh)
    r8.build(c, [f"t{i}" for i in range(500)])
    _, i1 = r8.search(c[:8], 5)
    recall = np.mean([len(set(a) & set(b)) / 5 for a, b in zip(i0, i1)])
    assert recall >= 0.8


def test_sharded_index_checkpoint_roundtrip(rng, eight_devices, tmp_path):
    from latentrag_tpu.parallel import load_sharded_index, save_sharded_index

    mesh = make_mesh(8)
    c = l2_normalize(jnp.asarray(
        rng.standard_normal((128, 16)).astype(np.float32)))
    c_sharded = shard_rows(c, mesh)
    path = str(tmp_path / "sharded_idx")
    save_sharded_index(path, c_sharded, {"n": 128, "metric": "cosine"})

    restored, meta = load_sharded_index(path, mesh)
    assert meta["n"] == 128
    np.testing.assert_allclose(
        np.asarray(restored), np.asarray(c_sharded), rtol=1e-6
    )
    # restored array is actually sharded over the mesh
    assert len(restored.sharding.device_set) == 8


def test_sharded_euclidean_pad_rows_never_displace(rng, eight_devices):
    """Regression: zero pad rows score -||q||^2 under euclidean and used to
    crowd out genuine candidates from the last shard."""
    mesh = make_mesh(8)
    n = 41  # pads to 48: 7 zero rows on the last shard
    c = (rng.standard_normal((n, 8)) * 0.1 + 5.0).astype(np.float32)
    q = c[:4] + 0.01
    s0, i0 = exact_topk(jnp.asarray(q), jnp.asarray(c), k=6,
                        metric="euclidean")
    search = make_sharded_topk(mesh, k=6, metric="euclidean", backend="exact")
    s1, i1 = search(jnp.asarray(q), shard_rows(jnp.asarray(c), mesh),
                    jnp.int32(n))
    for a, b in zip(np.asarray(i0), np.asarray(i1)):
        assert set(a.tolist()) == set(b.tolist())


def test_sharded_dense_orbax_persistence(rng, eight_devices, tmp_path):
    """Mesh-sharded DenseRetriever persists through Orbax (per-shard writes)
    and reloads directly into the mesh layout."""
    from latentrag_tpu.retrieval import DenseRetriever

    mesh = make_mesh(8)
    c = rng.standard_normal((100, 16)).astype(np.float32)
    c = c / np.linalg.norm(c, axis=1, keepdims=True)
    path = str(tmp_path / "sharded_dense")
    r1 = DenseRetriever(backend="xla_exact", store_dtype="float32",
                        mesh=mesh, index_path=path)
    r1.build(c, [f"t{i}" for i in range(100)])
    s1, i1 = r1.search(c[:5], 4)
    import os

    assert os.path.isdir(os.path.join(path, "sharded"))
    assert not os.path.exists(os.path.join(path, "corpus.npy"))

    r2 = DenseRetriever(backend="xla_exact", store_dtype="float32",
                        mesh=make_mesh(8), index_path=path)
    assert r2.is_built and r2._corpus_n == 100
    s2, i2 = r2.search(c[:5], 4)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-5)


def test_sharded_edge_shapes(rng, eight_devices):
    # property sweep: n not divisible by the mesh, n < devices, k >= n —
    # the pad-row masking and -1 sentinels must hold for all of them
    from latentrag_tpu.ops import l2_normalize
    import jax.numpy as jnp

    mesh = make_mesh(8)
    for n, k in ((5, 3), (7, 7), (9, 12), (63, 10), (64, 64)):
        c = l2_normalize(jnp.asarray(
            rng.standard_normal((n, 16)).astype(np.float32)))
        q = l2_normalize(jnp.asarray(
            rng.standard_normal((4, 16)).astype(np.float32)))
        search = make_sharded_topk(mesh, k=k, metric="cosine",
                                   backend="exact")
        s, i = search(q, shard_rows(c, mesh), jnp.int32(n))
        s, i = np.asarray(s), np.asarray(i)
        ref = np.asarray(q) @ np.asarray(c).T
        ref_top = np.argsort(-ref, axis=1)[:, : min(k, n)]
        for row in range(4):
            got = [j for j in i[row] if j >= 0]
            assert len(got) == min(k, n), (n, k, i[row])
            assert set(got) == set(ref_top[row].tolist()), (n, k)
            # sentinel slots (if any) sit at the tail with -inf scores
            assert all(j == -1 for j in i[row][len(got):])
