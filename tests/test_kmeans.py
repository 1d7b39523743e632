"""Device k-means / PQ-encode kernels and the TPU-assisted IVF-PQ build.

Differential strategy: the device trainer must (a) match the C++
trainer's k-means objective, (b) agree with brute-force
assignment/encoding, and (c) produce parameters the C++ serving tier
treats identically to its own — same trained params + raw add vs
device-encoded add give identical search results.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latentrag_tpu.ops.kmeans import (
    assign_clusters,
    ivfpq_encode_device,
    ivfpq_train_device,
    kmeans,
    pq_encode,
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _clustered(rng, n_per, centers, d, spread=0.05):
    cents = rng.standard_normal((centers, d)).astype(np.float32) * 3
    x = np.concatenate([
        c + spread * rng.standard_normal((n_per, d)).astype(np.float32)
        for c in cents
    ])
    return x, cents


def _quant_err(x, cents):
    d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
    return float(d2.min(axis=1).mean())


def test_kmeans_objective_parity_with_cpp(rng):
    """Vanilla Lloyd's is init-sensitive (planted-center recovery is NOT
    guaranteed — the C++ trainer has the same property), so the honest
    differential is the k-means objective: the device trainer's mean
    quantization error must match the C++ trainer's on the same data."""
    from latentrag_tpu.retrieval.ann import kmeans_train

    x, _ = _clustered(rng, 50, 8, 16)
    dev = np.asarray(kmeans(jnp.asarray(x), 8, iters=25,
                            key=jax.random.PRNGKey(0), block_size=64))
    host = kmeans_train(x, 8, iters=25, seed=0)
    e_dev, e_host = _quant_err(x, dev), _quant_err(x, host)
    assert e_dev <= 1.2 * e_host + 1e-6


def test_kmeans_blocking_invariant(rng):
    x = rng.standard_normal((130, 8)).astype(np.float32)
    a = np.asarray(kmeans(jnp.asarray(x), 5, iters=10,
                          key=jax.random.PRNGKey(1), block_size=32))
    b = np.asarray(kmeans(jnp.asarray(x), 5, iters=10,
                          key=jax.random.PRNGKey(1), block_size=1024))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_assign_clusters_matches_bruteforce(rng):
    x = rng.standard_normal((97, 12)).astype(np.float32)
    c = rng.standard_normal((9, 12)).astype(np.float32)
    got = np.asarray(assign_clusters(jnp.asarray(x), jnp.asarray(c),
                                     block_size=16))
    want = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1).argmin(axis=1)
    np.testing.assert_array_equal(got, want)


def test_pq_encode_matches_bruteforce(rng):
    n, m, dsub, ksub = 40, 4, 3, 16
    resid = rng.standard_normal((n, m * dsub)).astype(np.float32)
    books = rng.standard_normal((m, ksub, dsub)).astype(np.float32)
    got = np.asarray(pq_encode(jnp.asarray(resid), jnp.asarray(books), m=m))
    r = resid.reshape(n, m, dsub)
    want = ((r[:, :, None, :] - books[None, :, :, :]) ** 2).sum(-1) \
        .argmin(axis=2)
    np.testing.assert_array_equal(got, want.astype(np.uint8))


def test_device_params_load_into_cpp_tier(rng):
    """Same trained params, C++ raw-add vs device-encoded add: identical
    lists, codes, and search results."""
    from latentrag_tpu.retrieval.ann import IVFPQIndex

    x, _ = _clustered(rng, 40, 6, 16)
    coarse, books = ivfpq_train_device(x, nlist=6, m=4, ksub=16, iters=12)
    assert coarse.shape == (6, 16) and books.shape == (4, 16, 4)

    ix_raw = IVFPQIndex(16, nlist=6, m=4, nbits=4)
    ix_raw.set_trained(coarse, books)
    ix_raw.add(x)

    ix_dev = IVFPQIndex(16, nlist=6, m=4, nbits=4)
    ix_dev.set_trained(coarse, books)
    assigns, codes = ivfpq_encode_device(x, coarse, books)
    ix_dev.add_encoded(assigns, codes)

    q = x[::17] + 0.01
    s1, i1 = ix_raw.search(q, 5, nprobe=6)
    s2, i2 = ix_dev.search(q, 5, nprobe=6)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-5)


def test_device_build_recall_on_clustered_data(rng):
    """End-to-end device-trained index finds planted near-duplicates."""
    from latentrag_tpu.retrieval.ann import IVFPQIndex

    x, _ = _clustered(rng, 80, 8, 32, spread=0.2)
    coarse, books = ivfpq_train_device(x, nlist=8, m=8, iters=15)
    ix = IVFPQIndex(32, nlist=8, m=8, nbits=8)
    ix.set_trained(coarse, books)
    assigns, codes = ivfpq_encode_device(x, coarse, books)
    ix.add_encoded(assigns, codes)
    q = x[::13]
    _, ids = ix.search(q, 1, nprobe=8)
    # ADC distortion can confuse near-identical rows, but the true row's
    # cluster must dominate: self-hit for the overwhelming majority
    hits = (ids[:, 0] == np.arange(0, len(x), 13)).mean()
    assert hits > 0.9


def test_add_encoded_validation(rng):
    from latentrag_tpu.retrieval.ann import IVFPQIndex

    ix = IVFPQIndex(8, nlist=4, m=2, nbits=4)
    with pytest.raises(ValueError, match="codes shape"):
        ix.add_encoded(np.zeros(3, np.int32), np.zeros((3, 5), np.uint8))
    with pytest.raises(ValueError, match="out of range"):
        ix.add_encoded(np.array([0, 9], np.int32),
                       np.zeros((2, 2), np.uint8))
    with pytest.raises(ValueError, match="coarse shape"):
        ix.set_trained(np.zeros((3, 8), np.float32),
                       np.zeros((2, 16, 4), np.float32))


def test_retriever_device_build_mode(rng):
    """ANNRetriever with ivfpq_build='device' searches correctly on CPU."""
    from latentrag_tpu.retrieval.ann_retriever import ANNRetriever
    from latentrag_tpu.utils.config import RetrievalConfig

    x, _ = _clustered(rng, 50, 4, 16, spread=0.1)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    cfg = RetrievalConfig(index_path="", 
        backend="ivfpq", ivfpq_build="device", ivfpq_nlist=4, ivfpq_m=4,
        ivfpq_nprobe=4, metric="cosine",
    )
    r = ANNRetriever(cfg, kind="ivfpq")
    texts = [f"t{i}" for i in range(len(x))]
    r.build(x, texts)
    out = r.retrieve(x[3], 3)
    assert out[0][0] == "t3"
