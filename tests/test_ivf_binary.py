"""IVF over the packed sign-bit store: ops oracle + cascade routing."""

import jax.numpy as jnp
import numpy as np
import pytest

from latentrag_tpu.ops.binary import binary_quantize, binary_unpack
from latentrag_tpu.ops.ivf import ivf_append, ivf_build_binary, ivf_search
from latentrag_tpu.retrieval import DenseRetriever

N, D, K = 10_000, 32, 5


def _clustered(n, d, seed=0, n_centers=32, spread=0.15):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_centers, d)).astype(np.float32)
    which = rng.integers(0, n_centers, size=n)
    x = centers[which] + spread * rng.normal(size=(n, d)).astype(np.float32)
    return (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)


@pytest.fixture(scope="module")
def corpus():
    return _clustered(N, D, seed=0)


@pytest.fixture(scope="module")
def packed(corpus):
    return binary_quantize(jnp.asarray(corpus))


@pytest.fixture(scope="module")
def index(packed):
    return ivf_build_binary(packed, D, nlist=32, cap=128, seed=0)


def test_binary_layout_partitions_rows(index, packed):
    ids = np.asarray(index.block_ids).ravel()
    real = ids[ids >= 0]
    assert len(real) == packed.shape[0]
    assert len(np.unique(real)) == packed.shape[0]
    assert index.blocks.dtype == jnp.uint32
    # centroids live in the UNPACKED space
    assert index.centroids.shape[1] == D


def test_full_probe_matches_manual_sign_dot(index, corpus):
    q = _clustered(8, D, seed=7)
    s, i = ivf_search(
        jnp.asarray(q), index, k=K, nprobe=index.nblocks,
        exact_select=True, dim=D,
    )
    signs = np.where(corpus >= 0, 1.0, -1.0).astype(np.float32)
    ref = q @ signs.T  # asymmetric stage-1 scores
    order = np.argsort(-ref, axis=1)[:, :K]
    # bf16 scoring: compare score VALUES (ties in sign-dots are common,
    # so id sets may legitimately differ among equal scores)
    np.testing.assert_allclose(
        np.asarray(s),
        np.take_along_axis(ref, order, axis=1),
        rtol=0.02, atol=0.05,
    )


def test_missing_dim_raises(index, corpus):
    with pytest.raises(ValueError, match="dim"):
        ivf_search(
            jnp.asarray(corpus[:2]), index, k=2, nprobe=4,
        )


def test_binary_append(index, packed, corpus):
    extra = _clustered(300, D, seed=9)
    grown = ivf_append(
        index, binary_quantize(jnp.asarray(extra)), id_base=N, dim=D
    )
    ids = np.asarray(grown.block_ids).ravel()
    real = ids[ids >= 0]
    assert len(real) == N + 300 and real.max() == N + 299


def test_binary_retriever_cascade_routes_stage1_through_ivf(corpus):
    r = DenseRetriever(
        store_dtype="binary", backend="auto", ivf_nlist=32, ivf_cap=128,
        ivf_nprobe=10**6, binary_oversample=8,
    )
    r.build(corpus, [f"t{i}" for i in range(N)])
    q = _clustered(4, D, seed=3)
    s, i = r.search(q, K)
    assert r._ivf_index is not None  # stage 1 actually used the IVF
    # full probe: identical result to the exhaustive cascade (stage-1
    # candidate set = whole corpus either way; rescore is exact)
    r2 = DenseRetriever(
        store_dtype="binary", backend="auto", binary_oversample=8
    )
    r2.build(corpus, [f"t{i}" for i in range(N)])
    s2, i2 = r2.search(q, K)
    np.testing.assert_allclose(s, s2, rtol=0, atol=1e-5)
    overlap = np.mean([len(set(a) & set(b)) / K for a, b in zip(i, i2)])
    assert overlap >= 0.8  # sign-dot ties can reorder marginal slots


def test_binary_retriever_add_appends_packed_blocks(corpus):
    r = DenseRetriever(
        store_dtype="binary", backend="auto", ivf_nlist=32, ivf_cap=128,
        ivf_nprobe=10**6,
    )
    r.build(corpus, [f"t{i}" for i in range(N)])
    r.search(_clustered(2, D, seed=1), K)
    assert r._ivf_index is not None
    nb0 = r._ivf_index.nblocks
    extra = _clustered(8, D, seed=21)
    r.add(extra, [f"x{i}" for i in range(8)],
          doc_ids=[f"x{i}" for i in range(8)])
    assert r._ivf_index is not None and r._ivf_index.nblocks > nb0
    _, _, ids = r.retrieve(extra[5], top_k=1)
    assert ids[0] == "x5"  # rescore is exact: self-match wins


def test_binary_ivf_filtered_search(corpus):
    r = DenseRetriever(
        store_dtype="binary", backend="auto", ivf_nlist=32, ivf_cap=128,
        ivf_nprobe=10**6,
    )
    meta = [{"lane": i % 3} for i in range(N)]
    r.build(corpus, [f"t{i}" for i in range(N)], metadata=meta)
    q = _clustered(4, D, seed=5)
    _, i = r.search(q, K, filter={"where": {"lane": 1}})
    live = i >= 0
    assert live.any()
    assert np.all(np.asarray(i)[live] % 3 == 1)
