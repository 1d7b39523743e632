"""IVF over the packed int4 (SQ4) store: ops oracle + cascade routing."""

import jax.numpy as jnp
import numpy as np
import pytest

from latentrag_tpu.ops.ivf import ivf_append, ivf_build_sq4, ivf_search
from latentrag_tpu.ops.quantization import (
    sq4_quantize,
    sq4_unpack,
    sq8_quantize,
)
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
def packed_scale(corpus):
    return sq4_quantize(jnp.asarray(corpus))


@pytest.fixture(scope="module")
def index(packed_scale):
    return ivf_build_sq4(packed_scale[0], D, nlist=32, cap=128, seed=0)


def test_sq4_layout_partitions_rows(index, packed_scale):
    ids = np.asarray(index.block_ids).ravel()
    real = ids[ids >= 0]
    assert len(real) == packed_scale[0].shape[0]
    assert len(np.unique(real)) == packed_scale[0].shape[0]
    assert index.blocks.dtype == jnp.uint8
    # centroids live in the UNPACKED int4 code space
    assert index.centroids.shape[1] == D


def test_full_probe_matches_manual_sq4_scoring(index, packed_scale, corpus):
    packed, scale = packed_scale
    q = _clustered(8, D, seed=7)
    s, i = ivf_search(
        jnp.asarray(q), index, k=K, nprobe=index.nblocks,
        exact_select=True, dim=D, scale=scale,
    )
    # replicate sq4_topk's arithmetic: int8-quantized queries against
    # the unpacked int4 codes, one combined scale out front
    q_codes, q_scale = sq8_quantize(jnp.asarray(q))
    codes = np.asarray(sq4_unpack(packed, D), dtype=np.float32)
    ref = (
        np.asarray(q_codes, dtype=np.float32) @ codes.T
    ) * float(q_scale * scale)
    order = np.argsort(-ref, axis=1)[:, :K]
    np.testing.assert_allclose(
        np.asarray(s),
        np.take_along_axis(ref, order, axis=1),
        rtol=1e-5, atol=1e-6,
    )
    # integer dots rarely tie on this synthetic; ids should line up too
    overlap = np.mean(
        [len(set(a) & set(b)) / K for a, b in zip(np.asarray(i), order)]
    )
    assert overlap >= 0.9


def test_missing_dim_raises(index, corpus):
    with pytest.raises(ValueError, match="dim"):
        ivf_search(jnp.asarray(corpus[:2]), index, k=2, nprobe=4)


def test_euclidean_blocks_rejected(index, corpus, packed_scale):
    with pytest.raises(ValueError, match="cosine/dot"):
        ivf_search(
            jnp.asarray(corpus[:2]), index, k=2, nprobe=4, dim=D,
            metric="euclidean", scale=packed_scale[1],
        )


def test_sq4_append(index, packed_scale, corpus):
    from latentrag_tpu.ops.quantization import sq4_quantize_with_scale

    extra = _clustered(300, D, seed=9)
    grown = ivf_append(
        index,
        sq4_quantize_with_scale(jnp.asarray(extra), packed_scale[1]),
        id_base=N,
        dim=D,
    )
    ids = np.asarray(grown.block_ids).ravel()
    real = ids[ids >= 0]
    assert len(real) == N + 300 and real.max() == N + 299


def test_int4_retriever_cascade_routes_stage1_through_ivf(corpus):
    r = DenseRetriever(
        store_dtype="int4", backend="auto", ivf_nlist=32, ivf_cap=128,
        ivf_nprobe=10**6, binary_oversample=8,
    )
    r.build(corpus, [f"t{i}" for i in range(N)])
    q = _clustered(4, D, seed=3)
    s, i = r.search(q, K)
    assert r._ivf_index is not None  # stage 1 actually used the IVF
    assert r._ivf_index.blocks.dtype == jnp.uint8
    # full probe: identical result to the exhaustive cascade (stage-1
    # candidate set = whole corpus either way; rescore is exact)
    r2 = DenseRetriever(
        store_dtype="int4", backend="auto", binary_oversample=8
    )
    r2.build(corpus, [f"t{i}" for i in range(N)])
    s2, i2 = r2.search(q, K)
    np.testing.assert_allclose(s, s2, rtol=0, atol=1e-5)
    overlap = np.mean([len(set(a) & set(b)) / K for a, b in zip(i, i2)])
    assert overlap >= 0.8  # marginal stage-1 candidates can differ


def test_int4_retriever_add_appends_packed_blocks(corpus):
    r = DenseRetriever(
        store_dtype="int4", backend="auto", ivf_nlist=32, ivf_cap=128,
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


def test_int4_ivf_filtered_search(corpus):
    r = DenseRetriever(
        store_dtype="int4", backend="auto", ivf_nlist=32, ivf_cap=128,
        ivf_nprobe=10**6,
    )
    meta = [{"lane": i % 3} for i in range(N)]
    r.build(corpus, [f"t{i}" for i in range(N)], metadata=meta)
    q = _clustered(4, D, seed=5)
    _, i = r.search(q, K, filter={"where": {"lane": 1}})
    live = i >= 0
    assert live.any()
    assert np.all(np.asarray(i)[live] % 3 == 1)
