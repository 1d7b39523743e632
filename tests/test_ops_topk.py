"""Differential tests: tiled exact_topk vs a naive numpy oracle.

Mirrors the reference's key oracle pattern — FAISS-vs-bruteforce equivalence
(``test/test_retrieval.py:61-83``) — but with numpy as the ground truth and
the tiled scan kernel as the implementation under test.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from latentrag_tpu.ops import (
    estimate_covariance,
    exact_topk,
    l2_normalize,
    maxsim_aggregate,
    pairwise_scores,
    prepare_for_metric,
    whitening_factor,
)


def np_scores(q, c, metric):
    if metric == "cosine":
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        cn = c / np.linalg.norm(c, axis=1, keepdims=True)
        return qn @ cn.T
    if metric == "euclidean":
        d2 = ((q[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        return -d2
    raise ValueError(metric)


@pytest.mark.parametrize("n", [7, 64, 300, 1000])
@pytest.mark.parametrize("metric", ["cosine", "euclidean"])
def test_exact_topk_matches_numpy(rng, n, metric):
    d, nq, k = 32, 9, 5
    q = rng.standard_normal((nq, d)).astype(np.float32)
    c = rng.standard_normal((n, d)).astype(np.float32)
    ref = np_scores(q, c, metric)
    ref_idx = np.argsort(-ref, axis=1)[:, :k]
    ref_s = np.take_along_axis(ref, ref_idx, axis=1)

    qj = prepare_for_metric(jnp.asarray(q), metric)
    cj = prepare_for_metric(jnp.asarray(c), metric)
    s, i = exact_topk(qj, cj, k=k, metric=metric, block_size=128)
    np.testing.assert_allclose(np.asarray(s), ref_s, rtol=1e-4, atol=1e-4)
    # indices must match wherever scores are not tied
    ties = np.abs(np.diff(ref_s, axis=1)) < 1e-6
    mask = np.ones_like(ref_idx, dtype=bool)
    mask[:, 1:] &= ~ties
    mask[:, :-1] &= ~ties
    assert (np.asarray(i) == ref_idx)[mask].all()


def test_exact_topk_single_block_path(rng):
    q = rng.standard_normal((4, 16)).astype(np.float32)
    c = rng.standard_normal((50, 16)).astype(np.float32)
    s_small, i_small = exact_topk(
        l2_normalize(jnp.asarray(q)), l2_normalize(jnp.asarray(c)), k=3,
        metric="cosine", block_size=4096,
    )
    s_tiled, i_tiled = exact_topk(
        l2_normalize(jnp.asarray(q)), l2_normalize(jnp.asarray(c)), k=3,
        metric="cosine", block_size=16,
    )
    np.testing.assert_allclose(
        np.asarray(s_small), np.asarray(s_tiled), rtol=1e-5, atol=1e-6
    )
    assert (np.asarray(i_small) == np.asarray(i_tiled)).all()


def test_k_larger_than_corpus(rng):
    q = rng.standard_normal((2, 8)).astype(np.float32)
    c = rng.standard_normal((3, 8)).astype(np.float32)
    s, i = exact_topk(jnp.asarray(q), jnp.asarray(c), k=10, metric="euclidean")
    assert s.shape == (2, 3) and i.shape == (2, 3)


def test_mahalanobis_equals_whitened_euclidean(rng):
    d = 16
    x = rng.standard_normal((500, d)).astype(np.float32) @ (
        rng.standard_normal((d, d)).astype(np.float32) * 0.3
    )
    q = x[:5]
    c = x[5:105]
    cov = estimate_covariance(jnp.asarray(x), shrinkage=1e-3)
    w = whitening_factor(cov)
    # numpy oracle: (q-c) Σ⁻¹ (q-c)ᵀ
    cov_np = np.asarray(cov, dtype=np.float64)
    inv = np.linalg.inv(cov_np)
    diff = q[:, None, :] - c[None, :, :]
    ref = -np.einsum("qcd,de,qce->qc", diff, inv, diff)

    qw = prepare_for_metric(jnp.asarray(q), "mahalanobis", w)
    cw = prepare_for_metric(jnp.asarray(c), "mahalanobis", w)
    got = np.asarray(pairwise_scores(qw, cw, "mahalanobis"))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("n", [300, 3000, 20000])
def test_approx_topk_mahalanobis_matches_exact(rng, n):
    """ADVICE r2 (medium): approx_topk scored mahalanobis as a plain dot.

    All three size branches (n<=8192 exact-top_k, single approx block,
    unrolled multi-block) must rank identically to the exact oracle on
    whitened inputs. CPU approx_max_k is exact, so sets match exactly.
    """
    from latentrag_tpu.ops import approx_topk

    d = 16
    x = rng.standard_normal((n + 8, d)).astype(np.float32)
    x[:, 0] *= 5.0  # anisotropy so mahalanobis != euclidean != dot
    q, c = x[:8], x[8:]
    cov = estimate_covariance(jnp.asarray(x), shrinkage=1e-3)
    w = whitening_factor(cov)
    qw = prepare_for_metric(jnp.asarray(q), "mahalanobis", w)
    cw = prepare_for_metric(jnp.asarray(c), "mahalanobis", w)
    s_ref, i_ref = exact_topk(qw, cw, k=10, metric="mahalanobis")
    s_got, i_got = approx_topk(
        qw, cw, k=10, metric="mahalanobis", block_size=8192
    )
    np.testing.assert_allclose(
        np.asarray(s_got), np.asarray(s_ref), rtol=1e-4, atol=1e-4
    )
    for a, b in zip(np.asarray(i_got), np.asarray(i_ref)):
        assert set(a) == set(b)
    # scores must be negated squared whitened distances, not dots
    ref_row = np.asarray(pairwise_scores(qw, cw, "mahalanobis"))
    picked = np.take_along_axis(ref_row, np.asarray(i_got), axis=1)
    np.testing.assert_allclose(
        np.asarray(s_got), picked, rtol=1e-3, atol=1e-3
    )


def test_dense_retriever_xla_backend_mahalanobis(rng):
    """Force backend='xla' (the TPU default) with mahalanobis: rankings must
    match the exact oracle backend, not dot-product order."""
    from latentrag_tpu.retrieval.dense import DenseRetriever

    x = rng.standard_normal((600, 12)).astype(np.float32)
    x[:, 0] *= 6.0
    corpus, q = x[:560], x[560:568]
    texts = [f"doc {i}" for i in range(len(corpus))]
    r_xla = DenseRetriever(metric="mahalanobis", backend="xla")
    r_xla.build(corpus, texts)
    r_ref = DenseRetriever(metric="mahalanobis", backend="xla_exact")
    r_ref.build(corpus, texts)
    _, i_xla = r_xla.search(q, 5)
    _, i_ref = r_ref.search(q, 5)
    np.testing.assert_array_equal(np.asarray(i_xla), np.asarray(i_ref))


def test_maxsim_aggregate_matches_python_loop(rng):
    nq, c, k = 6, 12, 4
    scores = rng.standard_normal((nq, c)).astype(np.float32)
    doc_ids = rng.integers(0, 5, size=(nq, c)).astype(np.int32)
    top_s, top_ids = maxsim_aggregate(
        jnp.asarray(scores), jnp.asarray(doc_ids), k=k
    )
    for qi in range(nq):
        best: dict[int, float] = {}
        for ci in range(c):
            d = int(doc_ids[qi, ci])
            best[d] = max(best.get(d, -1e30), float(scores[qi, ci]))
        expect = sorted(best.items(), key=lambda kv: -kv[1])[:k]
        got = list(
            zip(np.asarray(top_ids)[qi].tolist(), np.asarray(top_s)[qi].tolist())
        )
        for (ed, es), (gd, gs) in zip(expect, got):
            assert abs(es - gs) < 1e-5
            # doc id must match unless scores tie
            if abs(es - gs) < 1e-5 and all(
                abs(es - os) > 1e-6 for od, os in expect if od != ed
            ):
                assert ed == gd


def test_maxsim_pads_with_neg_inf_when_fewer_docs(rng):
    scores = jnp.asarray([[1.0, 0.9, 0.8]])
    doc_ids = jnp.asarray([[7, 7, 7]], dtype=jnp.int32)
    s, ids = maxsim_aggregate(scores, doc_ids, k=3)
    assert float(s[0, 0]) == pytest.approx(1.0)
    assert int(ids[0, 0]) == 7
    assert float(s[0, 1]) < -1e30  # duplicates masked out


def test_maxsim_sentinels_filtered_in_pipeline_logic():
    """Duplicate-doc sentinels must not inflate recall (regression for the
    chunked small-corpus case)."""
    from latentrag_tpu.evaluation import evaluate_retrieval

    # retrieved row contains a duplicate of the relevant doc
    res = evaluate_retrieval([[3, 3, 1]], [3], ["Recall@3"])
    assert res["Recall@3"]["mean"] == 1.0  # not 2.0


class TestBinaryTier:
    def test_pack_unpack_roundtrip(self, rng):
        from latentrag_tpu.ops.binary import binary_quantize, binary_unpack

        x = rng.standard_normal((40, 48)).astype(np.float32)  # d % 32 != 0
        packed = binary_quantize(jnp.asarray(x))
        assert packed.shape == (40, 2) and packed.dtype == jnp.uint32
        pm1 = np.asarray(binary_unpack(packed, 48))
        np.testing.assert_array_equal(pm1, np.where(x >= 0, 1, -1))

    def test_binary_topk_oversample_recall(self, rng):
        from latentrag_tpu.ops.binary import binary_quantize, binary_topk
        from latentrag_tpu.ops import exact_topk, l2_normalize

        # embedding-like low-rank geometry (what latents look like)
        g = rng.standard_normal((4000, 16)).astype(np.float32)
        proj = rng.standard_normal((16, 64)).astype(np.float32)
        c = l2_normalize(jnp.asarray(g @ proj))
        q = l2_normalize(jnp.asarray(
            rng.standard_normal((32, 16)).astype(np.float32) @ proj
        ))
        _, ref = exact_topk(q, c, k=10)
        packed = binary_quantize(c)
        # oversample 8x by binary score, then check the true top-10 are
        # inside the candidate set (the production rescoring pattern)
        _, cand = binary_topk(q, packed, d=64, k=80)
        ref, cand = np.asarray(ref), np.asarray(cand)
        containment = np.mean(
            [len(set(ref[i]) & set(cand[i])) / 10 for i in range(32)]
        )
        assert containment >= 0.9, containment

    def test_binary_topk_blocked_matches_single(self, rng):
        from latentrag_tpu.ops.binary import binary_quantize, binary_topk
        from latentrag_tpu.ops import l2_normalize

        c = l2_normalize(jnp.asarray(
            rng.standard_normal((1000, 64)).astype(np.float32)))
        q = l2_normalize(jnp.asarray(
            rng.standard_normal((8, 64)).astype(np.float32)))
        packed = binary_quantize(c)
        s1, i1 = binary_topk(q, packed, d=64, k=5)
        s2, i2 = binary_topk(q, packed, d=64, k=5, block_size=256)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-3)
        # CPU approx_max_k is exact, so indices are deterministic — this
        # catches base-offset bugs in the blocked merge
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        # >16 blocks exercises the lax.scan fallback
        s3, i3 = binary_topk(q, packed, d=64, k=5, block_size=32)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i3))


@pytest.mark.parametrize("n", [9000, 12288])  # with tail / exact blocks
def test_approx_topk_many_block_scan_matches_exact(rng, n):
    """The >16-block regime runs the block-scan path (one block per step +
    unrolled tail); results must equal the exact oracle on CPU where
    approx_max_k is exact."""
    from latentrag_tpu.ops import approx_topk

    d, k = 16, 10
    c = rng.standard_normal((n, d)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    q = rng.standard_normal((8, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    # block_size=512 -> 16*512=8192 < n -> many-block scan path
    s, i = approx_topk(jnp.asarray(q), jnp.asarray(c), k=k,
                       metric="cosine", block_size=512)
    s, i = np.asarray(s), np.asarray(i)
    sims = q @ c.T
    oracle_i = np.argsort(-sims, axis=1)[:, :k]
    oracle_s = np.take_along_axis(sims, oracle_i, axis=1)
    assert np.allclose(np.sort(s, axis=1), np.sort(oracle_s, axis=1),
                       atol=1e-5)
    for row_i, row_o in zip(i, oracle_i):
        assert set(row_i) == set(row_o)
    # scores are the true similarities of the returned rows
    assert np.allclose(s, np.take_along_axis(sims, i, axis=1), atol=1e-6)


def test_approx_topk_many_block_scan_euclidean(rng):
    from latentrag_tpu.ops import approx_topk

    n, d, k = 8700, 12, 5
    c = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((4, d)).astype(np.float32)
    s, i = approx_topk(jnp.asarray(q), jnp.asarray(c), k=k,
                       metric="euclidean", block_size=512)
    s, i = np.asarray(s), np.asarray(i)
    d2 = ((q[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    oracle_i = np.argsort(d2, axis=1)[:, :k]
    for row_i, row_o in zip(i, oracle_i):
        assert set(row_i) == set(row_o)
    assert np.allclose(s, -np.take_along_axis(d2, i, axis=1), atol=1e-4)


def test_binary_topk_block_scan(rng):
    """binary_topk's multi-block regime (block scan) ranks like the
    single-block path."""
    from latentrag_tpu.ops.binary import binary_quantize, binary_topk

    n, d = 9000, 32
    c = rng.standard_normal((n, d)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    q = rng.standard_normal((6, d)).astype(np.float32)
    packed = binary_quantize(jnp.asarray(c))
    s1, i1 = binary_topk(jnp.asarray(q), packed, d=d, k=8, block_size=512)
    s0, i0 = binary_topk(jnp.asarray(q), packed, d=d, k=8,
                         block_size=1 << 20)
    assert np.allclose(np.sort(np.asarray(s1)), np.sort(np.asarray(s0)),
                       atol=1e-3)
    for a, b in zip(np.asarray(i1), np.asarray(i0)):
        assert set(a) == set(b)


def test_sq8_topk_many_block_scan(rng):
    """sq8_topk's >16-block regime (block scan) ranks like single-block."""
    from latentrag_tpu.ops.quantization import sq8_quantize, sq8_topk

    n, d, k = 9000, 16, 7
    c = rng.standard_normal((n, d)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    q = rng.standard_normal((5, d)).astype(np.float32)
    codes, scale = sq8_quantize(jnp.asarray(c))
    s1, i1 = sq8_topk(jnp.asarray(q), codes, scale, k=k, block_size=512)
    s0, i0 = sq8_topk(jnp.asarray(q), codes, scale, k=k,
                      block_size=1 << 20)
    for a, b in zip(np.asarray(i1), np.asarray(i0)):
        assert set(a) == set(b)
    np.testing.assert_allclose(np.sort(np.asarray(s1), axis=1),
                               np.sort(np.asarray(s0), axis=1), atol=1e-4)
