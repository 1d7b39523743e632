"""Retrieval-layer tests: oracle equivalence, persistence round-trip,
fingerprint rebuild semantics, BM25 behaviour — the reference's key test
patterns (``test/test_retrieval.py``) plus the drift fixes.
"""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from latentrag_tpu.retrieval import (
    BM25Retriever,
    DenseRetriever,
    build_retriever,
    make_fingerprint,
)
from latentrag_tpu.utils.config import RetrievalConfig


def _normed(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.mark.parametrize("n", [37, 500])
@pytest.mark.parametrize("metric", ["cosine", "euclidean", "mahalanobis"])
def test_dense_matches_numpy_oracle(rng, n, metric):
    d, nq, k = 24, 8, 5
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((nq, d)).astype(np.float32)
    r = DenseRetriever(metric=metric, backend="xla_exact", store_dtype="float32")
    r.build(corpus, [f"t{i}" for i in range(n)])
    scores, idx = r.search(queries, k)

    if metric == "cosine":
        cn = corpus / np.linalg.norm(corpus, axis=1, keepdims=True)
        qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
        ref = qn @ cn.T
    elif metric == "euclidean":
        ref = -(((queries[:, None] - corpus[None]) ** 2).sum(-1))
    else:
        x = corpus.astype(np.float64)
        mu = x.mean(0)
        xc = x - mu
        cov = xc.T @ xc / (n - 1)
        cov = 0.999 * cov + 0.001 * np.trace(cov) / d * np.eye(d)
        inv = np.linalg.inv(cov)
        diff = queries[:, None, :] - corpus[None, :, :]
        ref = -np.einsum("qcd,de,qce->qc", diff, inv, diff)
    ref_idx = np.argsort(-ref, axis=1)[:, :k]
    agree = (idx == ref_idx).mean()
    assert agree > 0.95  # ties / fp tolerance
    assert r.get_stats()["search_calls"] == 1


def test_retrieve_single_query_surface(rng):
    corpus = _normed(rng, 50, 16)
    r = DenseRetriever(backend="xla_exact", store_dtype="float32")
    r.build(corpus, [f"text-{i}" for i in range(50)], doc_ids=list(range(50)))
    texts, scores, doc_ids = r.retrieve(corpus[7], top_k=3)
    assert texts[0] == "text-7" and doc_ids[0] == 7
    assert scores[0] == pytest.approx(1.0, abs=1e-3)
    assert len(texts) == len(scores) == len(doc_ids) == 3


def test_persistence_roundtrip(rng, tmp_path):
    corpus = _normed(rng, 64, 16)
    path = str(tmp_path / "idx")
    fp = make_fingerprint(d=16, embedding_model="test-model", ae_type="dae",
                          latent_dim=16, metric="cosine")
    r1 = DenseRetriever(backend="xla_exact", index_path=path,
                        store_dtype="float32")
    r1.build(corpus, [f"t{i}" for i in range(64)], fingerprint=fp)
    q = corpus[:5]
    s1, i1 = r1.search(q, 4)

    r2 = DenseRetriever(backend="xla_exact", index_path=path,
                        store_dtype="float32")
    assert r2.is_built
    # build() adds a corpus_digest on top of the caller fingerprint
    assert {k: v for k, v in r2.fingerprint.items()
            if k != "corpus_digest"} == fp
    assert "corpus_digest" in r2.fingerprint
    s2, i2 = r2.search(q, 4)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-5)
    assert r2.texts == r1.texts


def test_fingerprint_mismatch_triggers_rebuild(rng, tmp_path):
    corpus = _normed(rng, 32, 8)
    path = str(tmp_path / "idx")
    fp_old = make_fingerprint(d=8, ae_type="vae", latent_dim=8)
    r1 = DenseRetriever(backend="xla_exact", index_path=path,
                        store_dtype="float32")
    r1.build(corpus, [f"t{i}" for i in range(32)], fingerprint=fp_old)

    r2 = DenseRetriever(backend="xla_exact", index_path=path,
                        store_dtype="float32")
    fp_new = make_fingerprint(d=8, ae_type="dae", latent_dim=8)
    assert not r2.compatible_with(fp_new)
    new_corpus = _normed(rng, 40, 8)
    r2.build(new_corpus, [f"n{i}" for i in range(40)], fingerprint=fp_new)
    assert r2._corpus_n == 40
    assert {k: v for k, v in r2.fingerprint.items()
            if k != "corpus_digest"} == fp_new


def test_corrupted_store_starts_clean(rng, tmp_path):
    path = tmp_path / "idx"
    path.mkdir()
    (path / "meta.json").write_text("{not json")
    r = DenseRetriever(backend="xla_exact", index_path=str(path))
    assert not r.is_built


def test_sharded_dense_matches(rng, eight_devices):
    from latentrag_tpu.parallel import make_mesh

    corpus = _normed(rng, 333, 16)
    queries = _normed(rng, 6, 16)
    r0 = DenseRetriever(backend="xla_exact", store_dtype="float32")
    r0.build(corpus, [f"t{i}" for i in range(333)])
    s0, i0 = r0.search(queries, 5)

    r1 = DenseRetriever(backend="xla_exact", store_dtype="float32",
                        mesh=make_mesh(8))
    r1.build(corpus, [f"t{i}" for i in range(333)])
    s1, i1 = r1.search(queries, 5)
    np.testing.assert_allclose(s0, s1, rtol=1e-4, atol=1e-4)
    for a, b in zip(i0, i1):
        assert set(a.tolist()) == set(b.tolist())


def test_factory_builds_with_full_fingerprint(rng, tmp_path):
    cfg = RetrievalConfig(backend="dense", kernel="xla_exact",
                          index_path=str(tmp_path / "idx"))
    corpus = _normed(rng, 20, 8)
    r = build_retriever(corpus, [f"t{i}" for i in range(20)], None, cfg,
                        embedding_model="mini", ae_type="cae", latent_dim=8)
    assert r.fingerprint["embedding_model"] == "mini"
    assert r.fingerprint["ae_type"] == "cae"
    assert r.is_built


def test_device_resident_build_and_search(rng, tmp_path):
    """The encode->index device path: build() and search() accept DEVICE
    arrays without a host round trip, and the corpus digest matches the
    host-array build of the same data (so persisted compatibility checks
    agree across both paths)."""
    import jax.numpy as jnp

    from latentrag_tpu.retrieval.dense import _corpus_digest

    corpus = _normed(rng, 120, 16)
    queries = corpus[:6]
    texts = [f"t{i}" for i in range(120)]

    host = DenseRetriever(backend="xla_exact", store_dtype="float32")
    host.build(corpus, texts)
    s0, i0 = host.search(queries, 5)

    dev = DenseRetriever(backend="xla_exact", store_dtype="float32",
                         index_path=str(tmp_path / "devidx"))
    dev.build(jnp.asarray(corpus), texts)
    s1, i1 = dev.search(jnp.asarray(queries), 5)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(s0, s1, rtol=1e-6, atol=1e-6)
    # digest parity: same data, device vs host input, identical identity
    assert _corpus_digest(corpus, texts) == _corpus_digest(
        jnp.asarray(corpus), texts
    )
    assert host.fingerprint["corpus_digest"] == dev.fingerprint[
        "corpus_digest"
    ]
    # the device-built persisted store warm-loads like any other
    warm = DenseRetriever(backend="xla_exact", store_dtype="float32",
                          index_path=str(tmp_path / "devidx"))
    assert warm.is_built
    s2, i2 = warm.search(queries, 5)
    np.testing.assert_array_equal(i1, i2)


def test_compressor_device_path_matches_host(rng):
    from latentrag_tpu.data import WordPieceTokenizer
    from latentrag_tpu.models.encoder import SentenceEncoder
    from latentrag_tpu.retrieval import EmbeddingCompressor
    from latentrag_tpu.utils.config import EncoderConfig

    texts = [f"document number {i} about retrieval" for i in range(20)]
    tok = WordPieceTokenizer.train_from_corpus(texts, vocab_size=300,
                                               min_freq=1)
    enc = SentenceEncoder(tok, EncoderConfig(
        vocab_size=0, hidden_dim=16, num_layers=1, num_heads=2, mlp_dim=32,
        max_length=32, dtype="float32", batch_size=8,
    ))
    comp = EmbeddingCompressor(enc)
    h = comp.encode_text(texts)
    d = comp.encode_text(texts, device=True)
    assert not isinstance(h, type(d)) or h is not d
    np.testing.assert_array_equal(h, np.asarray(d))


def test_load_retriever_warm_boot(rng, tmp_path):
    """load_retriever reconstructs a serving retriever from disk with no
    embeddings (serve.py warm boot); provenance contradictions fall back
    to None (cold build)."""
    from latentrag_tpu.retrieval import load_retriever

    cfg = RetrievalConfig(backend="dense", kernel="xla_exact",
                          index_path=str(tmp_path / "idx"))
    corpus = _normed(rng, 40, 8)
    built = build_retriever(
        corpus, [f"t{i}" for i in range(40)], None, cfg,
        embedding_model="mini", ae_type="cae", latent_dim=8,
    )
    s0, i0 = built.search(corpus[:4], 3)

    warm = load_retriever(cfg, expect={"embedding_model": "mini",
                                       "ae_type": "cae"})
    assert warm is not None and warm.is_built
    assert warm.texts == built.texts
    s1, i1 = warm.search(corpus[:4], 3)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(s0, s1, rtol=1e-5, atol=1e-5)

    # contradicting provenance -> refuse to warm-boot
    assert load_retriever(
        cfg, expect={"embedding_model": "other-model"}
    ) is None
    # no store at all -> None
    assert load_retriever(
        RetrievalConfig(backend="dense", index_path=str(tmp_path / "none"))
    ) is None
    assert load_retriever(RetrievalConfig(backend="dense")) is None


class TestBM25:
    CORPUS = [
        "the cat sat on the mat",
        "dogs chase cats in the park",
        "quantum computing with superconducting qubits",
        "the stock market fell sharply today",
        "cats and kittens drink milk",
    ]

    def test_relevant_doc_ranks_first(self):
        r = BM25Retriever()
        r.build_index(self.CORPUS)
        results = r.retrieve("superconducting qubits", top_k=3)
        assert results[0][0] == self.CORPUS[2]
        assert results[0][1] > 0

    def test_term_frequency_matters(self):
        r = BM25Retriever()
        r.build_index(self.CORPUS)
        results = r.retrieve("cats", top_k=5)
        texts = [t for t, _ in results]
        assert self.CORPUS[1] in texts[:2] or self.CORPUS[4] in texts[:2]

    def test_batch_search_shapes(self):
        r = BM25Retriever()
        r.build_index(self.CORPUS)
        d, i = r.search(["cat", "market"], k=3)
        assert d.shape == (2, 3) and i.shape == (2, 3)
        assert i[1, 0] == 3  # stock market doc

    def test_unknown_terms_score_zero(self):
        r = BM25Retriever()
        r.build_index(self.CORPUS)
        assert r.score_query("xylophone zeppelin").max() == 0.0


def test_int8_store_high_recall(rng, tmp_path):
    from latentrag_tpu.ops.quantization import sq8_quantize

    corpus = _normed(rng, 400, 32)
    queries = _normed(rng, 12, 32)
    r_exact = DenseRetriever(backend="xla_exact", store_dtype="float32")
    r_exact.build(corpus, [f"t{i}" for i in range(400)])
    _, i0 = r_exact.search(queries, 5)

    path = str(tmp_path / "idx8")
    r8 = DenseRetriever(backend="xla", store_dtype="int8",
                        index_path=path)
    r8.build(corpus, [f"t{i}" for i in range(400)])
    _, i1 = r8.search(queries, 5)
    recall = np.mean([len(set(a) & set(b)) / 5 for a, b in zip(i0, i1)])
    assert recall >= 0.9

    # persistence roundtrip re-quantizes identically
    r8b = DenseRetriever(backend="xla", store_dtype="int8",
                         index_path=path)
    assert r8b.is_built
    _, i2 = r8b.search(queries, 5)
    np.testing.assert_array_equal(i1, i2)


def test_int8_rejects_euclidean(rng):
    r = DenseRetriever(metric="euclidean", store_dtype="int8")
    with pytest.raises(ValueError):
        r.build(_normed(rng, 10, 8), [f"t{i}" for i in range(10)])


class TestIncrementalAdd:
    def test_add_then_search(self, rng):
        c1 = _normed(rng, 40, 16)
        c2 = _normed(rng, 15, 16)
        r = DenseRetriever(backend="xla_exact", store_dtype="float32")
        r.build(c1, [f"a{i}" for i in range(40)])
        r.add(c2, [f"b{i}" for i in range(15)])
        assert r._corpus_n == 55
        texts, scores, doc_ids = r.retrieve(c2[3], top_k=1)
        assert texts[0] == "b3"
        assert doc_ids[0] == 43  # auto-assigned continuing ids

    def test_add_matches_fresh_build(self, rng):
        c = _normed(rng, 60, 8)
        q = _normed(rng, 5, 8)
        r_inc = DenseRetriever(backend="xla_exact", store_dtype="float32")
        r_inc.build(c[:40], [f"t{i}" for i in range(40)])
        r_inc.add(c[40:], [f"t{i}" for i in range(40, 60)])
        r_all = DenseRetriever(backend="xla_exact", store_dtype="float32")
        r_all.build(c, [f"t{i}" for i in range(60)])
        s1, i1 = r_inc.search(q, 5)
        s2, i2 = r_all.search(q, 5)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(s1, s2, rtol=1e-5)

    def test_add_int8_reuses_scale(self, rng):
        c = _normed(rng, 50, 8)
        r = DenseRetriever(backend="xla", store_dtype="int8")
        r.build(c[:30], [f"t{i}" for i in range(30)])
        scale_before = float(r._corpus_scale)
        r.add(c[30:], [f"t{i}" for i in range(30, 50)])
        assert float(r._corpus_scale) == scale_before
        texts, _, _ = r.retrieve(c[45], top_k=1)
        assert texts[0] == "t45"

    def test_add_before_build_raises(self, rng):
        r = DenseRetriever()
        with pytest.raises(RuntimeError):
            r.add(_normed(rng, 3, 8), ["x", "y", "z"])

    def test_add_persists(self, rng, tmp_path):
        path = str(tmp_path / "idx")
        c = _normed(rng, 30, 8)
        r = DenseRetriever(backend="xla_exact", store_dtype="float32",
                           index_path=path)
        r.build(c[:20], [f"t{i}" for i in range(20)])
        r.add(c[20:], [f"t{i}" for i in range(20, 30)])
        r2 = DenseRetriever(backend="xla_exact", store_dtype="float32",
                            index_path=path)
        assert r2._corpus_n == 30
        assert r2.texts[-1] == "t29"


def test_store_dtype_int8_via_config(rng):
    # the int8 tier must be reachable from config/CLI, not only
    # programmatically (round-2 gap)
    from latentrag_tpu.retrieval import build_retriever
    from latentrag_tpu.utils.config import RetrievalConfig

    emb = rng.standard_normal((200, 32)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    cfg = RetrievalConfig(store_dtype="int8", kernel="xla", index_path="")
    r = build_retriever(emb, [f"t{i}" for i in range(200)], None, cfg)
    texts, scores, _ = r.retrieve(emb[7], top_k=3)
    assert texts[0] == "t7"
    assert scores[0] > 0.95  # SQ8 quantization error is ~1e-2

    # requesting the exact oracle over a quantized store is a contradiction
    with pytest.raises(ValueError):
        build_retriever(
            emb, [f"t{i}" for i in range(200)], None,
            RetrievalConfig(store_dtype="int8", kernel="xla_exact",
                            index_path=""),
        )


def test_same_size_different_corpus_rebuilds(rng, tmp_path):
    # code-review r2: shape/config fingerprints alone let a DIFFERENT
    # same-size corpus be served from a stale persisted index
    path = str(tmp_path / "idx")
    fp = make_fingerprint(d=8, metric="cosine")
    a = _normed(rng, 30, 8)
    b = _normed(rng, 30, 8)  # same size, different content
    r1 = DenseRetriever(backend="xla_exact", store_dtype="float32",
                        index_path=path)
    r1.build(a, [f"a{i}" for i in range(30)], fingerprint=fp)

    r2 = DenseRetriever(backend="xla_exact", store_dtype="float32",
                        index_path=path)
    assert r2.is_built  # loaded corpus A
    r2.build(b, [f"b{i}" for i in range(30)], fingerprint=fp)
    texts, _, _ = r2.retrieve(b[3], top_k=1)
    assert texts[0] == "b3"  # corpus B served, not stale A


def test_requested_metric_wins_over_loaded(rng, tmp_path):
    # code-review r2: _load adopted the on-disk metric; a rebuild with a
    # changed config metric must use the REQUESTED one
    path = str(tmp_path / "idx")
    corpus = rng.standard_normal((40, 8)).astype(np.float32)
    r1 = DenseRetriever(metric="cosine", backend="xla_exact",
                        store_dtype="float32", index_path=path)
    r1.build(corpus, [f"t{i}" for i in range(40)],
             fingerprint=make_fingerprint(d=8, metric="cosine"))

    r2 = DenseRetriever(metric="euclidean", backend="xla_exact",
                        store_dtype="float32", index_path=path)
    r2.build(corpus, [f"t{i}" for i in range(40)],
             fingerprint=make_fingerprint(d=8, metric="euclidean"))
    assert r2.metric == "euclidean"
    q = corpus[:4]
    _, idx = r2.search(q, 3)
    ref = -(((q[:, None] - corpus[None]) ** 2).sum(-1))
    np.testing.assert_array_equal(
        idx[:, 0], np.argsort(-ref, axis=1)[:, 0]
    )


def test_ann_rejects_unrankable_metric():
    from latentrag_tpu.retrieval.ann_retriever import ANNRetriever

    with pytest.raises(ValueError):
        ANNRetriever(RetrievalConfig(metric="euclidean"), "hnsw")
    with pytest.raises(ValueError):
        ANNRetriever(RetrievalConfig(metric="mahalanobis"), "ivfpq")
    ANNRetriever(RetrievalConfig(metric="cosine"), "hnsw")  # fine
    ANNRetriever(RetrievalConfig(metric="euclidean"), "ivfpq")  # fine


def test_binary_cascade_store(rng, tmp_path):
    # 1-bit candidate generation + SQ8 rescoring (ops/binary.py): high
    # recall on embedding-like geometry at 16x less HBM than bf16
    g = rng.standard_normal((2000, 12)).astype(np.float32)
    proj = rng.standard_normal((12, 32)).astype(np.float32)
    corpus = g @ proj
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = corpus[:16] + 0.01 * rng.standard_normal((16, 32)).astype(
        np.float32
    )

    r_exact = DenseRetriever(backend="xla_exact", store_dtype="float32")
    r_exact.build(corpus, [f"t{i}" for i in range(2000)])
    _, i0 = r_exact.search(queries, 5)

    path = str(tmp_path / "idxbin")
    rb = DenseRetriever(backend="xla", store_dtype="binary", index_path=path)
    rb.build(corpus, [f"t{i}" for i in range(2000)])
    _, i1 = rb.search(queries, 5)
    recall = np.mean([len(set(a) & set(b)) / 5 for a, b in zip(i0, i1)])
    assert recall >= 0.85, recall

    # persistence roundtrip is bit-stable: packed bits persist verbatim
    rb2 = DenseRetriever(backend="xla", store_dtype="binary",
                         index_path=path)
    assert rb2.is_built and rb2._rescore_host is not None
    # HBM holds ONLY packed words (uint32 [N, D/32]); codes live host-side
    assert rb2._corpus_dev.dtype == jnp.uint32
    assert rb2._corpus_dev.shape == (2000, 32 // 32)
    _, i2 = rb2.search(queries, 5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    # incremental add keeps both stores aligned
    extra = corpus[:8] * -1.0
    rb.add(extra, [f"x{i}" for i in range(8)])
    assert rb._corpus_dev.shape[0] == rb._rescore_host.shape[0] == 2008
    texts, _, _ = rb.retrieve(extra[3], top_k=1)
    assert texts[0] == "x3"

    # exact-oracle requests are rejected up front (quantized store)
    with pytest.raises(ValueError):
        DenseRetriever(backend="xla_exact", store_dtype="binary").build(
            corpus[:50], [f"t{i}" for i in range(50)]
        )


def test_binary_cascade_sharded_matches_single_device(rng, eight_devices,
                                                      tmp_path):
    """Mesh-sharded 1-bit cascade (VERDICT r3 item 4): packed sign bits
    row-sharded over the 8-device mesh, per-shard stage 1 + all-gather,
    host SQ8 rescore — results must match the single-device cascade."""
    from latentrag_tpu.parallel import make_mesh

    g = rng.standard_normal((1003, 12)).astype(np.float32)  # odd: pad rows
    proj = rng.standard_normal((12, 32)).astype(np.float32)
    corpus = g @ proj
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = corpus[:12] + 0.01 * rng.standard_normal((12, 32)).astype(
        np.float32
    )
    texts = [f"t{i}" for i in range(1003)]

    r0 = DenseRetriever(backend="xla", store_dtype="binary")
    r0.build(corpus, texts)
    s0, i0 = r0.search(queries, 5)

    path = str(tmp_path / "idxbinmesh")
    r1 = DenseRetriever(backend="xla", store_dtype="binary",
                        mesh=make_mesh(8), index_path=path)
    r1.build(corpus, texts)
    assert r1._corpus_dev.dtype == jnp.uint32  # HBM = packed words only
    s1, i1 = r1.search(queries, 5)
    # stage-2 rescoring is exact fp32 over the candidate union; stage-1
    # candidate sets may differ at the margin between the merged-shard
    # and single-device scans, so compare top-1 + score sets, not order
    np.testing.assert_array_equal(i0[:, 0], i1[:, 0])
    np.testing.assert_allclose(s0[:, 0], s1[:, 0], atol=1e-5)
    overlap = np.mean([len(set(a) & set(b)) / 5 for a, b in zip(i0, i1)])
    assert overlap >= 0.9, overlap

    # persistence round-trip back INTO a mesh layout
    r2 = DenseRetriever(backend="xla", store_dtype="binary",
                        mesh=make_mesh(8), index_path=path)
    assert r2.is_built and r2._rescore_host is not None
    s2, i2 = r2.search(queries, 5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    # incremental add re-shards and serves the new rows
    extra = -corpus[:8]
    r1.add(extra, [f"x{i}" for i in range(8)])
    texts_out, _, _ = r1.retrieve(extra[3], top_k=1)
    assert texts_out[0] == "x3"


def test_binary_store_via_config(rng):
    from latentrag_tpu.retrieval import build_retriever

    emb = rng.standard_normal((300, 32)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    cfg = RetrievalConfig(store_dtype="binary", kernel="xla", index_path="",
                          binary_oversample=16)
    r = build_retriever(emb, [f"t{i}" for i in range(300)], None, cfg)
    assert r.binary_oversample == 16
    texts, _, _ = r.retrieve(emb[9], top_k=3)
    assert texts[0] == "t9"


def test_binary_legacy_store_loads_host_side(rng, tmp_path):
    # a pre-packed-file store (corpus.npy only) must reload via the numpy
    # packing path, matching the device packer's bits
    import os

    corpus = _normed(rng, 300, 48)  # 48 % 32 != 0 exercises pad packing
    path = str(tmp_path / "idxbin")
    rb = DenseRetriever(backend="xla", store_dtype="binary", index_path=path)
    rb.build(corpus, [f"t{i}" for i in range(300)])
    packed_fresh = np.asarray(rb._corpus_dev)

    os.remove(os.path.join(path, "binary_packed.npy"))
    # a TRUE legacy store predates the stored_digests record too — with
    # the record intact, a missing recorded file is rightly refused as a
    # mixed-generation store (covered below)
    meta_p = os.path.join(path, "meta.json")
    with open(meta_p) as f:
        meta = json.load(f)
    meta.pop("stored_digests", None)
    with open(meta_p, "w") as f:
        json.dump(meta, f)
    rb2 = DenseRetriever(backend="xla", store_dtype="binary",
                         index_path=path)
    assert rb2.is_built
    # bits agree except for code-0 dims (the dequantized corpus cannot
    # distinguish a tiny negative from zero — the reason the modern store
    # persists packed bits verbatim); agreement must still be near-total
    loaded = np.asarray(rb2._corpus_dev)
    flips = np.unpackbits(
        (loaded ^ packed_fresh).view(np.uint8)
    ).sum()
    assert flips / (loaded.size * 32) < 0.02, flips
    texts, _, _ = rb2.retrieve(corpus[11], top_k=1)
    assert texts[0] == "t11"


def test_empty_query_batches_never_crash(rng):
    # zero-query batches flow through every retriever surface
    corpus = _normed(rng, 40, 16)
    empty = np.zeros((0, 16), np.float32)

    r = DenseRetriever(backend="xla_exact", store_dtype="float32")
    r.build(corpus, [f"t{i}" for i in range(40)])
    s, i = r.search(empty, 5)
    assert s.shape == (0, 5) and i.shape == (0, 5)

    bm = BM25Retriever()
    bm.build_index([f"doc {i}" for i in range(10)])
    d, ix = bm.search([], 3)
    assert d.shape[0] == 0


def test_recall_target_auto_policy(rng):
    """'auto' resolves by regime (docs/ROOFLINE.md): rt=0.95 at k >= 64
    (re-rank oversampling), rt=0.99 below; explicit values pin it, including
    string floats arriving through dotted config overrides."""
    r = DenseRetriever(backend="xla", store_dtype="float32")
    assert r.recall_target == "auto"
    assert r._effective_recall_target(10) == 0.99
    assert r._effective_recall_target(63) == 0.99
    assert r._effective_recall_target(64) == 0.95
    assert r._effective_recall_target(100) == 0.95

    pinned = DenseRetriever(backend="xla", recall_target=0.9)
    assert pinned._effective_recall_target(100) == 0.9

    # config override path coerces to the default's type (str) — the
    # resolver must accept "0.97"
    from latentrag_tpu.utils import Config, apply_overrides

    cfg = apply_overrides(Config(), ["retrieval.recall_target=0.97"])
    via_cfg = DenseRetriever(backend="xla",
                             recall_target=cfg.retrieval.recall_target)
    assert via_cfg._effective_recall_target(100) == 0.97

    # the auto policy changes only the candidate pass, never correctness
    # of returned scores: search at k=64 still returns exact scores of
    # valid corpus rows
    corpus = _normed(rng, 300, 16)
    r.build(corpus, [f"t{i}" for i in range(300)])
    q = _normed(rng, 4, 16)
    s, i = r.search(q, 64)
    sims = q @ corpus.T
    assert np.allclose(s, np.take_along_axis(sims, i, axis=1), atol=1e-5)


def test_lazy_text_store_round_trip(rng, tmp_path):
    """Persisted texts live in the mmap'd lazy store (r4): warm boots
    decode texts only on access, legacy meta.json stores keep loading,
    and add() after a lazy load materialises correctly."""
    import json
    import os

    from latentrag_tpu.retrieval.textstore import LazyTexts

    corpus = _normed(rng, 40, 8)
    texts = [f"text number {i} with unicode snowman ☃" for i in range(40)]
    path = str(tmp_path / "idx")
    r1 = DenseRetriever(backend="xla_exact", store_dtype="float32",
                        index_path=path)
    r1.build(corpus, texts, doc_ids=[i * 3 for i in range(40)])

    # meta.json no longer inlines the corpus text
    meta = json.load(open(os.path.join(path, "meta.json")))
    assert "texts" not in meta
    r2 = DenseRetriever(backend="xla_exact", store_dtype="float32",
                        index_path=path)
    assert isinstance(r2.texts, LazyTexts)
    assert len(r2.texts) == 40
    assert r2.texts[7] == texts[7]   # on-demand decode, unicode intact
    assert r2.texts[-1] == texts[-1]
    assert r2.doc_ids == [i * 3 for i in range(40)]
    t, s, d = r2.retrieve(corpus[5], top_k=1)
    assert t[0] == texts[5] and d[0] == 15

    # add() after a lazy load materialises and re-persists
    r2.add(-corpus[:2], ["added a", "added b"], doc_ids=["xa", "xb"])
    assert r2.texts[-1] == "added b"
    r3 = DenseRetriever(backend="xla_exact", store_dtype="float32",
                        index_path=path)
    assert len(r3.texts) == 42
    # string doc_ids fall back to meta.json inlining
    assert r3.doc_ids[-1] == "xb"

    # legacy store (texts inlined in meta.json, no lazy files) still loads
    legacy = str(tmp_path / "legacy")
    r4 = DenseRetriever(backend="xla_exact", store_dtype="float32",
                        index_path=legacy)
    r4.build(corpus, texts)
    for f in ("texts.bin.npy", "texts_offsets.npy", "texts_doc_ids.npy"):
        os.remove(os.path.join(legacy, f))
    meta = json.load(open(os.path.join(legacy, "meta.json")))
    meta["texts"] = texts
    meta["doc_ids"] = list(range(40))
    json.dump(meta, open(os.path.join(legacy, "meta.json"), "w"))
    r5 = DenseRetriever(backend="xla_exact", store_dtype="float32",
                        index_path=legacy)
    assert r5.is_built and r5.texts[3] == texts[3]


def test_lazy_text_store_corruption_refused(rng, tmp_path):
    """A mixed-generation or corrupt lazy store must never silently pair
    wrong texts with scores: the offsets<->blob cross-check and the
    texts-vs-index length check both force a clean cold boot instead."""
    import os

    corpus = _normed(rng, 30, 8)
    texts = [f"doc {i}" for i in range(30)]

    # 1. blob/offsets from different generations: truncate the blob
    path = str(tmp_path / "idx")
    r1 = DenseRetriever(backend="xla_exact", store_dtype="float32",
                        index_path=path)
    r1.build(corpus, texts)
    blob_p = os.path.join(path, "texts.bin.npy")
    blob = np.load(blob_p)
    with open(blob_p, "wb") as f:
        np.save(f, blob[: len(blob) // 2])
    r2 = DenseRetriever(backend="xla_exact", store_dtype="float32",
                        index_path=path)
    assert not r2.is_built  # refused, clean start — not garbage texts

    # 2. texts store shorter than the index's recorded n (crash between
    # the texts save and the meta rename during a shrinking rebuild)
    path2 = str(tmp_path / "idx2")
    r3 = DenseRetriever(backend="xla_exact", store_dtype="float32",
                        index_path=path2)
    r3.build(corpus, texts)
    from latentrag_tpu.retrieval.textstore import save_texts

    save_texts(os.path.join(path2, "texts"), texts[:11], list(range(11)))
    r4 = DenseRetriever(backend="xla_exact", store_dtype="float32",
                        index_path=path2)
    assert not r4.is_built

    # 3. same for an ANN tier: texts/index length mismatch -> cold boot
    from latentrag_tpu.retrieval.ann_retriever import ANNRetriever
    from latentrag_tpu.utils.config import RetrievalConfig

    apath = str(tmp_path / "ann")
    acfg = RetrievalConfig(index_path=apath, backend="hnsw")
    a1 = ANNRetriever(acfg, "hnsw")
    a1.build(corpus, texts)
    save_texts(apath + ".hnsw.texts", texts[:5], list(range(5)))
    a2 = ANNRetriever(acfg, "hnsw")
    assert not a2.load_persisted()
    # a refused store must not leave a half-loaded retriever behind
    assert not a2.is_built and a2.texts == [] == list(a2.doc_ids or [])


def test_dense_remove_basic(rng, tmp_path):
    """remove() drops listed doc_ids, keeps survivors' scores bit-equal
    (no re-derived scale/covariance), persists, and warm-reloads."""
    corpus = _normed(rng, 30, 16)
    texts = [f"doc {i}" for i in range(30)]
    path = str(tmp_path / "idx")
    r = DenseRetriever(backend="xla_exact", store_dtype="float32",
                       index_path=path)
    r.build(corpus, texts)
    q = corpus[[3, 20]]
    s_before, _ = r.search(q, 5)

    assert r.remove([3, 7, 11, 999]) == 3  # unknown id ignored
    assert len(r.texts) == 27 and len(r.doc_ids) == 27
    s, i = r.search(q, 5)
    got0 = [r.doc_ids[j] for j in i[0] if j >= 0]
    assert not {3, 7, 11} & set(got0)
    # doc 20 still retrieves itself for q[1], score unchanged
    assert r.doc_ids[i[1][0]] == 20
    np.testing.assert_allclose(s[1][0], s_before[1][0], atol=1e-6)

    assert r.remove([5]) == 1 and r.remove([5]) == 0  # idempotent

    r2 = DenseRetriever(backend="xla_exact", store_dtype="float32",
                        index_path=path)
    assert r2.is_built and len(r2.texts) == 26
    assert 3 not in r2.doc_ids and r2.texts[0] == "doc 0"


def test_dense_remove_binary_and_mesh(rng, eight_devices, tmp_path):
    """remove() on the 1-bit cascade keeps rescore codes aligned with the
    packed rows, on a mesh as on a single device."""
    from latentrag_tpu.parallel import make_mesh

    g = rng.standard_normal((200, 12)).astype(np.float32)
    proj = rng.standard_normal((12, 32)).astype(np.float32)
    corpus = g @ proj
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    texts = [f"t{i}" for i in range(200)]
    queries = corpus[[50, 120]]

    for mesh in (None, make_mesh(8)):
        r = DenseRetriever(backend="xla", store_dtype="binary", mesh=mesh)
        r.build(corpus, texts)
        assert r.remove([50, 0, 199]) == 3
        assert r._rescore_host.shape[0] == 197 == len(r.texts)
        s, i = r.search(queries, 3)
        got0 = [r.doc_ids[j] for j in i[0] if j >= 0]
        assert 50 not in got0
        assert r.doc_ids[i[1][0]] == 120  # survivor still self-retrieves


def test_dense_same_n_corpus_swap_refused(rng, tmp_path):
    """The same-n crash window: a corpus.npy from a DIFFERENT generation
    (same shape, so every length check passes) must be refused via the
    stored sampled digests in meta.json."""
    corpus = _normed(rng, 20, 8)
    texts = [f"doc {i}" for i in range(20)]
    path = str(tmp_path / "idx")
    r = DenseRetriever(backend="xla_exact", store_dtype="float32",
                       index_path=path)
    r.build(corpus, texts)
    # simulate: new-generation corpus landed, crash before texts/meta
    from latentrag_tpu.retrieval.textstore import atomic_save

    atomic_save(os.path.join(path, "corpus.npy"),
                _normed(rng, 20, 8).astype(np.float32))
    r2 = DenseRetriever(backend="xla_exact", store_dtype="float32",
                        index_path=path)
    assert not r2.is_built  # refused, clean start


def test_dense_remove_guards_and_fingerprint(rng, tmp_path):
    """remove() refuses to empty the index, and live mutations drop the
    build-time corpus_digest (it no longer describes the store)."""
    import pytest as _pytest

    corpus = _normed(rng, 6, 8)
    texts = [f"doc {i}" for i in range(6)]
    r = DenseRetriever(backend="xla_exact", store_dtype="float32")
    r.build(corpus, texts, fingerprint={"embedding_model": "m"})
    assert "corpus_digest" in r.fingerprint
    assert r.remove([0, 1]) == 2
    assert "corpus_digest" not in r.fingerprint
    assert r.fingerprint["live_mutations"] == 1
    with _pytest.raises(ValueError, match="every document"):
        r.remove([2, 3, 4, 5])
    assert len(r.texts) == 4  # untouched by the refused call


def test_sharded_store_generation_mismatch_refused(rng, eight_devices,
                                                   tmp_path):
    """A sharded/ store from a different generation than meta.json (crash
    between the Orbax write and the meta rename) must be refused — a
    same-n pairing would otherwise serve wrong vectors silently."""
    import json as _json

    from latentrag_tpu.parallel import make_mesh

    corpus = _normed(rng, 64, 16)
    texts = [f"doc {i}" for i in range(64)]
    path = str(tmp_path / "idx")
    r = DenseRetriever(backend="xla", store_dtype="float32",
                       mesh=make_mesh(8), index_path=path)
    r.build(corpus, texts)
    meta_p = os.path.join(path, "sharded", "meta.json")
    with open(meta_p) as f:
        smeta = _json.load(f)
    assert smeta["generation"]  # tag present
    smeta["generation"] = "deadbeef00000000"
    with open(meta_p, "w") as f:
        _json.dump(smeta, f)
    r2 = DenseRetriever(backend="xla", store_dtype="float32",
                        mesh=make_mesh(8), index_path=path)
    assert not r2.is_built  # refused, clean start


def test_serve_remove_protocol(rng):
    """The dense tier is the remove-capable tier; ANN tiers raise the
    documented error instead of silently ignoring the request."""
    from latentrag_tpu.retrieval.ann_retriever import ANNRetriever
    from latentrag_tpu.utils.config import RetrievalConfig

    a = ANNRetriever(RetrievalConfig(backend="hnsw"), "hnsw")
    assert not hasattr(a, "remove")  # serve surfaces a protocol error


def test_lazy_text_store_same_size_mixed_generation(rng, tmp_path):
    """Two generations whose blobs happen to have identical total size
    must still be refused: the per-save random generation tag (stored in
    the offsets header AND the blob tail) catches what a length check
    cannot."""
    import shutil

    from latentrag_tpu.retrieval.textstore import load_texts, save_texts

    prefix = str(tmp_path / "texts")
    save_texts(prefix, ["a", "bb"], [0, 1])
    old_blob = prefix + ".bin.npy"
    shutil.copy(old_blob, str(tmp_path / "old_blob.npy"))
    # second save with the SAME total byte count but different splits —
    # then simulate a crash before the blob rename by restoring gen-1's
    # blob under gen-2's offsets/doc_ids
    save_texts(prefix, ["aa", "b"], [0, 1])
    shutil.copy(str(tmp_path / "old_blob.npy"), old_blob)
    texts, ids = load_texts(prefix)
    assert texts is None and ids is None  # refused, not ["ab", "b"]

    # doc_ids from a different generation are refused the same way
    save_texts(prefix, ["x", "yy"], [7, 8])
    ids_p = prefix + "_doc_ids.npy"
    shutil.copy(ids_p, str(tmp_path / "old_ids.npy"))
    save_texts(prefix, ["p", "qq"], [1, 2])
    shutil.copy(str(tmp_path / "old_ids.npy"), ids_p)
    texts, ids = load_texts(prefix)
    assert texts is None and ids is None


def test_lazy_text_store_headerless_legacy_loads(tmp_path):
    """Stores written before the generation-tag header (r4 early) are
    headerless: plain cumsum offsets + raw blob + raw ids. They must keep
    loading — the format is additive."""
    from latentrag_tpu.retrieval.textstore import load_texts

    prefix = str(tmp_path / "texts")
    data = [t.encode() for t in ("alpha", "bee")]
    offs = np.zeros(3, dtype=np.int64)
    np.cumsum([len(d) for d in data], out=offs[1:])
    with open(prefix + "_offsets.npy", "wb") as f:
        np.save(f, offs)
    with open(prefix + ".bin.npy", "wb") as f:
        np.save(f, np.frombuffer(b"".join(data), dtype=np.uint8))
    with open(prefix + "_doc_ids.npy", "wb") as f:
        np.save(f, np.asarray([4, 9], dtype=np.int64))
    texts, ids = load_texts(prefix)
    assert list(texts) == ["alpha", "bee"] and ids == [4, 9]


def test_ann_missing_doc_ids_returns_false_not_keyerror(rng, tmp_path):
    """Lazy texts present but the ids sidecar gone AND meta.json predating
    inlined doc_ids: load_persisted must keep its returns-False contract
    (KeyError escaping here crashed the warm-boot path)."""
    import os

    from latentrag_tpu.retrieval.ann_retriever import ANNRetriever
    from latentrag_tpu.utils.config import RetrievalConfig

    corpus = _normed(rng, 25, 8)
    texts = [f"doc {i}" for i in range(25)]
    apath = str(tmp_path / "ann")
    acfg = RetrievalConfig(index_path=apath, backend="hnsw")
    a1 = ANNRetriever(acfg, "hnsw")
    a1.build(corpus, texts)  # int doc_ids -> meta.json has no doc_ids key
    os.remove(apath + ".hnsw.texts_doc_ids.npy")
    a2 = ANNRetriever(acfg, "hnsw")
    assert not a2.load_persisted()  # False, not KeyError
    assert not a2.is_built


def test_dense_save_drops_stale_sidecars(rng, tmp_path):
    """Rebuilding a path with a different store type must remove the old
    type's sidecars: a stale binary_packed.npy would otherwise pair gen-1
    sign bits with the gen-2 corpus on a later binary load."""
    import os

    corpus = _normed(rng, 40, 16)
    texts = [f"doc {i}" for i in range(40)]
    path = str(tmp_path / "idx")
    rb = DenseRetriever(backend="xla", store_dtype="binary",
                        index_path=path)
    rb.build(corpus, texts)
    assert os.path.exists(os.path.join(path, "binary_packed.npy"))
    assert os.path.exists(os.path.join(path, "sq8_scale.npy"))

    # a DIFFERENT corpus forces an actual rebuild (same-corpus builds
    # short-circuit on the digest and rightly leave the store alone)
    corpus2 = _normed(rng, 30, 16)
    texts2 = [f"new doc {i}" for i in range(30)]
    rf = DenseRetriever(backend="xla_exact", store_dtype="float32",
                        index_path=path)
    rf.build(corpus2, texts2)
    assert not os.path.exists(os.path.join(path, "binary_packed.npy"))
    assert not os.path.exists(os.path.join(path, "sq8_scale.npy"))
    # and the float store loads clean
    r2 = DenseRetriever(backend="xla_exact", store_dtype="float32",
                        index_path=path)
    assert r2.is_built and len(r2.texts) == 30


def test_dense_refused_store_leaves_clean_state(rng, tmp_path):
    """A refused (mixed-generation) store must not leak its metric or
    fingerprint into the clean-started retriever — a later build() would
    persist that stale provenance into the fresh index."""
    import os

    corpus = _normed(rng, 20, 8)
    texts = [f"doc {i}" for i in range(20)]
    path = str(tmp_path / "idx")
    r1 = DenseRetriever(backend="xla_exact", store_dtype="float32",
                        index_path=path,
                        fingerprint={"embedding_model": "m1", "ae": "vae"})
    r1.build(corpus, texts)
    # shrink the text store out from under the index -> refusal
    from latentrag_tpu.retrieval.textstore import save_texts

    save_texts(os.path.join(path, "texts"), texts[:7], list(range(7)))
    r2 = DenseRetriever(backend="xla_exact", store_dtype="float32",
                        index_path=path)
    assert not r2.is_built
    assert r2.fingerprint is None  # not the refused store's provenance
    assert r2.texts == [] and list(r2.doc_ids or []) == []
