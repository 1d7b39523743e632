"""Native ANN tier tests: recall vs exact oracle, persistence, k-means.

Builds the C++ library on first run (g++ via make). Differential pattern:
HNSW/IVF-PQ results must largely agree with numpy exact search — the
reference's FAISS-vs-bruteforce oracle test (``test/test_retrieval.py``).
"""

import numpy as np
import pytest

pytest.importorskip("ctypes")

from latentrag_tpu.retrieval.ann import HNSWIndex, IVFPQIndex, kmeans_train


def _normed(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(0)
    return _normed(rng, 2000, 32)


@pytest.fixture(scope="module")
def queries():
    rng = np.random.default_rng(1)
    return _normed(rng, 50, 32)


def exact_topk_np(q, c, k):
    sims = q @ c.T
    idx = np.argsort(-sims, axis=1)[:, :k]
    return np.take_along_axis(sims, idx, axis=1), idx


class TestHNSW:
    def test_recall_vs_exact(self, corpus, queries):
        ix = HNSWIndex(32, M=16, ef_construction=100, ef_search=64)
        ix.add(corpus)
        assert len(ix) == 2000
        _, ref_idx = exact_topk_np(queries, corpus, 10)
        _, got_idx = ix.search(queries, 10)
        recall = np.mean(
            [
                len(set(ref_idx[i]) & set(got_idx[i])) / 10
                for i in range(len(queries))
            ]
        )
        assert recall >= 0.9, recall

    def test_self_retrieval(self, corpus):
        ix = HNSWIndex(32, M=16, ef_construction=100)
        ix.add(corpus[:500])
        scores, ids = ix.search(corpus[:20], 1)
        assert (ids[:, 0] == np.arange(20)).mean() >= 0.95
        np.testing.assert_allclose(scores[:, 0].max(), 1.0, rtol=1e-4)

    def test_persistence_roundtrip(self, corpus, queries, tmp_path):
        ix = HNSWIndex(32, M=16, ef_construction=100)
        ix.add(corpus[:800])
        s1, i1 = ix.search(queries, 5)
        path = str(tmp_path / "g.hnsw")
        ix.save(path)
        ix2 = HNSWIndex.load(path)
        assert ix2.dim == 32 and len(ix2) == 800
        s2, i2 = ix2.search(queries, 5)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(s1, s2)

    def test_k_larger_than_index(self):
        ix = HNSWIndex(8, M=8, ef_construction=50)
        ix.add(np.eye(8, dtype=np.float32)[:3])
        scores, ids = ix.search(np.eye(8, dtype=np.float32)[:1], 5)
        assert (ids[0, 3:] == -1).all()


class TestKMeans:
    def test_separated_clusters_recovered(self):
        rng = np.random.default_rng(0)
        centers = np.array([[10, 0], [-10, 0], [0, 10]], np.float32)
        data = np.concatenate(
            [c + 0.1 * rng.standard_normal((100, 2)).astype(np.float32)
             for c in centers]
        )
        cents = kmeans_train(data, k=3, iters=25, seed=1)
        # each true center has a learned centroid within 0.5
        for c in centers:
            assert np.linalg.norm(cents - c, axis=1).min() < 0.5


class TestIVFPQ:
    def test_recall_vs_exact(self, corpus, queries):
        ix = IVFPQIndex(32, nlist=16, m=8, nbits=8)
        ix.train(corpus, iters=10)
        ix.add(corpus)
        _, ref_idx = exact_topk_np(queries, corpus, 10)
        _, got_idx = ix.search(queries, 10, nprobe=8)
        recall = np.mean(
            [
                len(set(ref_idx[i]) & set(got_idx[i])) / 10
                for i in range(len(queries))
            ]
        )
        # quantized + half the lists probed: lossy but must be far above chance
        assert recall >= 0.5, recall

    def test_more_probes_help(self, corpus, queries):
        ix = IVFPQIndex(32, nlist=16, m=8, nbits=8)
        ix.train(corpus, iters=10)
        ix.add(corpus)
        _, ref_idx = exact_topk_np(queries, corpus, 10)

        def recall(nprobe):
            _, got = ix.search(queries, 10, nprobe=nprobe)
            return np.mean(
                [
                    len(set(ref_idx[i]) & set(got[i])) / 10
                    for i in range(len(queries))
                ]
            )

        assert recall(16) >= recall(2) - 1e-9

    def test_dim_divisibility_enforced(self):
        with pytest.raises(ValueError):
            IVFPQIndex(30, nlist=4, m=8)


def test_factory_dispatches_ann(corpus):
    from latentrag_tpu.retrieval import build_retriever
    from latentrag_tpu.utils.config import RetrievalConfig

    for backend in ("hnsw", "ivfpq"):
        cfg = RetrievalConfig(backend=backend, index_path="")
        r = build_retriever(
            corpus[:300], [f"t{i}" for i in range(300)], None, cfg
        )
        texts, scores, doc_ids = r.retrieve(corpus[5], top_k=3)
        assert texts[0] == "t5"
        assert r.get_stats()["search_calls"] == 1


def test_hnsw_load_rejects_corrupt_header(tmp_path):
    # ADVICE r1: a corrupt header (dim<=0, M<=1, huge n*dim) must return
    # None, not crash on a wild allocation or inf level_mult
    import struct

    for header in [
        struct.pack("<7i", -4, 16, 100, 10, 0, 0, 1),      # dim < 0
        struct.pack("<7i", 32, 1, 100, 10, 0, 0, 1),       # M <= 1
        struct.pack("<7i", 32, 16, 100, 2**30, 0, 0, 1),   # n*dim wild
        struct.pack("<7i", 32, 16, 100, 10, 99, 0, 1),     # entry OOB
        struct.pack("<7i", 32, 16, 100, 10, 0, 5, 1),      # max_level OOB
    ]:
        path = tmp_path / "bad.hnsw"
        path.write_bytes(header)
        with pytest.raises(IOError):
            HNSWIndex.load(str(path))


def test_hnsw_threaded_build_and_search_equivalence(rng):
    # the parallel build takes per-node locks; on any host (even 1-core,
    # where threads interleave preemptively) the result must be a valid
    # graph with recall comparable to the sequential build
    n, d, nq, k = 4000, 24, 50, 5
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    q = rng.standard_normal((nq, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    true = np.argsort(-(q @ corpus.T), axis=1)[:, :k]

    def recall(ix, nthreads):
        _, ids = ix.search(q, k=k, ef_search=128, nthreads=nthreads)
        assert ids.min() >= 0 and ids.max() < n
        return np.mean(
            [len(set(ids[i]) & set(true[i])) / k for i in range(nq)]
        )

    seq = HNSWIndex(d, M=16, ef_construction=100)
    seq.add(corpus, nthreads=1)
    par = HNSWIndex(d, M=16, ef_construction=100)
    par.add(corpus, nthreads=4)
    assert len(par) == n
    r_seq = recall(seq, nthreads=1)
    r_par = recall(par, nthreads=4)
    assert r_seq > 0.9
    assert r_par > r_seq - 0.05  # concurrent linking may differ slightly

    # incremental threaded add on top of an existing graph stays valid
    extra = rng.standard_normal((500, d)).astype(np.float32)
    extra /= np.linalg.norm(extra, axis=1, keepdims=True)
    par.add(extra, nthreads=4)
    assert len(par) == n + 500
    _, ids = par.search(q, k=k, nthreads=2)
    assert ids.max() < n + 500


class TestIVFPQRefine:
    """Stage-2 refinement (factory path): oversampled ADC candidates exact-
    rescored in fp32 — the FAISS IndexRefineFlat-class recall recipe."""

    def _recall(self, got_idx, ref_idx, k=10):
        return np.mean([
            len(set(ref_idx[i]) & set(got_idx[i])) / k
            for i in range(len(ref_idx))
        ])

    def test_refine_lifts_recall_and_orders_exactly(self, corpus, queries):
        from latentrag_tpu.retrieval.ann_retriever import ANNRetriever
        from latentrag_tpu.utils.config import RetrievalConfig

        texts = [f"t{i}" for i in range(len(corpus))]
        # probe ALL lists so stage-1 coverage is total: what remains is
        # pure PQ quantization error — exactly what refinement must fix
        base = ANNRetriever(
            RetrievalConfig(index_path="", backend="ivfpq", ivfpq_nlist=16, ivfpq_m=8,
                            ivfpq_nprobe=16, ivfpq_refine=0), "ivfpq")
        base.build(corpus, texts)
        refined = ANNRetriever(
            RetrievalConfig(index_path="", backend="ivfpq", ivfpq_nlist=16, ivfpq_m=8,
                            ivfpq_nprobe=16, ivfpq_refine=8), "ivfpq")
        refined.build(corpus, texts)

        _, ref_idx = exact_topk_np(queries, corpus, 10)
        s0, i0 = base.search(queries, 10)
        s1, i1 = refined.search(queries, 10)
        r0, r1 = self._recall(i0, ref_idx), self._recall(i1, ref_idx)
        assert r1 >= r0 - 1e-9
        assert r1 >= 0.95, (r0, r1)
        # refined scores are EXACT cosine similarities, sorted descending
        sims = queries @ corpus.T
        assert np.allclose(
            s1, np.take_along_axis(sims, i1, axis=1), atol=1e-5
        )
        assert (np.diff(s1, axis=1) <= 1e-6).all()

    def test_refine_euclidean_exact_scores(self):
        from latentrag_tpu.retrieval.ann_retriever import ANNRetriever
        from latentrag_tpu.utils.config import RetrievalConfig

        rng = np.random.default_rng(3)
        c = rng.standard_normal((500, 16)).astype(np.float32)
        q = rng.standard_normal((20, 16)).astype(np.float32)
        r = ANNRetriever(
            RetrievalConfig(index_path="", backend="ivfpq", metric="euclidean",
                            ivfpq_nlist=8, ivfpq_m=8, ivfpq_nprobe=8,
                            ivfpq_refine=8), "ivfpq")
        r.build(c, [f"t{i}" for i in range(500)])
        s, i = r.search(q, 5)
        d2 = ((q[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        assert np.allclose(s, -np.take_along_axis(d2, i, axis=1), atol=1e-3)

    def test_nprobe_config_knob_respected(self, corpus):
        from latentrag_tpu.retrieval.ann_retriever import ANNRetriever
        from latentrag_tpu.utils.config import RetrievalConfig

        r = ANNRetriever(
            RetrievalConfig(index_path="", backend="ivfpq", ivfpq_nlist=16,
                            ivfpq_m=8, ivfpq_nprobe=5), "ivfpq")
        r.build(corpus, [f"t{i}" for i in range(len(corpus))])
        assert r._nprobe == 5
        # auto mode derives from the EFFECTIVE nlist (capped at n/8),
        # never the raw config value
        auto = ANNRetriever(
            RetrievalConfig(index_path="", backend="ivfpq", ivfpq_nlist=4096,
                            ivfpq_m=8, ivfpq_nprobe=0), "ivfpq")
        auto.build(corpus[:80], [f"t{i}" for i in range(80)])
        assert 1 <= auto._nprobe <= auto._index.nlist

    def test_k_larger_than_corpus_pads_sentinels(self):
        from latentrag_tpu.retrieval.ann_retriever import ANNRetriever
        from latentrag_tpu.utils.config import RetrievalConfig

        rng = np.random.default_rng(4)
        c = _normed(rng, 24, 16)
        r = ANNRetriever(
            RetrievalConfig(index_path="", backend="ivfpq", ivfpq_nlist=2, ivfpq_m=8,
                            ivfpq_nprobe=2, ivfpq_refine=4), "ivfpq")
        r.build(c, [f"t{i}" for i in range(24)])
        s, i = r.search(_normed(rng, 3, 16), 30)
        assert i.shape == (3, 30)
        assert (i < 24).all()
        valid = i >= 0
        assert valid.sum(axis=1).min() >= 1
        # empty slots keep the -inf sentinel (same convention as the plain
        # IVF-PQ / HNSW paths) so raw-score merges can never rank them
        # above a genuine negative-score hit
        assert np.isneginf(s[~valid]).all()


class TestWarmLoad:
    """``load_persisted``: reconstruct a serving ANN retriever from disk
    with no embeddings in hand (serve.py warm boot)."""

    def test_hnsw_load_persisted_round_trip(self, tmp_path):
        from latentrag_tpu.retrieval.ann_retriever import ANNRetriever
        from latentrag_tpu.utils.config import RetrievalConfig

        rng = np.random.default_rng(11)
        c = _normed(rng, 300, 16)
        q = _normed(rng, 10, 16)
        cfg = RetrievalConfig(
            index_path=str(tmp_path / "ix"), backend="hnsw", hnsw_m=8
        )
        built = ANNRetriever(cfg, "hnsw")
        built.build(c, [f"t{i}" for i in range(300)],
                    doc_ids=[i * 7 for i in range(300)])
        s0, i0 = built.search(q, 5)

        warm = ANNRetriever(cfg, "hnsw")
        assert warm.load_persisted()
        assert warm.texts == built.texts
        assert warm.doc_ids == built.doc_ids
        assert warm.dim == 16
        s1, i1 = warm.search(q, 5)
        np.testing.assert_array_equal(i0, i1)
        np.testing.assert_allclose(s0, s1, atol=1e-6)

    def test_ivfpq_load_persisted_keeps_refinement(self, tmp_path):
        from latentrag_tpu.retrieval.ann_retriever import ANNRetriever
        from latentrag_tpu.utils.config import RetrievalConfig

        rng = np.random.default_rng(12)
        c = _normed(rng, 400, 16)
        q = _normed(rng, 10, 16)
        cfg = RetrievalConfig(
            index_path=str(tmp_path / "ix"), backend="ivfpq",
            ivfpq_nlist=8, ivfpq_m=8, ivfpq_nprobe=8, ivfpq_refine=4,
        )
        built = ANNRetriever(cfg, "ivfpq")
        built.build(c, [f"t{i}" for i in range(400)])
        s0, i0 = built.search(q, 5)

        warm = ANNRetriever(cfg, "ivfpq")
        assert warm.load_persisted()
        assert warm._refine_emb is not None  # refine corpus warm-loaded
        s1, i1 = warm.search(q, 5)
        np.testing.assert_array_equal(i0, i1)
        np.testing.assert_allclose(s0, s1, atol=1e-5)

    def test_load_persisted_refuses_contradicted_provenance(self, tmp_path):
        """A warm boot under a different encoder/AE must refuse: same-dim
        latents from different models would otherwise serve plausible but
        WRONG rankings (the dense tier refuses via its fingerprint)."""
        from latentrag_tpu.retrieval.ann_retriever import ANNRetriever
        from latentrag_tpu.utils.config import RetrievalConfig

        rng = np.random.default_rng(13)
        c = _normed(rng, 200, 16)
        cfg = RetrievalConfig(
            index_path=str(tmp_path / "ix"), backend="hnsw", hnsw_m=8
        )
        built = ANNRetriever(cfg, "hnsw")
        built.build(c, [f"t{i}" for i in range(200)],
                    embedding_model="mini", ae_type="vae")

        ok = ANNRetriever(cfg, "hnsw")
        assert ok.load_persisted(expect={"embedding_model": "mini",
                                         "ae_type": "vae"})
        refused = ANNRetriever(cfg, "hnsw")
        assert not refused.load_persisted(expect={"ae_type": "dae"})
        # stored None (legacy / direct builds) is a wildcard
        wild = ANNRetriever(cfg, "hnsw")
        assert wild.load_persisted(expect={"latent_dim": 64})

    def test_load_persisted_absent_store_returns_false(self, tmp_path):
        from latentrag_tpu.retrieval.ann_retriever import ANNRetriever
        from latentrag_tpu.utils.config import RetrievalConfig

        cfg = RetrievalConfig(
            index_path=str(tmp_path / "nothing"), backend="hnsw"
        )
        assert not ANNRetriever(cfg, "hnsw").load_persisted()


class TestKNNAssistedBuild:
    """Accelerator-assisted HNSW construction: all-pairs k-NN on device
    (ops/knn.py blocked matmul) + linear host assembly (build_from_knn) —
    the build that scales to multi-M corpora (SURVEY §2.4 item 1)."""

    def test_knn_graph_matches_oracle(self):
        from latentrag_tpu.ops.knn import knn_graph

        rng = np.random.default_rng(0)
        c = _normed(rng, 500, 16)
        ids = knn_graph(c, 5, metric="cosine", query_block=128, exact=True)
        sims = c @ c.T
        np.fill_diagonal(sims, -np.inf)  # self excluded
        oracle = np.argsort(-sims, axis=1)[:, :5]
        for i in range(500):
            assert set(ids[i]) == set(oracle[i]), i
        assert (ids != np.arange(500)[:, None]).all()

    def test_knn_graph_small_corpus_pads_sentinels(self):
        from latentrag_tpu.ops.knn import knn_graph

        rng = np.random.default_rng(1)
        c = _normed(rng, 4, 8)
        ids = knn_graph(c, 6, metric="cosine", exact=True)
        assert ids.shape == (4, 6)
        assert (ids[:, :3] >= 0).all()  # 3 real neighbours exist
        assert (ids[:, 3:] == -1).all()  # rest are sentinels

    def test_from_knn_recall_matches_beam_build(self, corpus, queries):
        from latentrag_tpu.ops.knn import knn_graph

        knn = knn_graph(corpus, 64, metric="cosine", exact=True)
        ix = HNSWIndex.from_knn(corpus, knn, M=16, ef_construction=100,
                                ef_search=64)
        beam = HNSWIndex(corpus.shape[1], M=16, ef_construction=100,
                         ef_search=64)
        beam.add(corpus)
        _, ref_idx = exact_topk_np(queries, corpus, 10)

        def recall(index):
            _, got = index.search(queries, 10)
            return np.mean([
                len(set(ref_idx[i]) & set(got[i])) / 10
                for i in range(len(queries))
            ])

        r_knn, r_beam = recall(ix), recall(beam)
        assert r_knn >= 0.9, r_knn
        assert r_knn >= r_beam - 0.05, (r_knn, r_beam)

    def test_from_knn_persistence_roundtrip(self, tmp_path):
        from latentrag_tpu.ops.knn import knn_graph

        rng = np.random.default_rng(2)
        c = _normed(rng, 300, 16)
        ix = HNSWIndex.from_knn(c, knn_graph(c, 16, exact=True), M=8)
        p = str(tmp_path / "knn.hnsw")
        ix.save(p)
        back = HNSWIndex.load(p, ef_search=64)
        q = _normed(rng, 10, 16)
        s0, i0 = ix.search(q, 5)
        s1, i1 = back.search(q, 5)
        assert (i0 == i1).all() and np.allclose(s0, s1)

    def test_from_knn_requires_empty_index(self, corpus):
        ix = HNSWIndex(corpus.shape[1], M=8)
        ix.add(corpus[:10])
        import ctypes

        ids = np.zeros((10, 4), np.int32)
        v = np.ascontiguousarray(corpus[:10])
        rc = ix._lib.hnsw_build_knn(
            ix._h, 10, v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), 4, 1)
        assert rc != 0

    def test_retriever_knn_build_mode(self, corpus, queries):
        from latentrag_tpu.retrieval.ann_retriever import ANNRetriever
        from latentrag_tpu.utils.config import RetrievalConfig

        r = ANNRetriever(
            RetrievalConfig(index_path="", backend="hnsw", hnsw_build="knn", hnsw_m=16),
            "hnsw")
        r.build(corpus, [f"t{i}" for i in range(len(corpus))])
        texts, _, _ = r.retrieve(corpus[7], top_k=3)
        assert texts[0] == "t7"


class TestANNPersistence:
    """FAISS write_index/.meta.json parity for the ANN tier: the expensive
    artifact reloads when the fingerprint (params + corpus digest)
    matches; mismatch or corruption rebuilds cleanly."""

    def _data(self, n=400, d=16):
        rng = np.random.default_rng(11)
        c = rng.standard_normal((n, d)).astype(np.float32)
        c /= np.linalg.norm(c, axis=1, keepdims=True)
        return c, [f"t{i}" for i in range(n)]

    @pytest.mark.parametrize("kind", ["hnsw", "ivfpq"])
    def test_round_trip_skips_rebuild(self, tmp_path, kind, monkeypatch):
        from latentrag_tpu.retrieval import ann_retriever as ar
        from latentrag_tpu.utils.config import RetrievalConfig

        c, texts = self._data()
        cfg = RetrievalConfig(
            backend=kind, index_path=str(tmp_path / "ix"),
            hnsw_m=8, ivfpq_nlist=8, ivfpq_m=8, ivfpq_nprobe=8,
        )
        r1 = ar.ANNRetriever(cfg, kind)
        r1.build(c, texts)
        q = c[::37]
        s1, i1 = r1.search(q, 5)

        # any reconstruction attempt on the second build must blow up
        monkeypatch.setattr(ar.HNSWIndex, "add",
                            lambda *a, **k: 1 / 0)
        monkeypatch.setattr(ar.HNSWIndex, "from_knn",
                            lambda *a, **k: 1 / 0)
        monkeypatch.setattr(ar.IVFPQIndex, "train",
                            lambda *a, **k: 1 / 0)
        monkeypatch.setattr(ar.IVFPQIndex, "set_trained",
                            lambda *a, **k: 1 / 0)
        r2 = ar.ANNRetriever(cfg, kind)
        r2.build(c, texts)  # loads from disk
        s2, i2 = r2.search(q, 5)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(s1, s2, atol=1e-6)

    def test_corpus_change_rebuilds(self, tmp_path):
        from latentrag_tpu.retrieval.ann_retriever import ANNRetriever
        from latentrag_tpu.utils.config import RetrievalConfig

        c, texts = self._data()
        cfg = RetrievalConfig(backend="hnsw", hnsw_m=8,
                              index_path=str(tmp_path / "ix"))
        ANNRetriever(cfg, "hnsw").build(c, texts)
        c2 = np.roll(c, 1, axis=0)  # different corpus, same shape
        r = ANNRetriever(cfg, "hnsw")
        r.build(c2, texts)
        out = r.retrieve(c2[5], 1)
        assert out[0][0] == "t5"

    def test_corrupt_file_rebuilds(self, tmp_path):
        from latentrag_tpu.retrieval.ann_retriever import ANNRetriever
        from latentrag_tpu.utils.config import RetrievalConfig

        c, texts = self._data()
        cfg = RetrievalConfig(backend="ivfpq", ivfpq_nlist=8, ivfpq_m=8,
                              ivfpq_nprobe=8,
                              index_path=str(tmp_path / "ix"))
        ANNRetriever(cfg, "ivfpq").build(c, texts)
        with open(str(tmp_path / "ix.ivfpq"), "wb") as f:
            f.write(b"garbage")
        r = ANNRetriever(cfg, "ivfpq")
        r.build(c, texts)
        out = r.retrieve(c[7], 1)
        assert out[0][0] == "t7"

    def test_ivfpq_index_save_load_identity(self, tmp_path):
        from latentrag_tpu.retrieval.ann import IVFPQIndex

        c, _ = self._data(300, 16)
        ix = IVFPQIndex(16, nlist=8, m=8, nbits=8)
        ix.train(c)
        ix.add(c)
        path = str(tmp_path / "x.ivfpq")
        ix.save(path)
        ix2 = IVFPQIndex.load(path)
        assert len(ix2) == len(ix) == 300
        assert (ix2.nlist, ix2.m, ix2.ksub) == (8, 8, 256)
        q = c[::29]
        s1, i1 = ix.search(q, 5, nprobe=8)
        s2, i2 = ix2.search(q, 5, nprobe=8)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(s1, s2, atol=1e-6)


class TestKnnBuildNavigability:
    """A kNN-derived level-0 island (candidate lists fully intra-cluster,
    no level>=1 member) must still be reachable: build_from_knn promotes
    one representative per unreachable component to level 1."""

    @pytest.mark.parametrize("seed", [1, 2, 3, 42, 99])
    def test_engineered_island_is_searchable(self, seed):
        from latentrag_tpu.retrieval.ann import HNSWIndex

        rng = np.random.default_rng(seed)
        d, n_main, n_isl = 8, 200, 3
        main = rng.standard_normal((n_main, d)).astype(np.float32)
        main /= np.linalg.norm(main, axis=1, keepdims=True)
        # a far, tight island: unit vectors near an orthogonal pole
        pole = np.zeros(d, np.float32)
        pole[-1] = 1.0
        isl = pole + 0.01 * rng.standard_normal((n_isl, d)).astype(np.float32)
        isl /= np.linalg.norm(isl, axis=1, keepdims=True)
        c = np.concatenate([main, isl])
        # engineered candidate lists: main rows reference only main rows,
        # island rows only each other - a guaranteed level-0 split
        sims = main @ main.T
        np.fill_diagonal(sims, -np.inf)
        knn_main = np.argsort(-sims, axis=1)[:, :4].astype(np.int32)
        knn_isl = np.array(
            [[j for j in range(n_main, n_main + n_isl) if j != i]
             + [-1] * (4 - n_isl + 1)
             for i in range(n_main, n_main + n_isl)], np.int32)
        knn = np.concatenate([knn_main, knn_isl])
        ix = HNSWIndex.from_knn(c, knn, M=8, ef_construction=50,
                                ef_search=32, seed=seed)
        # query at the island pole: its true top-3 are the island rows
        _, got = ix.search(pole[None, :], n_isl)
        assert set(got[0]) == set(range(n_main, n_main + n_isl)), got[0]

    @pytest.mark.parametrize("seed", list(range(10)))
    def test_flat_graph_island_promotion(self, seed):
        """Tiny corpora often draw NO level>=1 node (probability
        (1-1/M)^n), so island promotion must grow the links structure to
        level 1 itself (regression: out-of-bounds links[1] access) and
        the forced entry->island backlink must survive."""
        from latentrag_tpu.retrieval.ann import HNSWIndex

        rng = np.random.default_rng(seed)
        d, n_main, n_isl = 8, 10, 3
        main = rng.standard_normal((n_main, d)).astype(np.float32)
        main /= np.linalg.norm(main, axis=1, keepdims=True)
        pole = np.zeros(d, np.float32)
        pole[-1] = 1.0
        isl = pole + 0.01 * rng.standard_normal((n_isl, d)).astype(np.float32)
        isl /= np.linalg.norm(isl, axis=1, keepdims=True)
        c = np.concatenate([main, isl])
        sims = main @ main.T
        np.fill_diagonal(sims, -np.inf)
        knn_main = np.argsort(-sims, axis=1)[:, :4].astype(np.int32)
        knn_isl = np.array(
            [[j for j in range(n_main, n_main + n_isl) if j != i]
             + [-1] * (4 - n_isl + 1)
             for i in range(n_main, n_main + n_isl)], np.int32)
        ix = HNSWIndex.from_knn(c, np.concatenate([knn_main, knn_isl]),
                                M=8, ef_construction=20, ef_search=16,
                                seed=seed)
        _, got = ix.search(pole[None, :], n_isl)
        assert set(got[0]) == set(range(n_main, n_main + n_isl)), got[0]
        # and the main component stays searchable too
        _, got_m = ix.search(main[:1], 1)
        assert got_m[0][0] == 0


class TestANNIncrementalAdd:
    """DenseRetriever.add parity for the ANN tiers: append without
    retraining; persistence stays coherent (a grown HNSW index never
    masquerades as a fresh build; a grown IVF-PQ index with the refine
    buffer gets a real full-corpus fingerprint)."""

    def _data(self, rng, n, d=16):
        c = rng.standard_normal((n, d)).astype(np.float32)
        return c / np.linalg.norm(c, axis=1, keepdims=True)

    @pytest.mark.parametrize("kind", ["hnsw", "ivfpq"])
    def test_add_then_retrieve(self, tmp_path, kind):
        from latentrag_tpu.retrieval.ann_retriever import ANNRetriever
        from latentrag_tpu.utils.config import RetrievalConfig

        rng = np.random.default_rng(3)
        base, extra = self._data(rng, 300), self._data(rng, 40)
        cfg = RetrievalConfig(backend=kind, hnsw_m=8, ivfpq_nlist=8,
                              ivfpq_m=8, ivfpq_nprobe=8,
                              index_path=str(tmp_path / "ix"))
        r = ANNRetriever(cfg, kind)
        r.build(base, [f"b{i}" for i in range(300)])
        r.add(extra, [f"x{i}" for i in range(40)])
        assert len(r.texts) == 340
        out = r.retrieve(extra[7], 1)
        assert out[0][0] == "x7"
        out = r.retrieve(base[11], 1)
        assert out[0][0] == "b11"

    def test_grown_hnsw_never_reloads_as_fresh(self, tmp_path):
        from latentrag_tpu.retrieval.ann_retriever import ANNRetriever
        from latentrag_tpu.utils.config import RetrievalConfig

        rng = np.random.default_rng(4)
        base, extra = self._data(rng, 200), self._data(rng, 20)
        cfg = RetrievalConfig(backend="hnsw", hnsw_m=8,
                              index_path=str(tmp_path / "ix"))
        r = ANNRetriever(cfg, "hnsw")
        r.build(base, [f"b{i}" for i in range(200)])
        r.add(extra, [f"x{i}" for i in range(20)])
        # a later factory build over the ORIGINAL corpus must rebuild,
        # not serve the grown index
        r2 = ANNRetriever(cfg, "hnsw")
        r2.build(base, [f"b{i}" for i in range(200)])
        assert len(r2.texts) == 200
        out = r2.retrieve(base[5], 1)
        assert out[0][0] == "b5"

    def test_grown_ivfpq_rebuilds_with_full_corpus_training(self, tmp_path):
        """A grown IVF-PQ index keeps centroids/codebooks trained on the
        BASE corpus only, so it must never masquerade as a fresh build
        over the full corpus — the next factory build retrains."""
        from latentrag_tpu.retrieval import ann_retriever as ar
        from latentrag_tpu.utils.config import RetrievalConfig

        rng = np.random.default_rng(5)
        base, extra = self._data(rng, 300), self._data(rng, 30)
        cfg = RetrievalConfig(backend="ivfpq", ivfpq_nlist=8, ivfpq_m=8,
                              ivfpq_nprobe=8, ivfpq_refine=4,
                              index_path=str(tmp_path / "ix"))
        r = ar.ANNRetriever(cfg, "ivfpq")
        r.build(base, [f"b{i}" for i in range(300)])
        r.add(extra, [f"x{i}" for i in range(30)])
        full = np.concatenate([base, extra])
        texts = [f"b{i}" for i in range(300)] + [f"x{i}" for i in range(30)]
        r2 = ar.ANNRetriever(cfg, "ivfpq")
        r2.build(full, texts)  # rebuild (sidecar marked incremental)
        out = r2.retrieve(extra[7], 1)
        assert out[0][0] == "x7"
        # and the grown index file remains manually loadable
        from latentrag_tpu.retrieval.ann import IVFPQIndex
        assert len(IVFPQIndex.load(str(tmp_path / "ix.ivfpq"))) == 330

    def test_add_before_build_raises(self):
        from latentrag_tpu.retrieval.ann_retriever import ANNRetriever
        from latentrag_tpu.utils.config import RetrievalConfig

        r = ANNRetriever(RetrievalConfig(backend="hnsw", index_path=""),
                         "hnsw")
        with pytest.raises(RuntimeError, match="before build"):
            r.add(np.zeros((2, 8), np.float32), ["a", "b"])


    def test_large_island_keeps_level0_escape(self):
        """Island larger than M0: the diversity shrink would prune every
        escape link on both sides; the forced anchor pair must survive so
        main-side beams can still enter the island (and leave it)."""
        from latentrag_tpu.retrieval.ann import HNSWIndex

        rng = np.random.default_rng(9)
        d, n_main, n_isl = 8, 300, 40  # M=8 -> M0=16 < island size
        main = rng.standard_normal((n_main, d)).astype(np.float32)
        main /= np.linalg.norm(main, axis=1, keepdims=True)
        pole = np.zeros(d, np.float32)
        pole[-1] = 1.0
        isl = pole + 0.01 * rng.standard_normal((n_isl, d)).astype(np.float32)
        isl /= np.linalg.norm(isl, axis=1, keepdims=True)
        c = np.concatenate([main, isl])
        sims_m = main @ main.T
        np.fill_diagonal(sims_m, -np.inf)
        knn_main = np.argsort(-sims_m, axis=1)[:, :16].astype(np.int32)
        sims_i = isl @ isl.T
        np.fill_diagonal(sims_i, -np.inf)
        knn_isl = (np.argsort(-sims_i, axis=1)[:, :16] + n_main).astype(
            np.int32)
        ix = HNSWIndex.from_knn(c, np.concatenate([knn_main, knn_isl]),
                                M=8, ef_construction=50, ef_search=64,
                                seed=9)
        _, got = ix.search(pole[None, :], 10)
        isl_ids = set(range(n_main, n_main + n_isl))
        assert len(set(got[0]) & isl_ids) == 10, got[0]
        _, got_m = ix.search(main[:1], 1)
        assert got_m[0][0] == 0
