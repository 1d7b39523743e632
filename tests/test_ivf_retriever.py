"""DenseRetriever device-IVF routing: eligibility, oracle equality at
full probe, mutation invalidation, filters, int8 stores."""

import numpy as np
import pytest

from latentrag_tpu.retrieval import DenseRetriever

N, D, K = 10_000, 32, 10


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
def queries():
    return _clustered(16, D, seed=5)


def _build(corpus, **kw):
    kw.setdefault("backend", "xla")
    kw.setdefault("store_dtype", "float32")
    kw.setdefault("ivf_nlist", 32)
    kw.setdefault("ivf_cap", 128)
    r = DenseRetriever(**kw)
    r.build(corpus, [f"t{i}" for i in range(len(corpus))])
    return r


def test_small_batch_routes_through_ivf_and_matches_oracle(corpus, queries):
    # nprobe huge -> clamped to all blocks: candidate set is the whole
    # corpus, so only the wide-select approx_max_k (rt=0.95, the same
    # contract as the production exhaustive path) separates this from
    # the oracle — overlap must be near-total and top-1 exact
    r = _build(corpus, ivf_nprobe=10**6)
    oracle = DenseRetriever(backend="xla_exact", store_dtype="float32")
    oracle.build(corpus, [f"t{i}" for i in range(N)])
    s, i = r.search(queries, K)
    assert r._ivf_index is not None  # the IVF actually served this search
    s_ref, i_ref = oracle.search(queries, K)
    assert (i[:, 0] == i_ref[:, 0]).all()  # k=1-class selection is exact
    np.testing.assert_allclose(s[:, 0], s_ref[:, 0], atol=2e-5)
    overlap = np.mean(
        [len(set(a) & set(b)) / K for a, b in zip(i, i_ref)]
    )
    assert overlap >= 0.9, overlap


def test_large_batch_stays_exhaustive(corpus):
    r = _build(corpus, ivf_query_limit=8)
    big = _clustered(32, D, seed=9)
    r.search(big, K)
    assert r._ivf_index is None  # above the limit: never built


def test_small_corpus_never_builds_ivf():
    x = _clustered(500, D, seed=2)
    r = _build(x)
    r.search(x[:4], 5)
    assert r._ivf_index is None  # below IVF_MIN_ROWS


def test_add_appends_to_the_ivf_and_remove_invalidates(corpus, queries):
    r = _build(corpus, ivf_nprobe=10**6)
    r.search(queries, K)
    assert r._ivf_index is not None
    nblocks0 = r._ivf_index.nblocks
    extra = _clustered(8, D, seed=11)
    r.add(extra, [f"new{i}" for i in range(8)],
          doc_ids=[f"n{i}" for i in range(8)])
    # small add: incremental append (no k-means rebuild), new rows land
    # in appended blocks and are immediately findable
    assert r._ivf_index is not None
    assert r._ivf_index.nblocks > nblocks0
    assert r._ivf_appended == 8
    texts, _, ids = r.retrieve(extra[3], top_k=1)
    assert ids[0] == "n3"
    r.remove(["n3"])  # reindexes rows: the layout MUST be invalidated
    assert r._ivf_index is None


def test_large_add_invalidates_instead_of_appending(corpus):
    r = _build(corpus, ivf_nprobe=10**6)
    r.search(corpus[:4], K)
    assert r._ivf_index is not None
    extra = _clustered(4000, D, seed=12)  # > n/4: append budget refused
    r.add(extra, [f"big{i}" for i in range(4000)])
    assert r._ivf_index is None
    # next eligible search rebuilds fresh and still finds the new rows
    _, _, ids = r.retrieve(extra[7], top_k=1)
    assert r._ivf_index is not None and r._ivf_appended == 0
    assert ids[0] == N + 7


def test_partial_probe_recall_via_retriever(corpus, queries):
    r = _build(corpus, ivf_nprobe=24)  # ~13% of blocks on this corpus
    oracle = DenseRetriever(backend="xla_exact", store_dtype="float32")
    oracle.build(corpus, [f"t{i}" for i in range(N)])
    _, i = r.search(queries, K)
    assert r._ivf_index is not None
    _, i_ref = oracle.search(queries, K)
    hits = sum(len(set(a) & set(b)) for a, b in zip(i, i_ref))
    assert hits / i_ref.size >= 0.75  # hard synthetic; see test_ivf_ops


def test_per_request_nprobe_pins_the_route_and_budget(corpus, queries):
    # auto policy refuses this corpus (traffic guard) — an explicit
    # per-request nprobe is a user choice and routes anyway
    r = _build(corpus, ivf_nprobe=0)
    r.search(queries, K)
    assert r._ivf_index is None  # auto guard refused
    s, i = r.search(queries, K, nprobe=10**6)  # full probe, pinned
    assert r._ivf_index is not None
    oracle = DenseRetriever(backend="xla_exact", store_dtype="float32")
    oracle.build(corpus, [f"t{i}" for i in range(N)])
    _, i_ref = oracle.search(queries, K)
    overlap = np.mean([len(set(a) & set(b)) / K for a, b in zip(i, i_ref)])
    assert overlap >= 0.9
    # a tiny pinned budget under-fills and sentinels the tail
    s2, i2 = r.search(queries, 3 * r.ivf_cap, nprobe=1)
    assert ((i2 >= 0).sum(axis=1) <= r.ivf_cap).all()


def test_auto_nprobe_traffic_guard_keeps_toy_corpora_exhaustive(corpus):
    # auto policy at 10k rows: estimated gather traffic for even a small
    # batch exceeds half the exhaustive sweep -> stays exhaustive
    r = _build(corpus, ivf_nprobe=0)
    r.search(corpus[:16], K)
    assert r._ivf_index is None


def test_filtered_ivf_search_respects_the_subset(corpus, queries):
    r = _build(corpus, ivf_nprobe=10**6)
    allowed = [f"t{i}" for i in range(0, N, 7)]
    spec = {"doc_ids": [i for i in range(0, N, 7)]}
    s, i = r.search(queries, K, filter=spec)
    live = i >= 0
    assert live.any()
    assert np.all(i[live] % 7 == 0)
    # near-equality vs the exhaustive filtered path at full probe (both
    # paths select with approx_max_k at these widths)
    r2 = _build(corpus, ivf_nlist=0)
    _, i2 = r2.search(queries, K, filter=spec)
    overlap = np.mean([
        len({v for v in a if v >= 0} & {v for v in b if v >= 0})
        / max(1, (np.asarray(b) >= 0).sum())
        for a, b in zip(i, i2)
    ])
    assert overlap >= 0.8, overlap


def test_int8_store_full_probe_matches_exhaustive_sq8(corpus, queries):
    r = _build(corpus, store_dtype="int8", ivf_nprobe=10**6)
    r_ex = DenseRetriever(backend="xla", store_dtype="int8")
    r_ex.build(corpus, [f"t{i}" for i in range(N)])
    s, i = r.search(queries, K)
    s_ref, i_ref = r_ex.search(queries, K)
    # same int8 arithmetic; exhaustive uses approx_max_k rt=0.99 so
    # compare top-1 and score values
    assert (i[:, 0] == i_ref[:, 0]).mean() >= 0.9
    np.testing.assert_allclose(s[:, 0], s_ref[:, 0], atol=1e-4)


def test_factory_plumbs_ivf_config(corpus):
    from latentrag_tpu.retrieval import build_retriever
    from latentrag_tpu.utils.config import RetrievalConfig

    cfg = RetrievalConfig(
        backend="dense", kernel="xla", store_dtype="float32",
        index_path="", ivf_nlist=16, ivf_cap=64, ivf_nprobe=3,
        ivf_query_limit=9,
    )
    r = build_retriever(
        corpus[:9000], [f"t{i}" for i in range(9000)], None, cfg
    )
    assert (r.ivf_nlist, r.ivf_cap, r.ivf_nprobe, r.ivf_query_limit) == (
        16, 64, 3, 9
    )
    r.search(corpus[:4], 5)
    assert r._ivf_index is not None


def test_selfcheck_estimates_recall_on_build(corpus, queries, caplog):
    # tight synthetic clusters + a generous pinned probe: the build-time
    # probe must run, land high, and log at INFO (no weak-corpus warning)
    import logging

    with caplog.at_level(logging.INFO, logger="latentrag.retrieval"):
        r = _build(corpus, ivf_nprobe=10**6)
        r.search(queries, K)
    assert r._ivf_index is not None
    est = r._ivf_recall_estimate
    assert est is not None and 0.9 <= est <= 1.0, est
    assert any("IVF candidate recall" in m for m in caplog.messages)


def test_selfcheck_disabled_leaves_estimate_unset(corpus, queries):
    r = _build(corpus, ivf_nprobe=10**6, ivf_selfcheck=0)
    r.search(queries, K)
    assert r._ivf_index is not None
    assert r._ivf_recall_estimate is None


def test_selfcheck_warns_on_weakly_clustered_corpus(queries, caplog):
    # uniform rows = no cluster structure: a 1-block probe budget cannot
    # find the true neighbors and the probe must say so loudly
    import logging

    rng = np.random.default_rng(3)
    x = rng.normal(size=(N, D)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    with caplog.at_level(logging.WARNING, logger="latentrag.retrieval"):
        r = _build(x, ivf_nprobe=1)
        r.search(queries, K)
    est = r._ivf_recall_estimate
    assert est is not None and est < 0.8, est
    assert any("weakly clustered" in m for m in caplog.messages)


def test_selfcheck_runs_on_quantized_stores(corpus, queries):
    # int8 store: probe queries are dequantized codes; stage-1 vs
    # stage-1 definition still applies
    r = _build(corpus, ivf_nprobe=10**6, store_dtype="int8",
               backend="xla")
    r.search(queries, K)
    assert r._ivf_index is not None
    est = r._ivf_recall_estimate
    assert est is not None and est >= 0.9, est


def test_selfcheck_invalidated_with_the_index(corpus, queries):
    r = _build(corpus, ivf_nprobe=10**6)
    r.search(queries, K)
    assert r._ivf_recall_estimate is not None
    r.remove([0])
    assert r._ivf_index is None and r._ivf_recall_estimate is None


def test_ivf_persists_and_restores_without_kmeans(tmp_path, corpus, queries, caplog):
    import logging
    import os

    path = str(tmp_path / "idx")
    r = _build(corpus, ivf_nprobe=10**6, index_path=path)
    # build()'s save eagerly built + persisted the warm-boot sidecar
    assert r._ivf_index is not None
    assert os.path.exists(os.path.join(path, "ivf_assign.npy"))
    assert os.path.exists(os.path.join(path, "ivf_centroids.npy"))
    s_ref, i_ref = r.search(queries, K)
    with caplog.at_level(logging.INFO, logger="latentrag.retrieval"):
        r2 = DenseRetriever(
            backend="xla", store_dtype="float32", ivf_nlist=32,
            ivf_cap=128, ivf_nprobe=10**6, index_path=path,
        )
        assert r2._ivf_sidecar is not None  # warm boot picked it up
        s2, i2 = r2.search(queries, K)
    assert any("restored from sidecar" in m for m in caplog.messages)
    # same assignments + deterministic layout gather -> identical serving
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(i_ref))
    np.testing.assert_allclose(
        np.asarray(s2), np.asarray(s_ref), atol=2e-5
    )


def test_ivf_sidecar_refused_on_config_change(tmp_path, corpus, queries, caplog):
    import logging

    path = str(tmp_path / "idx")
    _build(corpus, ivf_nprobe=10**6, index_path=path)
    with caplog.at_level(logging.INFO, logger="latentrag.retrieval"):
        r2 = DenseRetriever(
            backend="xla", store_dtype="float32", ivf_nlist=16,  # changed
            ivf_cap=128, ivf_nprobe=10**6, index_path=path,
        )
        assert r2._ivf_sidecar is None  # nlist mismatch: re-cluster
        r2.search(queries, K)
    assert any(
        "device IVF built" in m for m in caplog.messages
    ), caplog.messages


def test_ivf_sidecar_dropped_by_mutation_save(tmp_path, corpus, queries):
    import os

    path = str(tmp_path / "idx")
    r = _build(corpus, ivf_nprobe=10**6, index_path=path)
    assert os.path.exists(os.path.join(path, "ivf_assign.npy"))
    r.remove([0])  # reindexes rows; the mutation save must drop the
    # stale sidecar rather than let a later boot restore wrong rows
    assert not os.path.exists(os.path.join(path, "ivf_assign.npy"))
    assert not os.path.exists(os.path.join(path, "ivf_centroids.npy"))


def test_add_after_warm_boot_keeps_the_sidecar(tmp_path, corpus, queries):
    """Warm boot -> add() before any search must NOT drop the persisted
    IVF assignments (ADVICE r4): the appended rows' positions are new,
    prior rows keep theirs, so the store restores the layout from the
    sidecar, appends to it, and the mutation save re-persists the grown
    assignments — the next boot still skips k-means."""
    import os

    path = str(tmp_path / "idx")
    _build(corpus, ivf_nprobe=10**6, index_path=path)
    r2 = DenseRetriever(
        backend="xla", store_dtype="float32", ivf_nlist=32,
        ivf_cap=128, ivf_nprobe=10**6, index_path=path,
    )
    assert r2._ivf_sidecar is not None and r2._ivf_index is None
    extra = _clustered(8, D, seed=21)
    r2.add(extra, [f"new{i}" for i in range(8)],
           doc_ids=[f"n{i}" for i in range(8)])
    # the add restored the layout from the sidecar (no k-means) and
    # appended — instead of leaving _ivf_index None and deleting the
    # sidecar files at save time
    assert r2._ivf_index is not None and r2._ivf_appended == 8
    assert os.path.exists(os.path.join(path, "ivf_assign.npy"))
    assert np.load(
        os.path.join(path, "ivf_assign.npy")
    ).shape[0] == N + 8
    _, _, ids = r2.retrieve(extra[3], top_k=1)
    assert ids[0] == "n3"
    # and a THIRD boot warm-restores the grown index
    r3 = DenseRetriever(
        backend="xla", store_dtype="float32", ivf_nlist=32,
        ivf_cap=128, ivf_nprobe=10**6, index_path=path,
    )
    assert r3._ivf_sidecar is not None
    _, _, ids3 = r3.retrieve(extra[3], top_k=1)
    assert ids3[0] == "n3"


def test_eager_ivf_skipped_for_ineligible_backend(tmp_path, corpus):
    """backend='exact' never routes searches through the IVF
    (_ivf_eligible requires 'xla' for fp stores), so the build()-save
    must not pay k-means + the probe compiles for a tier no search can
    use (ADVICE r4)."""
    import os

    path = str(tmp_path / "idx")
    r = _build(corpus, backend="xla_exact", index_path=path)
    assert r._ivf_index is None
    assert not os.path.exists(os.path.join(path, "ivf_assign.npy"))
    assert not os.path.exists(os.path.join(path, "ivf_centroids.npy"))


def test_ivf_estimate_persists_and_skips_warm_probe(tmp_path, corpus, queries, caplog):
    import json
    import logging
    import os

    path = str(tmp_path / "idx")
    r = _build(corpus, ivf_nprobe=10**6, index_path=path)
    est = r._ivf_recall_estimate
    assert est is not None
    meta = json.load(open(os.path.join(path, "meta.json")))
    assert meta["ivf_recall_estimate"] == pytest.approx(est)
    # drop records from r's build-time probe: depending on suite order a
    # prior test may have configured logging so caplog captured them
    caplog.clear()
    with caplog.at_level(logging.INFO, logger="latentrag.retrieval"):
        r2 = DenseRetriever(
            backend="xla", store_dtype="float32", ivf_nlist=32,
            ivf_cap=128, ivf_nprobe=10**6, index_path=path,
        )
        r2.search(queries, K)
    # the digest-verified corpus reuses the measured estimate: no
    # fresh probe log line on the warm boot
    assert r2._ivf_recall_estimate == pytest.approx(est)
    assert not any("candidate recall" in m for m in caplog.messages)


def test_ivf_persistence_roundtrip_binary_store(tmp_path, corpus, queries, caplog):
    import logging
    import os

    path = str(tmp_path / "idx")
    r = _build(
        corpus, ivf_nprobe=10**6, index_path=path,
        store_dtype="binary", backend="xla",
    )
    assert os.path.exists(os.path.join(path, "ivf_assign.npy"))
    _, i_ref = r.search(queries, K)
    with caplog.at_level(logging.INFO, logger="latentrag.retrieval"):
        r2 = DenseRetriever(
            backend="xla", store_dtype="binary", ivf_nlist=32,
            ivf_cap=128, ivf_nprobe=10**6, index_path=path,
        )
        assert r2._ivf_sidecar is not None
        _, i2 = r2.search(queries, K)
    assert any("restored from sidecar" in m for m in caplog.messages)
    # packed bits persist verbatim + same assignments -> same cascade
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(i_ref))
