"""Filtered (predicate) search across every dense tier.

The reference has no filtering story at all (its FAISS wrapper searches the
whole index unconditionally); this suite pins the TPU-native design: specs
compile to row masks (``retrieval/filtering.py``), masks ride INSIDE the
fused top-k kernels (scores to -inf before the reduction), and every tier —
exact, approx/bf16, int8, binary cascade, and all their mesh-sharded
variants — returns exactly "search over the allowed subset".
"""

import numpy as np
import pytest

from latentrag_tpu.retrieval.dense import DenseRetriever
from latentrag_tpu.retrieval.filtering import (
    FilterCache,
    canonical_filter_key,
    compile_filter_mask,
    pack_mask,
)


def _normed(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _oracle(corpus, queries, mask, k):
    """Exact filtered cosine top-k on host."""
    scores = queries @ corpus.T
    scores[:, ~mask] = -np.inf
    order = np.argsort(-scores, axis=1)[:, :k]
    s = np.take_along_axis(scores, order, axis=1)
    i = np.where(np.isfinite(s), order, -1)
    return s, i


# ------------------------------------------------------------ spec compile


def test_filter_spec_validation():
    with pytest.raises(ValueError):
        canonical_filter_key({})
    with pytest.raises(ValueError):
        canonical_filter_key({"bogus": 1})
    with pytest.raises(ValueError):
        canonical_filter_key({"doc_ids": 3})
    with pytest.raises(ValueError):
        canonical_filter_key({"where": [1, 2]})
    # key is order-independent
    assert canonical_filter_key(
        {"doc_ids": [1], "where": {"a": 1}}
    ) == canonical_filter_key({"where": {"a": 1}, "doc_ids": [1]})


def test_compile_filter_mask_ids_and_where():
    doc_ids = ["a", "b", "c", "d"]
    md = [{"lang": "en"}, {"lang": "fr"}, {"lang": "en", "y": 2},
          {"y": 2}]
    m = compile_filter_mask({"doc_ids": ["a", "c"]}, doc_ids, md, 4)
    assert m.tolist() == [True, False, True, False]
    m = compile_filter_mask({"exclude_doc_ids": ["a"]}, doc_ids, md, 4)
    assert m.tolist() == [False, True, True, True]
    m = compile_filter_mask({"where": {"lang": "en"}}, doc_ids, md, 4)
    assert m.tolist() == [True, False, True, False]
    m = compile_filter_mask(
        {"where": {"lang": ["en", "fr"]}}, doc_ids, md, 4
    )
    assert m.tolist() == [True, True, True, False]
    # AND across keys
    m = compile_filter_mask(
        {"where": {"lang": "en"}, "exclude_doc_ids": ["a"]}, doc_ids, md, 4
    )
    assert m.tolist() == [False, False, True, False]
    # where without metadata refuses
    with pytest.raises(ValueError, match="metadata"):
        compile_filter_mask({"where": {"lang": "en"}}, doc_ids, None, 4)
    # matching nothing is legal (empty result, not an error)
    m = compile_filter_mask({"doc_ids": ["zz"]}, doc_ids, md, 4)
    assert not m.any()


def test_pack_mask_roundtrip_matches_device_unpack():
    import jax.numpy as jnp

    from latentrag_tpu.ops.topk import unpack_row_mask

    rng = np.random.default_rng(3)
    for n in (1, 7, 8, 9, 64, 317):
        mask = rng.random(n) < 0.4
        packed = pack_mask(mask)
        got = np.asarray(unpack_row_mask(jnp.asarray(packed), n))
        np.testing.assert_array_equal(got, mask)


def test_filter_cache_lru():
    c = FilterCache(capacity=2)
    c.put("a", 1)
    c.put("b", 2)
    assert c.get("a") == 1  # refresh a
    c.put("c", 3)  # evicts b
    assert c.get("b") is None
    assert c.get("a") == 1 and c.get("c") == 3
    c.clear()
    assert c.get("a") is None


# ------------------------------------------------------- dense tiers (1dev)


@pytest.mark.parametrize("backend,store", [
    ("xla_exact", "float32"),
    ("xla", "bfloat16"),
])
def test_filtered_search_matches_oracle(rng, backend, store):
    corpus = _normed(rng, 200, 16)
    queries = _normed(rng, 7, 16)
    texts = [f"t{i}" for i in range(200)]
    mask_host = rng.random(200) < 0.5
    allowed = [i for i in range(200) if mask_host[i]]

    r = DenseRetriever(backend=backend, store_dtype=store)
    r.build(corpus, texts)
    s, i = r.search(queries, 5, filter={"doc_ids": allowed})

    ref = corpus.astype(np.float32)
    if store == "bfloat16":
        import jax.numpy as jnp

        ref = np.asarray(corpus.astype(jnp.bfloat16).astype(np.float32))
    s0, i0 = _oracle(ref, queries, mask_host, 5)
    np.testing.assert_array_equal(i, i0)
    np.testing.assert_allclose(s, s0, rtol=2e-2, atol=2e-2)
    # every hit obeys the filter
    assert all(j in set(allowed) for j in i.ravel() if j >= 0)


def test_filtered_search_blocked_scan_paths(rng):
    """Force the multi-block scan merge (block_size < n) in both exact and
    approx kernels; the mask must slice per block correctly."""
    corpus = _normed(rng, 530, 8)
    queries = _normed(rng, 3, 8)
    mask_host = rng.random(530) < 0.3
    allowed = [i for i in range(530) if mask_host[i]]
    for backend in ("xla_exact", "xla"):
        r = DenseRetriever(backend=backend, store_dtype="float32",
                           block_size=64)
        r.build(corpus, [f"t{i}" for i in range(530)])
        s, i = r.search(queries, 4, filter={"doc_ids": allowed})
        s0, i0 = _oracle(corpus, queries, mask_host, 4)
        np.testing.assert_array_equal(i, i0)
        np.testing.assert_allclose(s, s0, rtol=1e-4, atol=1e-5)


def test_filtered_search_euclidean_metric(rng):
    corpus = rng.standard_normal((150, 12)).astype(np.float32)
    queries = rng.standard_normal((4, 12)).astype(np.float32)
    mask_host = rng.random(150) < 0.4
    allowed = [i for i in range(150) if mask_host[i]]
    r = DenseRetriever(backend="xla_exact", store_dtype="float32",
                       metric="euclidean")
    r.build(corpus, [f"t{i}" for i in range(150)])
    _, i = r.search(queries, 3, filter={"doc_ids": allowed})
    d = ((queries[:, None, :] - corpus[None, :, :]) ** 2).sum(-1)
    d[:, ~mask_host] = np.inf
    i0 = np.argsort(d, axis=1)[:, :3]
    np.testing.assert_array_equal(i, i0)


def test_filtered_search_int8_and_binary_tiers(rng):
    g = rng.standard_normal((400, 12)).astype(np.float32)
    proj = rng.standard_normal((12, 32)).astype(np.float32)
    corpus = g @ proj
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = corpus[:6]
    texts = [f"t{i}" for i in range(400)]
    mask_host = rng.random(400) < 0.5
    mask_host[:6] = True  # the query rows stay eligible
    allowed = {i for i in range(400) if mask_host[i]}

    for store in ("int8", "binary"):
        r = DenseRetriever(backend="xla", store_dtype=store)
        r.build(corpus, texts)
        s, i = r.search(queries, 5, filter={"doc_ids": sorted(allowed)})
        # quantized scores: assert subset discipline + self-retrieval
        assert all(j in allowed for j in i.ravel() if j >= 0), store
        assert [int(row[0]) for row in i] == list(range(6)), store


def test_filter_allowing_fewer_than_k_pads_with_sentinels(rng):
    corpus = _normed(rng, 50, 8)
    r = DenseRetriever(backend="xla_exact", store_dtype="float32")
    r.build(corpus, [f"t{i}" for i in range(50)])
    s, i = r.search(corpus[:2], 10, filter={"doc_ids": [3, 7]})
    assert set(i[0][:2].tolist()) == {3, 7}
    assert (i[:, 2:] == -1).all()
    # a filter matching NOTHING is legal: all sentinels
    s, i = r.search(corpus[:2], 4, filter={"doc_ids": ["nope"]})
    assert (i == -1).all()


def test_filtered_retrieve_drops_sentinels(rng):
    corpus = _normed(rng, 30, 8)
    r = DenseRetriever(backend="xla_exact", store_dtype="float32")
    r.build(corpus, [f"t{i}" for i in range(30)])
    texts, scores, ids = r.retrieve(corpus[0], 5, filter={"doc_ids": [2, 9]})
    assert set(ids) == {2, 9} and len(texts) == 2 == len(scores)


def test_where_filter_end_to_end_and_add_invalidates_cache(rng):
    corpus = _normed(rng, 40, 8)
    md = [{"lang": "en" if i % 2 == 0 else "fr", "rank": i}
          for i in range(40)]
    r = DenseRetriever(backend="xla_exact", store_dtype="float32")
    r.build(corpus, [f"t{i}" for i in range(40)], metadata=md)
    _, i = r.search(corpus[:3], 5, filter={"where": {"lang": "fr"}})
    assert all(j % 2 == 1 for j in i.ravel() if j >= 0)

    # grow the index with an en doc that IS the query vector; the cached
    # "lang=en" mask must be recompiled to include it
    q = _normed(rng, 1, 8)
    r.search(q, 1, filter={"where": {"lang": "en"}})  # prime the cache
    r.add(q, ["new"], metadata=[{"lang": "en"}])
    _, i_en2 = r.search(q, 1, filter={"where": {"lang": "en"}})
    assert int(i_en2[0, 0]) == 40  # the new row (exact match) wins now
    # rows added WITHOUT metadata filter as {} (match nothing in where)
    q2 = _normed(rng, 1, 8)
    r.add(q2, ["anon"])
    _, i_en3 = r.search(q2, 2, filter={"where": {"lang": "en"}})
    assert 41 not in set(i_en3.ravel().tolist())


def test_remove_keeps_metadata_aligned(rng):
    corpus = _normed(rng, 20, 8)
    md = [{"tag": i} for i in range(20)]
    r = DenseRetriever(backend="xla_exact", store_dtype="float32")
    r.build(corpus, [f"t{i}" for i in range(20)], metadata=md)
    r.remove([0, 5])
    assert len(r.metadata) == 18
    # row for tag=6 moved up; where-filter must still find exactly it
    _, i = r.search(corpus[6:7], 1, filter={"where": {"tag": 6}})
    assert r.metadata[int(i[0, 0])]["tag"] == 6


# ------------------------------------------------------------- mesh-sharded


def test_filtered_sharded_matches_single_device(rng, eight_devices):
    from latentrag_tpu.parallel import make_mesh

    corpus = _normed(rng, 333, 16)  # odd count: pad rows exist
    queries = _normed(rng, 5, 16)
    texts = [f"t{i}" for i in range(333)]
    mask_host = rng.random(333) < 0.4
    allowed = [i for i in range(333) if mask_host[i]]

    r0 = DenseRetriever(backend="xla_exact", store_dtype="float32")
    r0.build(corpus, texts)
    s0, i0 = r0.search(queries, 5, filter={"doc_ids": allowed})

    r1 = DenseRetriever(backend="xla_exact", store_dtype="float32",
                        mesh=make_mesh(8))
    r1.build(corpus, texts)
    s1, i1 = r1.search(queries, 5, filter={"doc_ids": allowed})
    np.testing.assert_allclose(s0, s1, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(i0, i1)
    # unfiltered search on the SAME retriever still works (separate
    # compiled program in the sharded cache)
    s2, i2 = r1.search(queries, 5)
    assert set(i2[0].tolist()) != set(i1[0].tolist()) or True
    assert (i2 >= 0).all()


@pytest.mark.parametrize("store", ["int8", "binary"])
def test_filtered_sharded_quantized_tiers(rng, eight_devices, store):
    from latentrag_tpu.parallel import make_mesh

    g = rng.standard_normal((501, 12)).astype(np.float32)
    proj = rng.standard_normal((12, 32)).astype(np.float32)
    corpus = g @ proj
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = corpus[:4]
    texts = [f"t{i}" for i in range(501)]
    mask_host = rng.random(501) < 0.5
    mask_host[:4] = True
    allowed = sorted(i for i in range(501) if mask_host[i])

    r0 = DenseRetriever(backend="xla", store_dtype=store)
    r0.build(corpus, texts)
    s0, i0 = r0.search(queries, 5, filter={"doc_ids": allowed})

    r1 = DenseRetriever(backend="xla", store_dtype=store,
                        mesh=make_mesh(8))
    r1.build(corpus, texts)
    s1, i1 = r1.search(queries, 5, filter={"doc_ids": allowed})
    assert all(j in set(allowed) for j in i1.ravel() if j >= 0)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(s0, s1, rtol=1e-3, atol=1e-3)


# ------------------------------------------------------------- persistence


def test_metadata_persists_and_filters_after_warm_load(rng, tmp_path):
    corpus = _normed(rng, 24, 8)
    md = [{"lang": "en" if i < 12 else "fr"} for i in range(24)]
    path = str(tmp_path / "idx")
    r = DenseRetriever(backend="xla_exact", store_dtype="float32",
                       index_path=path)
    r.build(corpus, [f"t{i}" for i in range(24)], metadata=md)

    r2 = DenseRetriever(backend="xla_exact", store_dtype="float32",
                        index_path=path)
    assert r2.is_built and r2.metadata is not None
    _, i = r2.search(corpus[:2], 3, filter={"where": {"lang": "fr"}})
    assert all(j >= 12 for j in i.ravel() if j >= 0)


def test_tampered_metadata_sidecar_refused(rng, tmp_path):
    corpus = _normed(rng, 10, 8)
    path = str(tmp_path / "idx")
    r = DenseRetriever(backend="xla_exact", store_dtype="float32",
                       index_path=path)
    r.build(corpus, [f"t{i}" for i in range(10)],
            metadata=[{"x": i} for i in range(10)])
    # simulate a crash-mixed generation: metadata bytes change, digest not
    with open(f"{path}/metadata.jsonl", "a") as f:
        f.write('\n{"x": 999}')
    r2 = DenseRetriever(backend="xla_exact", store_dtype="float32",
                        index_path=path)
    assert not r2.is_built  # refused -> clean start


# --------------------------------------------------------- native ANN tiers


def _ann(rng, n=300, d=32):
    g = rng.standard_normal((n, 16)).astype(np.float32)
    proj = rng.standard_normal((16, d)).astype(np.float32)
    corpus = g @ proj
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    return corpus


def test_hnsw_filtered_search_subset_and_recall(rng):
    from latentrag_tpu.retrieval.ann_retriever import ANNRetriever
    from latentrag_tpu.utils.config import RetrievalConfig

    corpus = _ann(rng, 300)
    texts = [f"t{i}" for i in range(300)]
    mask = rng.random(300) < 0.3
    mask[:5] = True
    allowed = sorted(i for i in range(300) if mask[i])

    r = ANNRetriever(
        RetrievalConfig(index_path="", backend="hnsw", hnsw_build="beam"),
        "hnsw",
    )
    r.build(corpus, texts)
    s, i = r.search(corpus[:5], 5, filter={"doc_ids": allowed})
    assert all(j in set(allowed) for j in i.ravel() if j >= 0)
    # self-retrieval: each allowed query row must find itself top-1
    assert [int(row[0]) for row in i] == list(range(5))
    # filtered recall vs the exact filtered oracle (beam inflates with
    # 1/selectivity, so recall should stay near the unfiltered level)
    s0, i0 = _oracle(corpus, corpus[:5], mask, 5)
    hits = sum(
        len(set(a.tolist()) & set(b[b >= 0].tolist()))
        for a, b in zip(i0, i)
    )
    assert hits >= 20  # >= 0.8 recall on 25 slots

    # unfiltered search still works on the same retriever
    _, i_un = r.search(corpus[:5], 5)
    assert (i_un >= 0).all()


def test_hnsw_filter_matching_nothing_returns_sentinels(rng):
    from latentrag_tpu.retrieval.ann_retriever import ANNRetriever
    from latentrag_tpu.utils.config import RetrievalConfig

    corpus = _ann(rng, 60)
    r = ANNRetriever(
        RetrievalConfig(index_path="", backend="hnsw", hnsw_build="beam"),
        "hnsw",
    )
    r.build(corpus, [f"t{i}" for i in range(60)])
    s, i = r.search(corpus[:2], 4, filter={"doc_ids": ["missing"]})
    assert (i == -1).all() and np.isinf(s).all()


@pytest.mark.parametrize("refine", [0, 4])
def test_ivfpq_filtered_search(rng, refine):
    from latentrag_tpu.retrieval.ann_retriever import ANNRetriever
    from latentrag_tpu.utils.config import RetrievalConfig

    corpus = _ann(rng, 240)
    texts = [f"t{i}" for i in range(240)]
    mask = rng.random(240) < 0.4
    mask[:4] = True
    allowed = sorted(i for i in range(240) if mask[i])

    r = ANNRetriever(
        RetrievalConfig(
            index_path="", backend="ivfpq", ivfpq_nlist=8, ivfpq_m=8,
            ivfpq_nprobe=8, ivfpq_refine=refine, ivfpq_build="host",
        ),
        "ivfpq",
    )
    r.build(corpus, texts)
    s, i = r.search(corpus[:4], 5, filter={"doc_ids": allowed})
    assert all(j in set(allowed) for j in i.ravel() if j >= 0)
    if refine:  # exact rescore: self-retrieval is guaranteed top-1
        assert [int(row[0]) for row in i] == list(range(4))


def test_ann_where_filter_and_warm_boot_metadata(rng, tmp_path):
    from latentrag_tpu.retrieval.ann_retriever import ANNRetriever
    from latentrag_tpu.utils.config import RetrievalConfig

    corpus = _ann(rng, 80)
    texts = [f"t{i}" for i in range(80)]
    md = [{"lang": "en" if i % 2 == 0 else "fr"} for i in range(80)]
    cfg = RetrievalConfig(
        index_path=str(tmp_path / "ix"), backend="hnsw", hnsw_build="beam"
    )
    r = ANNRetriever(cfg, "hnsw")
    r.build(corpus, texts, metadata=md)
    _, i = r.search(corpus[:3], 4, filter={"where": {"lang": "fr"}})
    assert all(j % 2 == 1 for j in i.ravel() if j >= 0)

    # warm boot from disk keeps metadata (digest-verified)
    r2 = ANNRetriever(cfg, "hnsw")
    assert r2.load_persisted()
    assert r2.metadata is not None and len(r2.metadata) == 80
    _, i2 = r2.search(corpus[:3], 4, filter={"where": {"lang": "fr"}})
    np.testing.assert_array_equal(i, i2)

    # tampered metadata sidecar refuses the warm boot
    with open(str(tmp_path / "ix.hnsw.metadata.jsonl"), "a") as f:
        f.write('\n{"lang": "xx"}')
    r3 = ANNRetriever(cfg, "hnsw")
    assert not r3.load_persisted()


def test_ann_add_keeps_metadata_aligned_and_drops_cache(rng):
    from latentrag_tpu.retrieval.ann_retriever import ANNRetriever
    from latentrag_tpu.utils.config import RetrievalConfig

    corpus = _ann(rng, 50)
    md = [{"g": "a"} for _ in range(50)]
    r = ANNRetriever(
        RetrievalConfig(index_path="", backend="hnsw", hnsw_build="beam"),
        "hnsw",
    )
    r.build(corpus, [f"t{i}" for i in range(50)], metadata=md)
    q = _ann(rng, 1)
    r.search(q, 2, filter={"where": {"g": "b"}})  # primes an empty mask
    r.add(q, ["new"], metadata=[{"g": "b"}])
    _, i = r.search(q, 2, filter={"where": {"g": "b"}})
    assert int(i[0, 0]) == 50  # the new row is found under the new mask


# ------------------------------------------------------------ serve protocol


def test_serve_filter_protocol(tmp_path, capsys):
    import io
    import json
    import sys
    from unittest.mock import patch

    import serve

    overrides = [
        "data.dataset=synthetic", "data.max_samples=30",
        "encoder.vocab_size=600", "encoder.dtype=float32",
        "encoder.hidden_dim=32", "encoder.num_layers=1",
        "encoder.num_heads=4", "encoder.mlp_dim=64",
        "retrieval.kernel=xla_exact",
        f"retrieval.index_path={tmp_path}/index",
        f"paths.data_dir={tmp_path}/data",
        f"paths.checkpoints_dir={tmp_path}/ckpt",
        f"paths.logs_dir={tmp_path}/logs",
        f"logging.log_file={tmp_path}/logs/run.log",
    ]
    marker = "zzqx unique quasar document"
    payload = (
        # two metadata-tagged docs, identical text -> score tie broken by
        # the filter alone
        json.dumps({"add": {"texts": [marker, marker],
                            "doc_ids": [901, 902],
                            "metadata": [{"lang": "en"}, {"lang": "fr"}]}})
        + "\n"
        + json.dumps({"query": marker, "k": 1,
                      "filter": {"where": {"lang": "fr"}}}) + "\n"
        + json.dumps({"query": marker, "k": 1,
                      "filter": {"doc_ids": [901]}}) + "\n"
        + json.dumps({"query": marker, "k": 1,
                      "filter": {"bogus": 1}}) + "\n"
    )
    with patch.object(sys, "stdin", io.StringIO(payload)):
        assert serve.main(
            ["--ae_type", "none", "--set"] + overrides
        ) == 0
    lines = [
        json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
        if line.strip()
    ]
    assert lines[0]["added"] == 2
    assert lines[1]["results"][0]["hits"][0]["doc_id"] == 902
    assert lines[2]["results"][0]["hits"][0]["doc_id"] == 901
    assert "error" in lines[3]  # malformed spec -> protocol error line


# ------------------------------------------------------------ bm25 and dpr


def test_bm25_filtered_search():
    from latentrag_tpu.retrieval.bm25 import BM25Retriever

    docs = [
        "alpha telescope observes stars",
        "beta telescope observes galaxies",
        "gamma microscope magnifies cells",
        "delta telescope observes planets",
    ]
    md = [{"kind": "tele"}, {"kind": "tele"}, {"kind": "micro"},
          {"kind": "tele"}]
    r = BM25Retriever()
    r.build_index(docs, metadata=md)
    s, i = r.search(["telescope observes"], 3,
                    filter={"exclude_doc_ids": [0]})
    assert 0 not in set(i.ravel().tolist())
    s, i = r.search(["telescope observes"], 3,
                    filter={"where": {"kind": "micro"}})
    # only doc 2 is eligible; it doesn't match the query terms -> score 0
    # but it is the ONLY candidate; remaining slots are sentinels
    assert i[0, 0] == 2 and (i[0, 1:] == -1).all()
    hits = r.retrieve("telescope observes", 3,
                      filter={"where": {"kind": "tele"}})
    assert all(t != docs[2] for t, _ in hits)


def test_dpr_filter_passthrough(rng):
    from latentrag_tpu.retrieval.dpr import DPRRetriever

    class FakeTower:
        name = "fake"

        def __init__(self, d=8):
            self.d = d

        def encode_batch(self, texts):
            out = np.zeros((len(texts), self.d), np.float32)
            for i, t in enumerate(texts):
                g = np.random.default_rng(
                    abs(hash(t)) % (1 << 32)
                ).standard_normal(self.d)
                out[i] = g / np.linalg.norm(g)  # unit: self-dot is maximal
            return out

    tower = FakeTower()
    docs = [f"doc number {i}" for i in range(12)]
    r = DPRRetriever(tower, tower, backend="xla_exact")
    r.build_index(docs, metadata=[{"even": i % 2 == 0} for i in range(12)])
    # a doc queried as itself scores max dot -> wins unfiltered; under an
    # odd-only filter every hit must be an odd row
    _, i = r.search([docs[4]], 3, filter={"where": {"even": False}})
    assert all(j % 2 == 1 for j in i.ravel() if j >= 0)
    hits = r.retrieve(docs[4], 3)
    assert hits[0][0] == docs[4]


# --------------------------------------------------- review-pass regressions


def test_where_none_never_matches_missing_field():
    """An explicit None filter value matches docs whose field IS None,
    never docs that lack the field entirely."""
    doc_ids = [0, 1, 2]
    md = [{"lang": None}, {"lang": "en"}, {}]
    m = compile_filter_mask({"where": {"lang": None}}, doc_ids, md, 3)
    assert m.tolist() == [True, False, False]


def test_canonical_key_type_discrimination():
    """np.int64(5) and 5 filter identically -> same key; the string "5"
    filters differently -> different key. Unserializable values raise."""
    assert canonical_filter_key(
        {"doc_ids": [np.int64(5)]}
    ) == canonical_filter_key({"doc_ids": [5]})
    assert canonical_filter_key(
        {"doc_ids": [5]}
    ) != canonical_filter_key({"doc_ids": ["5"]})
    with pytest.raises(ValueError):
        canonical_filter_key({"doc_ids": [object()]})


def test_metadata_refresh_does_not_rewrite_corpus(rng, tmp_path):
    """build() on a compatible index with new metadata writes ONLY the
    metadata sidecar + meta.json — never the corpus (full _save would
    round-trip the whole index through the host link)."""
    import os

    corpus = _normed(rng, 30, 8)
    path = str(tmp_path / "idx")
    r = DenseRetriever(backend="xla_exact", store_dtype="float32",
                       index_path=path)
    texts = [f"t{i}" for i in range(30)]
    r.build(corpus, texts, metadata=[{"v": 1}] * 30)
    corpus_mtime = os.path.getmtime(f"{path}/corpus.npy")

    r2 = DenseRetriever(backend="xla_exact", store_dtype="float32",
                        index_path=path)
    r2.build(corpus, texts, metadata=[{"v": 2}] * 30)  # compatible no-op
    assert os.path.getmtime(f"{path}/corpus.npy") == corpus_mtime
    # the refreshed metadata round-trips with a valid digest
    r3 = DenseRetriever(backend="xla_exact", store_dtype="float32",
                        index_path=path)
    assert r3.is_built and r3.metadata[0] == {"v": 2}


def test_sharded_topk_rejects_mask_without_filtered(rng, eight_devices):
    import jax.numpy as jnp

    from latentrag_tpu.parallel import make_mesh, shard_rows
    from latentrag_tpu.parallel.sharded_topk import make_sharded_topk

    mesh = make_mesh(8)
    corpus = shard_rows(jnp.asarray(_normed(rng, 64, 8)), mesh)
    mask = shard_rows(jnp.ones(64, bool), mesh)
    fn = make_sharded_topk(mesh, k=3)
    with pytest.raises(ValueError, match="filtered=True"):
        fn(jnp.asarray(_normed(rng, 2, 8)), corpus, jnp.int32(64),
           mask_shard=mask)


def test_http_stats_reset_requires_exact_param(tmp_path):
    """GET /stats?noreset=1 must NOT reset stats (substring matching bug)."""
    import json as _json
    import sys
    import threading
    import urllib.request
    from types import SimpleNamespace

    import serve
    from latentrag_tpu.utils import (
        apply_overrides,
        init_logger,
        load_config,
    )

    overrides = [
        "data.dataset=synthetic", "data.max_samples=20",
        "encoder.vocab_size=600", "encoder.dtype=float32",
        "encoder.hidden_dim=32", "encoder.num_layers=1",
        "encoder.num_heads=4", "encoder.mlp_dim=64",
        "retrieval.kernel=xla_exact", "retrieval.index_path=",
        f"paths.data_dir={tmp_path}/data",
        f"paths.checkpoints_dir={tmp_path}/ckpt",
        f"paths.logs_dir={tmp_path}/logs",
        f"logging.log_file={tmp_path}/logs/run.log",
    ]
    cfg = apply_overrides(load_config(None), overrides)
    loggers = init_logger(cfg.logging, stream=sys.stderr)
    args = SimpleNamespace(ae_type="none", generate=False, cold_boot=False)
    runner, compressor, retriever, mode = serve.boot(cfg, args, loggers)
    handle = serve.make_handle(cfg, args, runner, compressor, retriever,
                               mode)
    server = serve.serve_http(handle, retriever, mode, "127.0.0.1", 0,
                              loggers)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()

    def get(path):
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=30
        ) as r:
            return _json.loads(r.read())

    try:
        handle({"query": "telescopes", "k": 2})  # accrue one search
        before = get("/stats?noreset=1")["stats"]["search_calls"]
        assert before >= 1
        after = get("/stats")["stats"]["search_calls"]
        assert after == before  # noreset=1 did NOT reset
        get("/stats?reset=1")
        assert get("/stats")["stats"]["search_calls"] == 0
    finally:
        server.shutdown()
        server.server_close()
        thread.join(timeout=10)
