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
