"""Visualization + multi-system benchmark harness + DPR tests."""

import numpy as np
import pytest

from latentrag_tpu.evaluation import (
    plot_positive_vs_negative_distances,
    positive_ranks,
    run_benchmark,
    visualize_compressed_vs_original,
)
from latentrag_tpu.utils import Config, apply_overrides


def _pairs(rng, n=40, d=16):
    d_emb = rng.standard_normal((n, d)).astype(np.float32)
    q_emb = d_emb + 0.1 * rng.standard_normal((n, d)).astype(np.float32)
    return q_emb, d_emb


def test_positive_ranks_identity(rng):
    q, d = _pairs(rng)
    ranks = positive_ranks(d, d)  # identical -> every positive ranks first
    assert (ranks == 1).all()


def test_visualize_recall_and_figures(rng, tmp_path):
    q, d = _pairs(rng)
    # compressed = degraded copy
    q_lat = q[:, :8].copy()
    d_lat = d[:, :8].copy()
    out = visualize_compressed_vs_original(
        q, d, q_lat, d_lat, out_dir=str(tmp_path), prefix="t", k=5,
        projection="pca",
    )
    assert 0.0 <= out["recall_compressed"] <= out["recall_original"] <= 1.0
    import os

    for f in out["figures"]:
        assert os.path.exists(f) and os.path.getsize(f) > 0
    p = plot_positive_vs_negative_distances(
        q_lat, d_lat, out_dir=str(tmp_path), prefix="t"
    )
    assert os.path.exists(p)


def test_visualize_no_plots_fast(rng):
    q, d = _pairs(rng, n=10)
    out = visualize_compressed_vs_original(
        q, d, q, d, make_plots=False
    )
    assert out["recall_original"] == out["recall_compressed"]


def test_infer_ae_type_from_path():
    from latentrag_tpu.viz_cli import infer_ae_type_from_path

    assert infer_ae_type_from_path("/x/vae_text.ckpt") == "vae"
    assert infer_ae_type_from_path("/x/contrastive_ae") == "cae"
    assert infer_ae_type_from_path("checkpoints/coe_text") == "cae"
    with pytest.raises(ValueError):
        infer_ae_type_from_path("/x/mystery.bin")


def test_benchmark_harness_bm25_and_sbert(tmp_path):
    from latentrag_tpu.data import load_evaluation_data, synthetic_examples

    cfg = apply_overrides(
        Config(),
        [
            f"paths.data_dir={tmp_path}/data",
            f"paths.checkpoints_dir={tmp_path}/ckpt",
            f"retrieval.index_path={tmp_path}/index",
            "retrieval.kernel=xla_exact",
            "retrieval.top_k=5",
            "data.dataset=synthetic",
            "encoder.vocab_size=600",
            "encoder.dtype=float32",
            "encoder.hidden_dim=32",
            "encoder.num_layers=1",
            "encoder.num_heads=4",
            "encoder.mlp_dim=64",
        ],
    )
    queries, corpus, relevant = load_evaluation_data(synthetic_examples(30))
    out = run_benchmark(cfg, queries, corpus, relevant,
                        systems=("bm25", "sbert"))
    assert "metrics" in out["bm25"] and "metrics" in out["sbert"]
    # synthetic questions quote corpus terms -> BM25 should do well
    assert out["bm25"]["metrics"]["Recall@10"]["mean"] > 0.5
    assert "_deltas" in out
    # an unknown system reports an error, doesn't crash the harness
    out2 = run_benchmark(cfg, queries[:5], corpus, relevant[:5],
                         systems=("nope",))
    assert "error" in out2["nope"]


def test_dpr_dual_encoder(rng):
    from latentrag_tpu.retrieval import DPRRetriever

    class StubEncoder:
        name = "stub"
        dim = 8

        def __init__(self, salt):
            self.salt = salt

        def encode_batch(self, texts):
            out = np.zeros((len(texts), 8), np.float32)
            for i, t in enumerate(texts):
                r = np.random.default_rng(abs(hash(t)) % 2**32)
                out[i] = r.standard_normal(8)
            return out

    # cosine here: the stub's unnormalized hash embeddings only guarantee
    # self-match under normalization (DPR's real default is "dot")
    r = DPRRetriever(StubEncoder("q"), StubEncoder("c"), metric="cosine",
                     backend="xla_exact")
    corpus = [f"document number {i}" for i in range(20)]
    r.build_index(corpus)
    results = r.retrieve("document number 7", top_k=3)
    assert results[0][0] == "document number 7"  # same hash-embedding
    d, i = r.search(["document number 3", "document number 4"], k=2)
    assert d.shape == (2, 2)
    assert i[0, 0] == 3 and i[1, 0] == 4
