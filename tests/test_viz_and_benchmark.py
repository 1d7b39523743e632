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
    # every pairwise delta carries a paired-bootstrap p-value (the
    # reference ships paired_bootstrap_test; here it is wired in)
    assert "_deltas" in out
    for metric, pairs in out["_deltas"].items():
        for pair, entry in pairs.items():
            assert "delta" in entry and "p_value" in entry, (metric, pair)
            assert 0.0 <= entry["p_value"] <= 1.0
    # deltas are consistent with the reported means
    d = out["_deltas"]["Recall@10"]["bm25-sbert"]["delta"]
    assert d == pytest.approx(
        out["bm25"]["metrics"]["Recall@10"]["mean"]
        - out["sbert"]["metrics"]["Recall@10"]["mean"]
    )
    # an unknown system reports an error, doesn't crash the harness
    out2 = run_benchmark(cfg, queries[:5], corpus, relevant[:5],
                         systems=("nope",))
    assert "error" in out2["nope"]


def test_run_benchmark_generation_significance(tmp_path):
    """With generate=True + gold answers, dense systems produce answers and
    the harness reports paired ROUGE-L significance between them."""
    import os

    from latentrag_tpu.data import load_evaluation_data, synthetic_examples
    from latentrag_tpu.models import build_autoencoder
    from latentrag_tpu.pipeline import PipelineRunner
    from latentrag_tpu.training import Trainer, save_checkpoint
    from latentrag_tpu.utils.config import TrainingConfig

    cfg = apply_overrides(
        Config(),
        [
            f"paths.data_dir={tmp_path}/data",
            f"paths.checkpoints_dir={tmp_path}/ckpt",
            f"paths.logs_dir={tmp_path}/logs",
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
            "models.vae.input_dim=32",
            "models.vae.latent_dim=8",
            "models.vae.hidden_dim=16",
        ],
    )
    queries, corpus, relevant, gold = load_evaluation_data(
        synthetic_examples(25), with_answers=True
    )
    # tiny trained VAE so a second dense system can generate
    runner_plain = PipelineRunner(cfg, ae_type="none")
    emb = runner_plain._ensure_compressor(corpus).encode_text(corpus)
    model = build_autoencoder("vae", cfg.models.vae)
    tr = Trainer(model, "vae",
                 TrainingConfig(batch_size=16, epochs=2, learning_rate=1e-3,
                                early_stop_patience=100))
    res = tr.fit({"x": emb, "y": emb}, {"x": emb[:8], "y": emb[:8]})
    save_checkpoint(os.path.join(cfg.paths.checkpoints_dir, "vae"),
                    {"params": res.params, "opt_state": None, "epoch": 0,
                     "best_val": res.best_val_loss})

    class EchoGenerator:
        """Deterministic offline stand-in: answers with the top context."""

        def generate(self, query, docs):
            return docs[0] if docs else ""

    out = run_benchmark(
        cfg, queries, corpus, relevant, systems=("sbert", "vae"),
        generate=True, gold_answers=gold, generator=EchoGenerator(),
    )
    assert "metrics" in out["sbert"] and "metrics" in out["vae"]
    # retrieval deltas carry paired-bootstrap p-values
    entry = out["_deltas"]["Recall@10"]["sbert-vae"]
    assert "p_value" in entry and 0.0 <= entry["p_value"] <= 1.0
    # both systems generated -> paired ROUGE-L significance is reported
    gen = out["_generation_deltas"]["ROUGE-L"]["sbert-vae"]
    assert set(gen) == {"delta", "p_value", "significant_05"}
    assert 0.0 <= gen["p_value"] <= 1.0


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
