"""End-to-end pipeline tests on synthetic data with the self-init encoder —
the orchestration coverage the reference never had (SURVEY §4 gaps)."""

import dataclasses

import numpy as np
import pytest

from latentrag_tpu.data import load_evaluation_data, synthetic_examples
from latentrag_tpu.pipeline import PipelineRunner, load_autoencoder
from latentrag_tpu.utils import Config, apply_overrides


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    base = tmp_path_factory.mktemp("pipe")
    cfg = Config()
    cfg = apply_overrides(
        cfg,
        [
            f"paths.data_dir={base}/data",
            f"paths.checkpoints_dir={base}/ckpt",
            f"paths.logs_dir={base}/logs",
            f"retrieval.index_path={base}/index",
            "retrieval.kernel=xla_exact",
            "data.dataset=synthetic",
            "data.max_samples=60",
            "encoder.vocab_size=800",
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
    return cfg


@pytest.fixture(scope="module")
def eval_data():
    return load_evaluation_data(synthetic_examples(60))


def test_pipeline_none_ae(cfg, eval_data):
    queries, corpus, relevant = eval_data
    runner = PipelineRunner(cfg, ae_type="none")
    result = runner.process(queries, corpus, relevant)
    assert result["dim_in"] == 32 and result["dim_out"] == 32
    assert result["n_corpus"] == len(corpus)
    assert set(result["retrieval_metrics"]) == {
        "Recall@10", "MRR@10", "nDCG@10",
    }
    r = result["retrieval_metrics"]["Recall@10"]["mean"]
    assert 0.0 <= r <= 1.0
    assert result["retriever_stats"]["search_calls"] == 1
    # every retrieved doc id must be a valid corpus index
    for row in result["retrieved_doc_ids"]:
        assert all(0 <= d < len(corpus) for d in row)


def test_pipeline_with_chunking(cfg, eval_data):
    queries, corpus, relevant = eval_data
    c2 = apply_overrides(
        cfg, ["chunking.enabled=true", "chunking.mode=sliding",
              "chunking.max_tokens=24", "chunking.stride=12"]
    )
    runner = PipelineRunner(c2, ae_type="none")
    result = runner.process(queries, corpus, relevant)
    assert result["n_chunks"] > result["n_corpus"]
    assert result["candidate_k"] == min(30, result["n_chunks"])
    for row in result["retrieved_doc_ids"]:
        assert len(set(row)) == len([d for d in row if d >= 0])  # deduped docs


def test_pipeline_with_trained_vae(cfg, eval_data, tmp_path):
    from latentrag_tpu.models import build_autoencoder, init_autoencoder
    from latentrag_tpu.training import Trainer, save_checkpoint
    from latentrag_tpu.utils.config import TrainingConfig
    import os

    queries, corpus, relevant = eval_data
    # train a tiny VAE on the corpus embeddings produced by the pipeline's
    # own encoder, save the checkpoint where the runner looks for it
    runner_plain = PipelineRunner(cfg, ae_type="none")
    comp = runner_plain._ensure_compressor(corpus)
    emb = comp.encode_text(corpus)
    model = build_autoencoder("vae", cfg.models.vae)
    tr = Trainer(model, "vae",
                 TrainingConfig(batch_size=16, epochs=3, learning_rate=1e-3,
                                early_stop_patience=100))
    res = tr.fit({"x": emb, "y": emb}, {"x": emb[:8], "y": emb[:8]})
    ckpt = os.path.join(cfg.paths.checkpoints_dir, "vae")
    save_checkpoint(ckpt, {"params": res.params, "opt_state": None,
                           "epoch": 0, "best_val": res.best_val_loss})

    runner = PipelineRunner(cfg, ae_type="vae")
    result = runner.process(queries, corpus, relevant)
    assert result["dim_out"] == 8
    assert result["dim_in"] == 32  # true input dim (reference defect fixed)


def test_generation_path_with_fake_client(cfg, eval_data):
    from latentrag_tpu.generation import RAGGenerator

    queries, corpus, relevant = eval_data
    queries = queries[:5]
    relevant = relevant[:5]
    fake = RAGGenerator(client_fn=lambda messages, llm: "stub answer")
    runner = PipelineRunner(cfg, ae_type="none", generate=True, generator=fake)
    result = runner.process(queries, corpus, relevant)
    assert result["answers"] == ["stub answer"] * 5


def test_pipeline_mesh_end_to_end(cfg, eval_data, eight_devices):
    """PipelineRunner(mesh=...): corpus ENCODING is mesh-data-parallel and
    the index shards over the same mesh (shard_corpus=true) — metrics must
    equal the single-device run (encode is bit-identical; sharded exact
    top-k merges to the oracle)."""
    from latentrag_tpu.parallel import make_mesh

    queries, corpus, relevant = eval_data
    single = PipelineRunner(cfg, ae_type="none").process(
        queries, corpus, relevant
    )
    c2 = apply_overrides(cfg, ["retrieval.shard_corpus=true"])
    meshed = PipelineRunner(c2, ae_type="none", mesh=make_mesh(8)).process(
        queries, corpus, relevant
    )
    assert meshed["retrieval_metrics"] == single["retrieval_metrics"]
    assert meshed["retrieved_doc_ids"] == single["retrieved_doc_ids"]


def test_generation_batch_overlaps_and_preserves_order(cfg, eval_data):
    """--generate runs completions through generate_batch_async: calls must
    OVERLAP (a sequential loop would deadlock this client and hit the wait
    timeout) while answers stay in query order."""
    import threading

    from latentrag_tpu.generation import RAGGenerator

    queries, corpus, relevant = eval_data
    queries, relevant = queries[:6], relevant[:6]
    overlap_seen = threading.Event()
    lock = threading.Lock()
    active = {"n": 0, "max": 0}

    def client(messages, llm):
        with lock:
            active["n"] += 1
            active["max"] = max(active["max"], active["n"])
            if active["n"] >= 2:
                overlap_seen.set()
        ok = overlap_seen.wait(timeout=30)
        with lock:
            active["n"] -= 1
        prompt = messages[1]["content"]
        q = prompt.rsplit("Question: ", 1)[1].split("\n")[0]
        return f"ans::{q}" if ok else "timeout"

    runner = PipelineRunner(
        cfg, ae_type="none", generate=True,
        generator=RAGGenerator(client_fn=client),
    )
    result = runner.process(queries, corpus, relevant)
    assert active["max"] >= 2  # in-flight calls genuinely overlapped
    assert result["answers"] == [f"ans::{q}" for q in queries]


def test_generation_concurrency_one_is_sequential(cfg, eval_data):
    from latentrag_tpu.generation import RAGGenerator

    queries, corpus, relevant = eval_data
    queries, relevant = queries[:3], relevant[:3]
    active = {"n": 0, "max": 0}

    def client(messages, llm):
        active["n"] += 1
        active["max"] = max(active["max"], active["n"])
        active["n"] -= 1
        return "s"

    c2 = apply_overrides(cfg, ["generation.concurrency=1"])
    runner = PipelineRunner(
        c2, ae_type="none", generate=True,
        generator=RAGGenerator(client_fn=client),
    )
    result = runner.process(queries, corpus, relevant)
    assert active["max"] == 1
    assert result["answers"] == ["s"] * 3


def test_load_autoencoder_missing_checkpoint_raises(cfg):
    c2 = dataclasses.replace(cfg)
    with pytest.raises(FileNotFoundError):
        load_autoencoder(
            apply_overrides(c2, ["paths.checkpoints_dir=/nonexistent"]), "dae"
        )


def test_canonical_naming_in_runner(cfg):
    with pytest.raises(FileNotFoundError):
        # 'contrastive' canonicalises to cae -> looks for cae checkpoint
        PipelineRunner(
            apply_overrides(cfg, ["paths.checkpoints_dir=/nonexistent"]),
            ae_type="contrastive",
        )


@pytest.mark.parametrize("metric", ["euclidean", "mahalanobis"])
def test_pipeline_alternative_metrics(cfg, eval_data, metric):
    queries, corpus, relevant = eval_data
    c2 = apply_overrides(cfg, [f"retrieval.metric={metric}",
                               "retrieval.index_path="])
    runner = PipelineRunner(c2, ae_type="none")
    result = runner.process(queries, corpus, relevant)
    r = result["retrieval_metrics"]["Recall@10"]["mean"]
    assert 0.0 <= r <= 1.0
    assert result["retriever_stats"]["search_calls"] == 1


def test_generation_eval_end_to_end(cfg, eval_data):
    # ref main.py:331-335: with gold answers and enough pairs, bootstrap
    # generation metrics land in the result (VERDICT r1 item 6)
    from latentrag_tpu.generation import RAGGenerator

    queries, corpus, relevant = eval_data
    gold = [f"answer number {i}" for i in range(len(queries))]
    fake = RAGGenerator(
        client_fn=lambda messages, llm: "answer number 0"
    )
    c2 = apply_overrides(
        cfg, ["evaluation.min_pairs_for_bootstrap=10",
              "evaluation.bootstrap_samples=50",
              "evaluation.generation_metrics=ROUGE-L,BLEU,METEOR"]
    )
    runner = PipelineRunner(c2, ae_type="none", generate=True, generator=fake)
    result = runner.process(queries, corpus, relevant, gold_answers=gold)
    gm = result["generation_metrics"]
    assert set(gm) == {"ROUGE-L", "BLEU", "METEOR"}
    for stats in gm.values():
        assert stats["ci_low"] <= stats["mean"] + 1e-9
        assert stats["mean"] <= stats["ci_high"] + 1e-9
    # hypothesis matches gold exactly for query 0 -> nonzero rouge mass
    assert gm["ROUGE-L"]["mean"] > 0.0


def test_generation_eval_skipped_below_min_pairs(cfg, eval_data):
    from latentrag_tpu.generation import RAGGenerator

    queries, corpus, relevant = eval_data
    queries, relevant = queries[:5], relevant[:5]
    fake = RAGGenerator(client_fn=lambda messages, llm: "stub")
    runner = PipelineRunner(cfg, ae_type="none", generate=True, generator=fake)
    result = runner.process(
        queries, corpus, relevant, gold_answers=["g"] * 5
    )
    assert "generation_metrics" not in result  # 5 < default min 100
    assert result["answers"] == ["stub"] * 5
