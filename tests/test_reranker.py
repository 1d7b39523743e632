"""Cross-encoder reranker: pair encoding, scorer, training, pipeline."""

import dataclasses

import numpy as np
import pytest

from latentrag_tpu.data.tokenizer import WordPieceTokenizer
from latentrag_tpu.models.encoder.cross import (
    CrossEncoderScorer,
    encode_pairs,
)
from latentrag_tpu.utils.config import EncoderConfig

CORPUS = [
    "the telescope observes distant galaxies and stars",
    "mitochondria produce energy inside living cells",
    "markets react to interest rate announcements",
    "the orchestra rehearsed the symphony for weeks",
    "volcanic eruptions reshape the island coastline",
    "quantum processors need error correction to scale",
    "ancient rome built aqueducts across the empire",
    "deep ocean trenches host unique ecosystems",
]


@pytest.fixture(scope="module")
def tok():
    return WordPieceTokenizer.train_from_corpus(CORPUS, vocab_size=400)


@pytest.fixture(scope="module")
def ecfg():
    return EncoderConfig(
        vocab_size=400, dtype="float32", hidden_dim=32, num_layers=1,
        num_heads=4, mlp_dim=64, max_length=48, batch_size=16,
    )


def test_encode_pairs_layout(tok):
    ids, mask, tt = encode_pairs(
        tok, ["telescope observes"], ["galaxies and stars"],
        max_length=32, query_max=16,
    )
    assert ids.shape == (1, 32) and mask.shape == tt.shape == ids.shape
    live = int(mask[0].sum())
    assert ids[0, 0] == tok.cls_id
    # exactly two SEPs among live tokens: query end + doc end
    seps = [j for j in range(live) if ids[0, j] == tok.sep_id]
    assert len(seps) == 2 and seps[1] == live - 1
    # token types: 0 through the query's SEP, 1 strictly after
    assert (tt[0, :seps[0] + 1] == 0).all()
    assert (tt[0, seps[0] + 1:live] == 1).all()
    assert (tt[0, live:] == 0).all() and (mask[0, live:] == 0).all()


def test_encode_pairs_truncation_keeps_final_sep(tok):
    long_q = " ".join(CORPUS[:3])  # overflows query_max -> ql == query_max
    long_doc = " ".join(CORPUS)
    ids, mask, tt = encode_pairs(
        tok, [long_q], [long_doc], max_length=24, query_max=16,
    )
    live = int(mask[0].sum())
    assert live == 24  # doc body certainly exceeded its budget
    assert ids[0, live - 1] == tok.sep_id  # truncation re-seals the pair
    assert tt[0, live - 1] == 1


def test_encode_pairs_validates_lengths(tok):
    with pytest.raises(ValueError, match="1:1"):
        encode_pairs(tok, ["a", "b"], ["c"])


def test_scorer_chunking_is_consistent(tok, ecfg):
    scorer = CrossEncoderScorer(tok, ecfg, seed=0)
    queries = [f"query {c}" for c in "abcdefghijklmnopqrst"]
    docs = [CORPUS[i % len(CORPUS)] for i in range(20)]
    full = scorer.score_pairs(queries, docs)
    assert full.shape == (20,) and full.dtype == np.float32
    small = dataclasses.replace(ecfg, batch_size=6)
    scorer2 = CrossEncoderScorer(tok, small, seed=0)
    scorer2.params = scorer.params
    np.testing.assert_allclose(
        full, scorer2.score_pairs(queries, docs), rtol=1e-4, atol=1e-5
    )


def test_rescore_candidates_scatters_and_sentinels(tok, ecfg):
    from latentrag_tpu.retrieval.reranker import (
        NEG_INF,
        CrossEncoderReranker,
    )

    class FakeScorer:
        def score_pairs(self, qs, ds):
            # deterministic: score = doc text length
            return np.asarray([float(len(d)) for d in ds], np.float32)

    rr = CrossEncoderReranker(FakeScorer())
    texts = ["a", "bbb", "cc"]
    idx = np.asarray([[0, 2, -1], [1, -1, -1]])
    out = rr.rescore_candidates(["q1", "q2"], idx, texts)
    assert out[0, 0] == 1.0 and out[0, 1] == 2.0 and out[1, 0] == 3.0
    assert out[0, 2] == NEG_INF and (out[1, 1:] == NEG_INF).all()


def test_listwise_loss_masks_duplicates():
    import jax.numpy as jnp

    from latentrag_tpu.training.train_reranker import listwise_loss

    logits = jnp.asarray([[5.0, 5.0], [0.0, 5.0]])
    dup = jnp.asarray([[True, True], [True, True]])  # same doc twice
    masked = float(listwise_loss(logits, dup_mask=dup))
    unmasked = float(listwise_loss(logits))
    assert masked < unmasked  # the duplicate column stopped competing


def test_reranker_training_improves(tok, ecfg):
    from latentrag_tpu.models.encoder.cross import CrossEncoderScorer
    from latentrag_tpu.training.train_reranker import RerankerTrainer
    from latentrag_tpu.utils.config import TrainingConfig

    queries = []
    docs = []
    for i, c in enumerate(CORPUS):
        kw = c.split()[1]  # a distinctive content token
        for j in range(4):
            queries.append(f"what about {kw} number {j}")
            docs.append(c)
    scorer = CrossEncoderScorer(tok, ecfg, seed=1)
    trainer = RerankerTrainer(
        scorer,
        TrainingConfig(batch_size=4, epochs=6, learning_rate=2e-3),
        max_length=32,
    )
    res = trainer.fit(queries, docs, val_fraction=0.2)
    first_val = res.history[0][2]
    assert res.best_val_loss < first_val  # it learned something
    # the trained scorer ranks the right passage above a random other one
    s_pos = scorer.score_pairs(
        ["what about observes number 9"], [CORPUS[0]]
    )[0]
    s_neg = scorer.score_pairs(
        ["what about observes number 9"], [CORPUS[2]]
    )[0]
    assert s_pos > s_neg


def test_build_reranker_requires_checkpoint(tok, tmp_path):
    from latentrag_tpu.retrieval.reranker import build_reranker
    from latentrag_tpu.utils import load_config
    from latentrag_tpu.utils.config import apply_overrides

    cfg = apply_overrides(load_config(None), [
        f"paths.checkpoints_dir={tmp_path}/ckpt",
        "encoder.vocab_size=400", "encoder.hidden_dim=32",
        "encoder.num_layers=1", "encoder.num_heads=4", "encoder.mlp_dim=64",
    ])
    with pytest.raises(FileNotFoundError, match="train_reranker"):
        build_reranker(cfg, tok)


def test_pipeline_reranker_reorders_candidates(tmp_path):
    """retrieval.rerank=cross widens candidate_k and routes the candidate
    scores through the reranker before MaxSim (injected scorer prefers the
    lexicographically LAST candidate text — orderings must follow)."""
    from latentrag_tpu.pipeline import PipelineRunner
    from latentrag_tpu.retrieval.reranker import CrossEncoderReranker
    from latentrag_tpu.utils import load_config
    from latentrag_tpu.utils.config import apply_overrides

    cfg = apply_overrides(load_config(None), [
        "data.dataset=synthetic", "data.max_samples=24",
        "encoder.vocab_size=600", "encoder.dtype=float32",
        "encoder.hidden_dim=32", "encoder.num_layers=1",
        "encoder.num_heads=4", "encoder.mlp_dim=64",
        "retrieval.kernel=xla_exact", "retrieval.index_path=",
        "retrieval.top_k=3", "retrieval.rerank=cross",
        f"paths.data_dir={tmp_path}/data",
        f"paths.checkpoints_dir={tmp_path}/ckpt",
        f"paths.logs_dir={tmp_path}/logs",
        f"logging.log_file={tmp_path}/logs/run.log",
    ])

    class LastWins:
        def score_pairs(self, qs, ds):
            return np.asarray([float(len(d)) for d in ds], np.float32)

    from latentrag_tpu.data import get_examples, load_evaluation_data

    examples = get_examples(cfg)
    queries, corpus, relevant = load_evaluation_data(examples)
    runner = PipelineRunner(
        cfg, ae_type="none", reranker=CrossEncoderReranker(LastWins())
    )
    out = runner.process(queries, corpus, relevant)
    assert out["candidate_k"] == 12  # 4 * top_k oversampling
    assert "rerank_s" in out["timings"]
    # within every query's final list, docs are ordered by the injected
    # preference (longer text first)
    texts_by_doc = {i: len(t) for i, t in enumerate(corpus)}
    for row in out["retrieved_doc_ids"]:
        lens = [texts_by_doc[d] for d in row]
        assert lens == sorted(lens, reverse=True)


def test_reranker_meta_pins_trained_length_and_vocab(tok, ecfg, tmp_path):
    """The checkpoint's meta sidecar pins the TRAINED pair length (served
    pairs truncate to it) and refuses a different vocabulary."""
    import dataclasses as dc

    from latentrag_tpu.models.encoder.convert import save_params
    from latentrag_tpu.retrieval.reranker import (
        build_reranker,
        reranker_checkpoint_path,
        save_reranker_meta,
    )
    from latentrag_tpu.utils import load_config
    from latentrag_tpu.utils.config import apply_overrides

    cfg = apply_overrides(load_config(None), [
        f"paths.checkpoints_dir={tmp_path}/ckpt",
        f"paths.data_dir={tmp_path}/data",
        "encoder.vocab_size=400", "encoder.dtype=float32",
        "encoder.hidden_dim=32", "encoder.num_layers=1",
        "encoder.num_heads=4", "encoder.mlp_dim=64",
        "encoder.max_length=256",
    ])
    scorer = CrossEncoderScorer(tok, dc.replace(ecfg, max_length=256),
                                seed=5)
    import os

    os.makedirs(f"{tmp_path}/ckpt", exist_ok=True)
    save_params(scorer.params, reranker_checkpoint_path(cfg))
    save_reranker_meta(cfg, tok, max_length=48, query_max=24)

    rr = build_reranker(cfg, tok)
    # served pairs truncate to the TRAINED length, not encoder.max_length
    assert rr.scorer.cfg.max_length == 48
    assert rr.scorer.query_max == 24

    # a different vocabulary of any size refuses to serve
    other = WordPieceTokenizer.train_from_corpus(
        ["completely different corpus tokens here"], vocab_size=400
    )
    with pytest.raises(ValueError, match="different.*vocabulary"):
        build_reranker(cfg, other)


def test_benchmark_rerank_system(tmp_path):
    """--benchmark rerank: sbert stage 1 + trained cross-encoder stage 2,
    compared with paired-bootstrap deltas like any other system."""
    from latentrag_tpu.data import get_examples, load_evaluation_data
    from latentrag_tpu.evaluation import run_benchmark
    from latentrag_tpu.training.train_reranker import main as train_main
    from latentrag_tpu.utils import load_config
    from latentrag_tpu.utils.config import apply_overrides

    overrides = [
        "data.dataset=synthetic", "data.max_samples=40",
        "encoder.vocab_size=800", "encoder.dtype=float32",
        "encoder.hidden_dim=32", "encoder.num_layers=1",
        "encoder.num_heads=4", "encoder.mlp_dim=64",
        "retrieval.kernel=xla_exact", "retrieval.index_path=",
        "retrieval.top_k=3", "evaluation.bootstrap_samples=50",
        f"paths.data_dir={tmp_path}/data",
        f"paths.checkpoints_dir={tmp_path}/ckpt",
        f"paths.logs_dir={tmp_path}/logs",
        f"logging.log_file={tmp_path}/logs/run.log",
    ]
    assert train_main(
        ["--epochs", "2", "--batch_size", "4", "--max_length", "48",
         "--set"] + overrides
    ) == 0
    cfg = apply_overrides(load_config(None), overrides)
    examples = get_examples(cfg)
    queries, corpus, relevant = load_evaluation_data(examples)
    out = run_benchmark(
        cfg, queries, corpus, relevant, systems=("sbert", "rerank")
    )
    assert "metrics" in out["rerank"], out["rerank"]
    assert "metrics" in out["sbert"]
    # pairwise delta exists for the pair
    some_metric = next(iter(out["_deltas"].values()))
    assert "sbert-rerank" in some_metric


def test_reranker_hard_negative_mode(tok, ecfg):
    """fit(negatives=...) trains on [B, 1+H] mined candidate lists (the
    serving distribution) and still learns positive-above-negative."""
    from latentrag_tpu.models.encoder.cross import CrossEncoderScorer
    from latentrag_tpu.training.train_reranker import RerankerTrainer
    from latentrag_tpu.utils.config import TrainingConfig

    queries, docs, negs = [], [], []
    for i, c in enumerate(CORPUS):
        kw = c.split()[1]
        for j in range(4):
            queries.append(f"what about {kw} number {j}")
            docs.append(c)
            # mined "hard" negatives: the other corpus passages, plus a
            # duplicate-of-positive that the dup mask must drop
            negs.append([CORPUS[(i + 1) % len(CORPUS)], c])
    scorer = CrossEncoderScorer(tok, ecfg, seed=1)
    trainer = RerankerTrainer(
        scorer,
        TrainingConfig(batch_size=4, epochs=6, learning_rate=2e-3),
        max_length=32,
    )
    res = trainer.fit(queries, docs, val_fraction=0.2, negatives=negs)
    first_val = res.history[0][2]
    assert res.best_val_loss < first_val
    s_pos = scorer.score_pairs(
        ["what about observes number 9"], [CORPUS[0]]
    )[0]
    s_neg = scorer.score_pairs(
        ["what about observes number 9"], [CORPUS[2]]
    )[0]
    assert s_pos > s_neg
