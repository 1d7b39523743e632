"""DPR dual-encoder tests: joint tower training, CLS pooling parity with
HF BERT, benchmark integration, and the end-to-end trained-DPR CLI."""

import numpy as np
import pytest

from latentrag_tpu.data import WordPieceTokenizer, synthetic_examples
from latentrag_tpu.models.encoder.minilm import SentenceEncoder
from latentrag_tpu.retrieval.dpr import DPRRetriever
from latentrag_tpu.training.train_dpr import DualEncoderTrainer
from latentrag_tpu.utils.config import EncoderConfig, TrainingConfig


@pytest.fixture(scope="module")
def pairs():
    examples = synthetic_examples(120)
    return (
        [e["question"] for e in examples],
        [e["context"] for e in examples],
    )


@pytest.fixture(scope="module")
def towers(pairs):
    _, contexts = pairs
    tok = WordPieceTokenizer.train_from_corpus(
        contexts, vocab_size=800, min_freq=1
    )
    ecfg = EncoderConfig(
        vocab_size=800, hidden_dim=32, num_layers=1, num_heads=4,
        mlp_dim=64, dtype="float32", pooling="cls", normalize=False,
    )
    return SentenceEncoder(tok, ecfg, seed=1), SentenceEncoder(tok, ecfg, seed=2)


def test_dual_tower_training_improves_retrieval(pairs, towers):
    queries, contexts = pairs
    q_enc, c_enc = towers

    def recall_at_5():
        r = DPRRetriever(q_enc, c_enc)
        r.build_index(contexts)
        _, idx = r.search(queries, 5)
        return np.mean([i in row for i, row in enumerate(idx)])

    before = recall_at_5()
    trainer = DualEncoderTrainer(
        q_enc, c_enc,
        TrainingConfig(batch_size=32, epochs=6, learning_rate=1e-3),
        max_length=48,
    )
    res = trainer.fit(queries, contexts)
    after = recall_at_5()
    assert res.history[-1][1] < res.history[0][1]  # train loss fell
    assert after > before  # and it shows up in retrieval
    # towers are genuinely distinct (not weight-tied)
    q0 = jax_leaf(res.q_params)
    c0 = jax_leaf(res.c_params)
    assert not np.allclose(q0, c0)


def jax_leaf(tree):
    import jax

    return np.asarray(jax.tree_util.tree_leaves(tree)[0])


def test_cls_pooling_matches_hf_bert(tmp_path):
    # DPR takes the [CLS] last hidden state; differential against a
    # random-init HF BertModel (the test_hf_conversion pattern)
    transformers = pytest.importorskip("transformers")
    import torch

    from latentrag_tpu.models.encoder.convert import convert_hf_bert_to_params
    from latentrag_tpu.models.encoder.minilm import MiniLMEncoder

    import jax.numpy as jnp

    cfg = transformers.BertConfig(
        vocab_size=211, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, hidden_act="gelu",
    )
    torch.manual_seed(0)
    hf = transformers.BertModel(cfg).eval()
    hf.save_pretrained(tmp_path / "bert")
    params, _ = convert_hf_bert_to_params(str(tmp_path / "bert"))

    enc = MiniLMEncoder(
        vocab_size=211, hidden_dim=32, num_layers=2, num_heads=4,
        mlp_dim=64, max_position_embeddings=64, normalize=False,
        pooling="cls", dtype=jnp.float32,
    )
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 211, size=(4, 12)).astype(np.int32)
    mask = np.ones_like(ids)
    mask[:, 9:] = 0
    ours = np.asarray(enc.apply({"params": params}, ids, mask))
    with torch.no_grad():
        theirs = hf(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
        ).last_hidden_state[:, 0, :].numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_benchmark_dpr_system(tmp_path, pairs):
    from latentrag_tpu.data import load_evaluation_data
    from latentrag_tpu.evaluation import run_benchmark
    from latentrag_tpu.utils import apply_overrides, load_config

    cfg = apply_overrides(load_config(None), [
        "encoder.vocab_size=800", "encoder.dtype=float32",
        "encoder.hidden_dim=32", "encoder.num_layers=1",
        "encoder.num_heads=4", "encoder.mlp_dim=64",
        "retrieval.kernel=xla_exact", "retrieval.index_path=",
        f"paths.data_dir={tmp_path}/data",
        f"paths.checkpoints_dir={tmp_path}/ckpt",
        f"paths.logs_dir={tmp_path}/logs",
    ])
    queries, corpus, relevant = load_evaluation_data(synthetic_examples(40))
    out = run_benchmark(cfg, queries, corpus, relevant, systems=("dpr",))
    assert "metrics" in out["dpr"], out["dpr"]
    assert 0.0 <= out["dpr"]["metrics"]["Recall@10"]["mean"] <= 1.0


def test_train_dpr_cli(tmp_path):
    from latentrag_tpu.training.train_dpr import main

    rc = main([
        "--epochs", "2", "--batch_size", "16", "--max_length", "32", "--set",
        "data.dataset=synthetic", "data.max_samples=60",
        "encoder.vocab_size=800", "encoder.dtype=float32",
        "encoder.hidden_dim=32", "encoder.num_layers=1",
        "encoder.num_heads=4", "encoder.mlp_dim=64",
        f"paths.data_dir={tmp_path}/data",
        f"paths.checkpoints_dir={tmp_path}/ckpt",
        f"paths.logs_dir={tmp_path}/logs",
        f"logging.log_file={tmp_path}/logs/run.log",
    ])
    assert rc == 0
    assert (tmp_path / "ckpt" / "dpr_question.msgpack").exists()
    assert (tmp_path / "ckpt" / "dpr_context.msgpack").exists()

    # the trained towers reload through build_dpr_encoders
    from latentrag_tpu.training.train_dpr import build_dpr_encoders
    from latentrag_tpu.utils import apply_overrides, load_config

    cfg = apply_overrides(load_config(None), [
        "encoder.vocab_size=800", "encoder.dtype=float32",
        "encoder.hidden_dim=32", "encoder.num_layers=1",
        "encoder.num_heads=4", "encoder.mlp_dim=64",
        f"paths.data_dir={tmp_path}/data",
        f"paths.checkpoints_dir={tmp_path}/ckpt",
    ])
    q_enc, c_enc = build_dpr_encoders(cfg)
    emb = q_enc.encode_batch(["what is topic 3"])
    assert emb.shape == (1, 32)
