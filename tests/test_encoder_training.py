"""Encoder contrastive training: loss decreases and retrieval improves."""

import numpy as np
import pytest

import jax.numpy as jnp

from latentrag_tpu.data import WordPieceTokenizer, synthetic_examples
from latentrag_tpu.models.encoder import SentenceEncoder
from latentrag_tpu.training.train_encoder import EncoderTrainer, info_nce_loss
from latentrag_tpu.utils.config import EncoderConfig, TrainingConfig

CFG = EncoderConfig(
    vocab_size=0, hidden_dim=32, num_layers=1, num_heads=4, mlp_dim=64,
    max_length=64, dtype="float32",
)


def test_info_nce_perfect_alignment_low():
    z = jnp.eye(8, dtype=jnp.float32)
    aligned = float(info_nce_loss(z, z, temperature=0.05))
    shuffled = float(info_nce_loss(z, jnp.roll(z, 1, axis=0), 0.05))
    assert aligned < shuffled


def test_training_improves_pair_alignment():
    examples = synthetic_examples(64)
    queries = [e["question"] for e in examples]
    positives = [e["context"] for e in examples]
    tok = WordPieceTokenizer.train_from_corpus(
        positives, vocab_size=800, min_freq=1
    )
    enc = SentenceEncoder(tok, CFG, seed=0)

    def pair_recall_at1():
        q = enc.encode_batch(queries)
        d = enc.encode_batch(positives)
        sims = q @ d.T
        return float((sims.argmax(axis=1) == np.arange(len(q))).mean())

    before = pair_recall_at1()
    trainer = EncoderTrainer(
        enc,
        TrainingConfig(batch_size=16, epochs=6, learning_rate=1e-3, seed=0),
        max_length=48,
    )
    result = trainer.fit(queries, positives)
    after = pair_recall_at1()
    # loss must drop over training and retrieval of the aligned positive
    # must improve over the random-init encoder
    assert result.history[-1][1] < result.history[0][1]
    assert after > before
    assert after >= 0.5, (before, after)


def test_encoder_training_resumes_from_checkpoint(tmp_path):
    """Preemption resilience (r4): params + opt state + epoch persist on
    improvement; resume continues from the saved epoch instead of
    restarting, and the resumed run can only match or improve best val."""
    examples = synthetic_examples(48)
    queries = [e["question"] for e in examples]
    positives = [e["context"] for e in examples]
    tok = WordPieceTokenizer.train_from_corpus(
        positives, vocab_size=400, min_freq=1
    )
    ckpt = str(tmp_path / "enc_train")

    enc1 = SentenceEncoder(tok, CFG, seed=0)
    t1 = EncoderTrainer(
        enc1, TrainingConfig(batch_size=16, epochs=2, learning_rate=1e-3),
        max_length=32,
    )
    r1 = t1.fit(queries, positives, checkpoint_dir=ckpt)
    assert len(r1.history) == 2

    # fresh process stand-in: new encoder, resume from the checkpoint
    enc2 = SentenceEncoder(tok, CFG, seed=123)  # different init...
    t2 = EncoderTrainer(
        enc2, TrainingConfig(batch_size=16, epochs=4, learning_rate=1e-3),
        max_length=32,
    )
    r2 = t2.fit(queries, positives, checkpoint_dir=ckpt, resume=True)
    # ...but training continues from the RESTORED params/epoch, so only
    # the remaining epochs run
    # checkpoint holds the LAST-IMPROVEMENT epoch (>= 0); resume starts
    # after it, never from scratch
    first_epoch = r2.history[0][0]
    assert first_epoch >= 1
    assert r2.best_val_loss <= r1.best_val_loss + 1e-6
    out = enc2.encode_batch(["does resume work"])
    assert np.isfinite(out).all()
