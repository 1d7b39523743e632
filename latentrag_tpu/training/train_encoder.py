"""Contrastive sentence-encoder training (in-batch InfoNCE).

Beyond-reference capability: the reference depends on frozen pretrained
SBERT weights (``retrieval/embedder.py:17``); here the Flax MiniLM tower can
be trained from scratch (or fine-tuned from converted weights) on
(query, positive-passage) pairs with symmetric in-batch-negative InfoNCE —
the standard sentence-embedding objective — making the whole framework
self-sufficient offline.

TPU notes: one shared tower encodes queries and passages in a single fused
batch (2B rows through the MXU per step); sequences pad to a fixed length so
jit compiles once; the similarity matrix is [B, B] fp32.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.encoder.minilm import SentenceEncoder
from ..utils.config import TrainingConfig

log = logging.getLogger("latentrag.train")


def info_nce_loss(
    z_q: jax.Array,
    z_p: jax.Array,
    temperature: float = 0.05,
    dup_mask: jax.Array | None = None,
) -> jax.Array:
    """Symmetric in-batch InfoNCE over L2-normalized embeddings.

    ``dup_mask[i, j]`` true marks off-diagonal pairs whose positives are
    identical (frequent in SQuAD: ~6 questions share one context); they are
    excluded from the negatives, otherwise the objective contradicts itself
    (forcing sim(q_i, p_j) low while p_j == p_i).
    """
    sims = (z_q @ z_p.T).astype(jnp.float32) / temperature  # [B, B]
    if dup_mask is not None:
        eye = jnp.eye(sims.shape[0], dtype=bool)
        sims = jnp.where(dup_mask & ~eye, -1e9, sims)
    labels = jnp.arange(sims.shape[0])
    loss_qp = optax.softmax_cross_entropy_with_integer_labels(sims, labels)
    loss_pq = optax.softmax_cross_entropy_with_integer_labels(sims.T, labels)
    return 0.5 * (loss_qp.mean() + loss_pq.mean())


@dataclasses.dataclass
class EncoderTrainResult:
    params: dict
    history: list
    best_val_loss: float


class EncoderTrainer:
    """Fine-tune/train a SentenceEncoder on (query, positive) text pairs."""

    def __init__(
        self,
        encoder: SentenceEncoder,
        cfg: TrainingConfig | None = None,
        max_length: int = 64,
        temperature: float = 0.05,
    ):
        self.encoder = encoder
        self.cfg = cfg or TrainingConfig(batch_size=32, epochs=5)
        self.max_length = max_length
        self.temperature = temperature
        self.tx = optax.adamw(self.cfg.learning_rate, weight_decay=1e-4)
        module = encoder.module
        temp = self.temperature

        def loss_fn(params, batch):
            ids = jnp.concatenate([batch["q_ids"], batch["p_ids"]])
            mask = jnp.concatenate([batch["q_mask"], batch["p_mask"]])
            z = module.apply({"params": params}, ids, mask)
            b = batch["q_ids"].shape[0]
            # identical-positive detection by token ids (duplicated contexts
            # must not be each other's negatives)
            p = batch["p_ids"]
            dup = jnp.all(p[:, None, :] == p[None, :, :], axis=-1)
            return info_nce_loss(z[:b], z[b:], temp, dup_mask=dup)

        @jax.jit
        def train_step(params, opt_state, batch):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        self._train_step = train_step
        self._eval_step = jax.jit(loss_fn)

    def _tokenize_pairs(self, queries: Sequence[str], positives: Sequence[str]):
        tok = self.encoder.tokenizer
        q_ids, q_mask = tok.encode_batch(list(queries), self.max_length)
        p_ids, p_mask = tok.encode_batch(list(positives), self.max_length)

        def pad(a, fill):
            if a.shape[1] < self.max_length:
                a = np.pad(
                    a,
                    ((0, 0), (0, self.max_length - a.shape[1])),
                    constant_values=fill,
                )
            return a

        return {
            "q_ids": pad(q_ids, tok.pad_id),
            "q_mask": pad(q_mask, 0),
            "p_ids": pad(p_ids, tok.pad_id),
            "p_mask": pad(p_mask, 0),
        }

    def fit(
        self,
        queries: Sequence[str],
        positives: Sequence[str],
        val_fraction: float = 0.1,
        checkpoint_dir: str | None = None,
        resume: bool = False,
    ) -> EncoderTrainResult:
        """Train; with ``checkpoint_dir`` every improvement persists
        params + optimizer state + epoch (Orbax — the AE trainer's
        convention), and ``resume=True`` continues a preempted run from
        the last saved improvement (epoch counter included; the shuffle
        stream restarts, so resumed curves are statistically, not
        bitwise, continuous)."""
        import os

        cfg = self.cfg
        if len(queries) < 8:
            raise ValueError(
                f"need at least 8 (query, positive) pairs, got {len(queries)}"
            )
        data = self._tokenize_pairs(queries, positives)
        n = data["q_ids"].shape[0]
        rng = np.random.default_rng(cfg.seed)
        order = rng.permutation(n)
        n_val = max(2, int(n * val_fraction))
        val_idx, train_idx = order[:n_val], order[n_val:]
        val_batch = {k: jnp.asarray(v[val_idx]) for k, v in data.items()}

        params = self.encoder.params
        opt_state = self.tx.init(params)
        best_val = float("inf")
        best_params = params
        start_epoch = 0
        if resume and checkpoint_dir and os.path.isdir(checkpoint_dir):
            from .trainer import restore_training_state

            params, opt_state, best_val, start_epoch = (
                restore_training_state(checkpoint_dir, self.tx, params)
            )
            best_params = params
            log.info(
                "[encoder] resumed from %s at epoch %d (best val %.4f)",
                checkpoint_dir, start_epoch, best_val,
            )
        history = []
        bs = min(cfg.batch_size, len(train_idx))
        for epoch in range(start_epoch, cfg.epochs):
            rng.shuffle(train_idx)
            losses = []
            for s in range(0, len(train_idx) - bs + 1, bs):
                sel = train_idx[s : s + bs]
                batch = {k: jnp.asarray(v[sel]) for k, v in data.items()}
                params, opt_state, lv = self._train_step(
                    params, opt_state, batch
                )
                losses.append(float(lv))
            val_loss = float(self._eval_step(params, val_batch))
            train_loss = float(np.mean(losses)) if losses else float("nan")
            history.append((epoch, train_loss, val_loss))
            log.info(
                "[encoder] epoch %d train %.4f val %.4f",
                epoch, train_loss, val_loss,
            )
            if val_loss < best_val:
                best_val = val_loss
                best_params = params
                if checkpoint_dir:
                    from .trainer import save_checkpoint

                    save_checkpoint(checkpoint_dir, {
                        "params": best_params,
                        "opt_state": opt_state,
                        "epoch": epoch,
                        "best_val": best_val,
                    })
        self.encoder.params = best_params
        return EncoderTrainResult(
            params=best_params, history=history, best_val_loss=best_val
        )


def main(argv=None) -> int:
    """CLI: train the sentence encoder on the configured dataset's
    (question, context) pairs and save weights + tokenizer."""
    import argparse
    import os

    from ..data import WordPieceTokenizer, get_examples
    from ..models.encoder import save_params
    from ..utils import apply_overrides, init_logger, load_config

    p = argparse.ArgumentParser(description="train the sentence encoder")
    p.add_argument("--config", default=None)
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--learning_rate", type=float, default=3e-4)
    p.add_argument("--max_length", type=int, default=64)
    p.add_argument("--out", default=None, help="weights output (.msgpack)")
    p.add_argument("--resume", action="store_true",
                   help="continue from the encoder_train Orbax checkpoint")
    p.add_argument("--set", nargs="*", default=[], metavar="a.b=v")
    args = p.parse_args(argv)

    cfg = apply_overrides(load_config(args.config), args.set)
    loggers = init_logger(cfg.logging)
    examples = get_examples(cfg, split="train")
    queries = [e["question"] for e in examples]
    positives = [e["context"] for e in examples]

    tok_path = os.path.join(cfg.paths.data_dir, "tokenizer.json")
    if os.path.exists(tok_path):
        tokenizer = WordPieceTokenizer.load(tok_path)
    else:
        tokenizer = WordPieceTokenizer.train_from_corpus(
            positives, vocab_size=cfg.encoder.vocab_size
        )
        os.makedirs(cfg.paths.data_dir, exist_ok=True)
        tokenizer.save(tok_path)

    encoder = SentenceEncoder(tokenizer, cfg.encoder)
    tcfg = TrainingConfig(
        batch_size=args.batch_size,
        epochs=args.epochs,
        learning_rate=args.learning_rate,
        seed=cfg.training.seed,
    )
    trainer = EncoderTrainer(encoder, tcfg, max_length=args.max_length)
    ckpt_dir = os.path.join(cfg.paths.checkpoints_dir, "encoder_train")
    result = trainer.fit(
        queries, positives, checkpoint_dir=ckpt_dir, resume=args.resume
    )
    out = args.out or os.path.join(
        cfg.paths.checkpoints_dir, "encoder.msgpack"
    )
    save_params(result.params, out)
    loggers.train.info(
        "encoder trained: best val %.4f -> %s", result.best_val_loss, out
    )
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
