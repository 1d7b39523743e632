"""Cross-encoder reranker training: listwise in-batch softmax.

Trains ``models/encoder/cross.py`` on (question, positive-passage) pairs
from any dataset mode: each step scores the full B x B pair matrix (every
query against every in-batch passage — B^2 pair forwards fused into one
batched call) and minimizes softmax cross-entropy with diagonal labels,
the listwise analogue of the DPR objective (duplicate-positive columns
masked, same discipline as ``train_encoder.info_nce_loss``). This is the
monoBERT/cross-encoder recipe (Nogueira & Cho 2019) adapted to in-batch
negatives so no negative mining is needed offline.

  python -m latentrag_tpu.training.train_reranker --epochs 5 --set \\
      data.dataset=synthetic data.max_samples=200

Writes ``checkpoints/reranker.msgpack`` (the checkpoint
``retrieval.rerank=cross`` loads) and keeps an Orbax resume checkpoint
(params + optimizer state + epoch) like every other trainer.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import sys
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.encoder.cross import CrossEncoderScorer, encode_pairs
from ..utils.config import TrainingConfig

log = logging.getLogger("latentrag.train")


@dataclasses.dataclass
class RerankerTrainResult:
    params: dict
    history: list
    best_val_loss: float


def listwise_loss(logits: jnp.ndarray, dup_mask=None) -> jnp.ndarray:
    """Softmax CE over each query's B candidate scores, diagonal labels.

    ``logits``: [B, B] — row i is query i against every in-batch passage.
    ``dup_mask[i, j]`` true marks off-diagonal columns whose passage text
    equals query i's positive (frequent in SQuAD); they are removed from
    the candidate set, not punished.
    """
    logits = logits.astype(jnp.float32)
    if dup_mask is not None:
        eye = jnp.eye(logits.shape[0], dtype=bool)
        logits = jnp.where(dup_mask & ~eye, -1e9, logits)
    labels = jnp.arange(logits.shape[0])
    return optax.softmax_cross_entropy_with_integer_labels(
        logits, labels
    ).mean()


class RerankerTrainer:
    """Listwise in-batch training loop over a CrossEncoderScorer."""

    def __init__(
        self,
        scorer: CrossEncoderScorer,
        cfg: TrainingConfig | None = None,
        max_length: int = 128,
    ):
        self.scorer = scorer
        self.cfg = cfg or TrainingConfig(batch_size=8, epochs=5)
        self.max_length = max_length
        self.tx = optax.adamw(self.cfg.learning_rate, weight_decay=1e-4)
        module = scorer.module

        def loss_fn(params, batch):
            shape = batch["dup"].shape
            logits = module.apply(
                {"params": params}, batch["ids"], batch["mask"],
                batch["tt"],
            ).reshape(shape)
            if "labels" in batch:
                # mined-hard-negative mode: [B, 1+H] candidate lists,
                # the positive in column 0; duplicate-of-positive
                # columns are removed from the softmax, same discipline
                # as the in-batch mode
                logits = jnp.where(
                    batch["dup"], -1e9, logits.astype(jnp.float32)
                )
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, batch["labels"]
                ).mean()
            return listwise_loss(logits, dup_mask=batch["dup"])

        @jax.jit
        def train_step(params, opt_state, batch):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        self._train_step = train_step
        self._eval_step = jax.jit(loss_fn)

    def _hard_batch(self, queries, positives, negs):
        """[B, 1+H] listwise batch: column 0 is the positive, columns
        1..H are MINED hard negatives (stage-1 top candidates). Aligns
        the training distribution with serving — the reranker's real
        job is discriminating among near-neighbours, which random
        in-batch negatives never show it (the r5 parity-corpus run
        measured the in-batch recipe actively hurting a strong
        stage 1)."""
        b, h = len(queries), len(negs[0])
        pq, pd = [], []
        dup = np.zeros((b, 1 + h), bool)
        for i in range(b):
            docs_i = [positives[i]] + list(negs[i])
            for j, dtext in enumerate(docs_i):
                pq.append(queries[i])
                pd.append(dtext)
                if j > 0 and dtext == positives[i]:
                    dup[i, j] = True
        ids, mask, tt = encode_pairs(
            self.scorer.tokenizer, pq, pd,
            max_length=self.max_length,
            query_max=self.scorer.query_max,
        )
        return {
            "ids": jnp.asarray(ids), "mask": jnp.asarray(mask),
            "tt": jnp.asarray(tt), "dup": jnp.asarray(dup),
            "labels": jnp.zeros((b,), jnp.int32),
        }

    def _pair_batch(self, queries: Sequence[str], docs: Sequence[str]):
        """All B x B (query, doc) pair tensors + the duplicate mask."""
        b = len(queries)
        pq = [queries[i] for i in range(b) for _ in range(b)]
        pd = [docs[j] for _ in range(b) for j in range(b)]
        ids, mask, tt = encode_pairs(
            self.scorer.tokenizer, pq, pd,
            max_length=self.max_length,
            query_max=self.scorer.query_max,
        )
        docs_arr = np.asarray(docs, dtype=object)
        dup = docs_arr[None, :] == docs_arr[:, None]
        return {
            "ids": jnp.asarray(ids), "mask": jnp.asarray(mask),
            "tt": jnp.asarray(tt), "dup": jnp.asarray(dup),
        }

    def fit(
        self,
        queries: Sequence[str],
        positives: Sequence[str],
        val_fraction: float = 0.1,
        checkpoint_dir: str | None = None,
        resume: bool = False,
        negatives: Sequence[Sequence[str]] | None = None,
    ) -> RerankerTrainResult:
        """``negatives`` (optional): per-example MINED hard negatives
        (e.g. stage-1 top candidates); when given, each step is a
        [B, 1+H] candidate-list softmax with the positive at column 0
        instead of the in-batch B x B matrix."""
        cfg = self.cfg
        if len(queries) < 8:
            raise ValueError(
                f"need at least 8 (question, passage) pairs, got "
                f"{len(queries)}"
            )
        n = len(queries)
        rng = np.random.default_rng(cfg.seed)
        order = rng.permutation(n)
        if negatives is not None:
            h = min(len(g) for g in negatives)
            if h < 1:
                raise ValueError("every example needs >=1 mined negative")
            negatives = [list(g)[:h] for g in negatives]
            # pairs/step = bs * (1+h): keep the program within the same
            # budget as the capped B^2 mode
            bs = min(cfg.batch_size, max(2, 256 // (1 + h)),
                     max(2, n // 4))

            def make_batch(sel):
                return self._hard_batch(
                    [queries[i] for i in sel],
                    [positives[i] for i in sel],
                    [negatives[i] for i in sel],
                )
        else:
            # every step scores B^2 PAIRS in one forward — quadratic,
            # unlike the linear trainers — so the config's (linear)
            # batch_size must be capped: 16 -> 256 pair forwards/step;
            # the config default of 128 would be a 16k-pair program
            # (~50 GB of attention scores)
            bs = min(cfg.batch_size, 16, max(2, n // 4))
            if bs < cfg.batch_size:
                log.info(
                    "[reranker] listwise batch capped at %d queries "
                    "(%d^2 = %d pairs/step; config asked %d)",
                    bs, bs, bs * bs, cfg.batch_size,
                )

            def make_batch(sel):
                return self._pair_batch(
                    [queries[i] for i in sel],
                    [positives[i] for i in sel],
                )

        n_val = max(bs, int(n * val_fraction))
        val_idx, train_idx = order[:n_val], order[n_val:]
        val_batch = make_batch(val_idx[:bs])

        params = self.scorer.params
        opt_state = self.tx.init(params)
        best_val = float("inf")
        best = params
        start_epoch = 0
        if resume and checkpoint_dir and os.path.isdir(checkpoint_dir):
            from .trainer import restore_training_state

            params, opt_state, best_val, start_epoch = (
                restore_training_state(checkpoint_dir, self.tx, params)
            )
            best = params
            log.info(
                "[reranker] resumed from %s at epoch %d (best val %.4f)",
                checkpoint_dir, start_epoch, best_val,
            )
        history = []
        for epoch in range(start_epoch, cfg.epochs):
            rng.shuffle(train_idx)
            losses = []
            for s in range(0, len(train_idx) - bs + 1, bs):
                batch = make_batch(train_idx[s:s + bs])
                params, opt_state, lv = self._train_step(
                    params, opt_state, batch
                )
                losses.append(float(lv))
            val_loss = float(self._eval_step(params, val_batch))
            train_loss = float(np.mean(losses)) if losses else float("nan")
            history.append((epoch, train_loss, val_loss))
            log.info("[reranker] epoch %d train %.4f val %.4f",
                     epoch, train_loss, val_loss)
            if val_loss < best_val:
                best_val = val_loss
                best = params
                if checkpoint_dir:
                    from .trainer import save_checkpoint

                    save_checkpoint(checkpoint_dir, {
                        "params": best, "opt_state": opt_state,
                        "epoch": epoch, "best_val": best_val,
                    })
        self.scorer.params = best
        return RerankerTrainResult(
            params=best, history=history, best_val_loss=best_val
        )


def main(argv=None) -> int:
    import argparse

    from ..data import get_examples
    from ..data.tokenizer import resolve_tokenizer
    from ..models.encoder.convert import save_params
    from ..retrieval.reranker import (
        reranker_checkpoint_path,
        save_reranker_meta,
    )
    from ..utils import apply_overrides, init_logger, load_config, set_seed

    p = argparse.ArgumentParser(
        description="train the cross-encoder reranker"
    )
    p.add_argument("--config", default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--max_length", type=int, default=128)
    p.add_argument("--resume", action="store_true",
                   help="continue from the reranker_train Orbax checkpoint")
    p.add_argument("--set", nargs="*", default=[], metavar="a.b=v")
    args = p.parse_args(argv)

    cfg = apply_overrides(load_config(args.config), args.set)
    loggers = init_logger(cfg.logging)
    set_seed(cfg.training.seed, cfg.training.deterministic)

    examples = get_examples(cfg)
    queries = [ex["question"] for ex in examples]
    positives = [ex["context"] for ex in examples]
    loggers.train.info("reranker training on %d pairs", len(queries))

    # the SAME resolution order as the pipeline's encoder (vocab.txt >
    # tokenizer.json > train) — training under a different vocabulary
    # than serving would silently scramble every embedding lookup
    tokenizer = resolve_tokenizer(
        cfg.paths.data_dir, cfg.encoder.vocab_size, positives
    )

    scorer = CrossEncoderScorer(tokenizer, cfg.encoder, seed=3)
    tcfg = cfg.training
    if args.epochs is not None:
        tcfg = dataclasses.replace(tcfg, epochs=args.epochs)
    if args.batch_size is not None:
        tcfg = dataclasses.replace(tcfg, batch_size=args.batch_size)
    trainer = RerankerTrainer(scorer, tcfg, max_length=args.max_length)
    res = trainer.fit(
        queries, positives,
        checkpoint_dir=os.path.join(
            cfg.paths.checkpoints_dir, "reranker_train"
        ),
        resume=args.resume,
    )
    out = reranker_checkpoint_path(cfg)
    save_params(res.params, out)
    # pin trained pair length + vocabulary identity for the serving side
    save_reranker_meta(cfg, tokenizer, args.max_length, scorer.query_max)
    loggers.train.info(
        "reranker trained: best val %.4f -> %s", res.best_val_loss, out
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
