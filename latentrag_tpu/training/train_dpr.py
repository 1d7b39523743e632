"""DPR dual-encoder training: separate question/context towers, in-batch
InfoNCE (Karpukhin et al. 2020).

Completes the reference's DPR baseline (``retrieval/dpr.py:5-32``) as a
trainable system instead of hub-gated frozen weights: the reference can only
*load* facebook-dpr checkpoints; here the two towers train offline on
(question, positive-passage) pairs from any dataset mode, and converted HF
DPR weights (BERT geometry, CLS pooling — ``models/encoder/convert.py``)
drop in when the hub is reachable.

TPU notes: both towers' batches run as ONE fused forward each per step; the
similarity matrix is [B, B] fp32; sequences pad to a fixed length so the
step compiles once.

  python -m latentrag_tpu.training.train_dpr --epochs 5 --set \\
      data.dataset=synthetic data.max_samples=200
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

from ..models.encoder.minilm import SentenceEncoder
from ..utils.config import TrainingConfig
from .train_encoder import info_nce_loss

log = logging.getLogger("latentrag.train")


@dataclasses.dataclass
class DPRTrainResult:
    q_params: dict
    c_params: dict
    history: list
    best_val_loss: float


class DualEncoderTrainer:
    """Train a question tower and a context tower jointly with InfoNCE."""

    def __init__(
        self,
        q_encoder: SentenceEncoder,
        c_encoder: SentenceEncoder,
        cfg: TrainingConfig | None = None,
        max_length: int = 64,
        temperature: float = 0.05,
    ):
        self.q_encoder = q_encoder
        self.c_encoder = c_encoder
        self.cfg = cfg or TrainingConfig(batch_size=32, epochs=5)
        self.max_length = max_length
        self.tx = optax.adamw(self.cfg.learning_rate, weight_decay=1e-4)
        q_mod, c_mod = q_encoder.module, c_encoder.module
        temp = temperature

        def loss_fn(params, batch):
            zq = q_mod.apply(
                {"params": params["q"]}, batch["q_ids"], batch["q_mask"]
            )
            zp = c_mod.apply(
                {"params": params["c"]}, batch["p_ids"], batch["p_mask"]
            )
            p = batch["p_ids"]
            dup = jnp.all(p[:, None, :] == p[None, :, :], axis=-1)
            return info_nce_loss(zq, zp, temp, dup_mask=dup)

        @jax.jit
        def train_step(params, opt_state, batch):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        self._train_step = train_step
        self._eval_step = jax.jit(loss_fn)

    def _tokenize(self, queries: Sequence[str], positives: Sequence[str]):
        def enc(tok, texts):
            ids, mask = tok.encode_batch(list(texts), self.max_length)
            if ids.shape[1] < self.max_length:
                pad = self.max_length - ids.shape[1]
                ids = np.pad(ids, ((0, 0), (0, pad)),
                             constant_values=tok.pad_id)
                mask = np.pad(mask, ((0, 0), (0, pad)))
            return ids, mask

        q_ids, q_mask = enc(self.q_encoder.tokenizer, queries)
        p_ids, p_mask = enc(self.c_encoder.tokenizer, positives)
        return {"q_ids": q_ids, "q_mask": q_mask,
                "p_ids": p_ids, "p_mask": p_mask}

    def fit(
        self,
        queries: Sequence[str],
        positives: Sequence[str],
        val_fraction: float = 0.1,
        checkpoint_dir: str | None = None,
        resume: bool = False,
    ) -> DPRTrainResult:
        """Train both towers; with ``checkpoint_dir`` every improvement
        persists params + optimizer state + epoch (Orbax), and
        ``resume=True`` continues a preempted run from the last saved
        improvement (same convention as the AE/encoder trainers)."""
        import os as _os

        cfg = self.cfg
        if len(queries) < 8:
            raise ValueError(
                f"need at least 8 (question, passage) pairs, got "
                f"{len(queries)}"
            )
        data = self._tokenize(queries, positives)
        n = data["q_ids"].shape[0]
        rng = np.random.default_rng(cfg.seed)
        order = rng.permutation(n)
        n_val = max(2, int(n * val_fraction))
        val_idx, train_idx = order[:n_val], order[n_val:]
        val_batch = {k: jnp.asarray(v[val_idx]) for k, v in data.items()}

        params = {"q": self.q_encoder.params, "c": self.c_encoder.params}
        opt_state = self.tx.init(params)
        best_val = float("inf")
        best = params
        start_epoch = 0
        if resume and checkpoint_dir and _os.path.isdir(checkpoint_dir):
            from .trainer import restore_training_state

            params, opt_state, best_val, start_epoch = (
                restore_training_state(checkpoint_dir, self.tx, params)
            )
            best = params
            log.info("[dpr] resumed from %s at epoch %d (best val %.4f)",
                     checkpoint_dir, start_epoch, best_val)
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
            log.info("[dpr] epoch %d train %.4f val %.4f",
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
        self.q_encoder.params = best["q"]
        self.c_encoder.params = best["c"]
        return DPRTrainResult(
            q_params=best["q"], c_params=best["c"], history=history,
            best_val_loss=best_val,
        )


def build_dpr_encoders(cfg, corpus_texts=None):
    """(q_encoder, c_encoder) from saved tower checkpoints when present
    (``dpr_question.msgpack`` / ``dpr_context.msgpack`` + the shared
    tokenizer), else self-initialised towers over a corpus-trained
    tokenizer — the capability stays exercisable fully offline."""
    import dataclasses as dc

    from ..data.tokenizer import resolve_tokenizer
    from ..models.encoder.convert import load_params

    # shared resolution order with the pipeline encoder/reranker
    # (vocab.txt > tokenizer.json > train) — see data.tokenizer
    tokenizer = resolve_tokenizer(
        cfg.paths.data_dir, cfg.encoder.vocab_size, corpus_texts or []
    )
    ecfg = dc.replace(cfg.encoder, pooling="cls", normalize=False)
    q_enc = SentenceEncoder(tokenizer, ecfg, seed=1)
    c_enc = SentenceEncoder(tokenizer, ecfg, seed=2)
    for enc, name in ((q_enc, "dpr_question"), (c_enc, "dpr_context")):
        path = os.path.join(cfg.paths.checkpoints_dir, f"{name}.msgpack")
        if os.path.exists(path):
            enc.params = load_params(path, enc.params)
            log.info("loaded %s weights: %s", name, path)
    return q_enc, c_enc


def main(argv=None) -> int:
    import argparse

    from ..data import get_examples
    from ..models.encoder.convert import save_params
    from ..utils import apply_overrides, init_logger, load_config, set_seed

    p = argparse.ArgumentParser(description="train DPR dual towers")
    p.add_argument("--config", default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--max_length", type=int, default=64)
    p.add_argument("--resume", action="store_true",
                   help="continue from the dpr_train Orbax checkpoint")
    p.add_argument("--set", nargs="*", default=[], metavar="a.b=v")
    args = p.parse_args(argv)

    cfg = apply_overrides(load_config(args.config), args.set)
    loggers = init_logger(cfg.logging)
    set_seed(cfg.training.seed, cfg.training.deterministic)

    examples = get_examples(cfg)
    queries = [ex["question"] for ex in examples]
    positives = [ex["context"] for ex in examples]
    loggers.train.info("DPR training on %d pairs", len(queries))

    q_enc, c_enc = build_dpr_encoders(cfg, corpus_texts=positives)
    tcfg = cfg.training
    if args.epochs is not None:
        tcfg = dataclasses.replace(tcfg, epochs=args.epochs)
    if args.batch_size is not None:
        tcfg = dataclasses.replace(tcfg, batch_size=args.batch_size)
    trainer = DualEncoderTrainer(
        q_enc, c_enc, tcfg, max_length=args.max_length
    )
    res = trainer.fit(
        queries, positives,
        checkpoint_dir=os.path.join(cfg.paths.checkpoints_dir, "dpr_train"),
        resume=args.resume,
    )
    os.makedirs(cfg.paths.checkpoints_dir, exist_ok=True)
    qp = os.path.join(cfg.paths.checkpoints_dir, "dpr_question.msgpack")
    cp = os.path.join(cfg.paths.checkpoints_dir, "dpr_context.msgpack")
    save_params(res.q_params, qp)
    save_params(res.c_params, cp)
    loggers.train.info(
        "DPR towers trained: best val %.4f -> %s, %s",
        res.best_val_loss, qp, cp,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
