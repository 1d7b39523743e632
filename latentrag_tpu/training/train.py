"""Training CLI for the autoencoder variants.

Replaces the reference's three per-variant scripts (``training/train_vae.py:
90-134`` etc.) with one entry point; flags override YAML (same precedence).

Usage:
  python -m latentrag_tpu.training.train --ae_type vae --config configs/default.yaml
  python -m latentrag_tpu.training.train --ae_type cae --epochs 10 --batch_size 64
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

import numpy as np

from ..data import (
    WordPieceTokenizer,
    get_examples,
    prepare_training_arrays,
    split_dataset,
)
from ..models import build_autoencoder
from ..models.encoder import SentenceEncoder
from ..retrieval import EmbeddingCompressor
from ..utils import (
    apply_overrides,
    canonical_ae_type,
    init_logger,
    load_config,
    set_seed,
)
from .trainer import Trainer


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="train a latent autoencoder")
    p.add_argument("--config", default=None)
    p.add_argument("--ae_type", required=True)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--learning_rate", type=float, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--resume", action="store_true",
                   help="continue from the Orbax checkpoint (params + "
                        "optimizer state + epoch)")
    p.add_argument("--set", nargs="*", default=[], metavar="a.b=v")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    cfg = load_config(args.config)
    cfg = apply_overrides(cfg, args.set)
    # CLI flags override YAML (ref ``train_vae.py:127-129``)
    tr = cfg.training
    updates = {}
    if args.epochs is not None:
        updates["epochs"] = args.epochs
    if args.batch_size is not None:
        updates["batch_size"] = args.batch_size
    if args.learning_rate is not None:
        updates["learning_rate"] = args.learning_rate
    if args.seed is not None:
        updates["seed"] = args.seed
    if updates:
        tr = dataclasses.replace(tr, **updates)
        cfg = dataclasses.replace(cfg, training=tr)

    loggers = init_logger(cfg.logging)
    set_seed(cfg.training.seed, cfg.training.deterministic)
    ae_type = canonical_ae_type(args.ae_type)
    if ae_type == "none":
        raise SystemExit("--ae_type none has nothing to train")

    # CAE gets the reference's extra regularisation defaults if unset
    if ae_type == "cae" and cfg.training.weight_decay == 0.0:
        cfg = dataclasses.replace(
            cfg,
            training=dataclasses.replace(
                cfg.training,
                weight_decay=1e-4,
                grad_clip_norm=1.0,
                lr_plateau_factor=0.5,
                early_stop_relative=True,
                early_stop_min_delta=0.003,
            ),
        )

    examples = get_examples(cfg, split="train")
    corpus_texts = [e["context"] for e in examples]

    tok_path = os.path.join(cfg.paths.data_dir, "tokenizer.json")
    if os.path.exists(tok_path):
        tokenizer = WordPieceTokenizer.load(tok_path)
    else:
        tokenizer = WordPieceTokenizer.train_from_corpus(
            corpus_texts, vocab_size=cfg.encoder.vocab_size
        )
        os.makedirs(cfg.paths.data_dir, exist_ok=True)
        tokenizer.save(tok_path)
    encoder = SentenceEncoder(tokenizer, cfg.encoder)
    compressor = EmbeddingCompressor(encoder, batch_size=cfg.encoder.batch_size)

    loggers.train.info("preparing %s training arrays (%d examples)",
                       ae_type, len(examples))
    data = prepare_training_arrays(
        examples,
        compressor,
        tokenizer,
        ae_type,
        cache_dir=os.path.join(cfg.paths.data_dir, "emb_cache"),
        noise_std=cfg.data.dae_noise_std,
        max_jaccard=cfg.data.negative_jaccard_max,
        seed=cfg.training.seed,
        model_name=cfg.encoder.name,
        mine_hard_negatives=(
            ae_type == "cae" and cfg.training.mine_hard_negatives
        ),
    )
    train_data, val_data = split_dataset(
        data, cfg.data.val_split, cfg.training.seed
    )

    acfg = cfg.models.for_type(ae_type)
    model = build_autoencoder(ae_type, acfg)
    trainer = Trainer(model, ae_type, cfg.training)
    ckpt_dir = os.path.join(
        cfg.paths.checkpoints_dir, acfg.checkpoint or ae_type
    )
    result = trainer.fit(train_data, val_data, checkpoint_dir=ckpt_dir,
                         resume=args.resume)
    loggers.train.info(
        "done: best val %.5f after %d epochs (early stop: %s) -> %s",
        result.best_val_loss, result.epochs_ran, result.stopped_early,
        ckpt_dir,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
