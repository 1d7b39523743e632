"""Cross-encoder reranking on the REAL reference corpus (round-5 headline).

Round 4 demonstrated `retrieval.rerank=cross` only on a 120-doc synthetic
toy with a deliberately weak stage-1 (docs/RESULTS.md). This script
measures the quality uplift on the reference's 2,835 shipped chunk texts
(`faiss_chunks.faiss.meta.json` — the corpus docs/REFERENCE_PARITY.md §2
evaluates), with the two-stage config an operator would actually run:
`retrieval.top_k=10`, `retrieval.rerank_candidates=40`.

Protocol:

1. train the parity encoder (2-layer 384-d tower) on the corpus — the
   same recipe as scripts/reference_parity.py;
2. MINE each training pair's stage-1 top candidates as hard negatives
   (the serving distribution; the in-batch-random recipe measured an
   active quality LOSS against a 0.98-recall stage 1 — docs/RESULTS.md
   r5 run 1) and train the cross-encoder on [B, 1+H] candidate lists.
   Training pairs use a DIFFERENT cloze rng seed than the eval queries,
   with exact question collisions dropped — eval snippets are unseen;
3. evaluate Recall@10 / MRR@10 / nDCG@10 with rerank=none vs
   rerank=cross for stage-1 = raw 384-d and stage-1 = the reference's
   OWN converted VAE-64 weights (the compressed tier whose stage-1
   recall has the most headroom — the framework's latent-compression +
   rerank story end to end).

  python scripts/rerank_parity.py                  # chip, ~45 min
  JAX_PLATFORMS=cpu python scripts/rerank_parity.py --queries 60 \
      --encoder_epochs 1 --reranker_epochs 2 --train_pairs 200  # smoke
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_META = "/root/reference/data/index/faiss_chunks.faiss.meta.json"
REF_VAE = "/root/reference/models/checkpoints/vae_text.pth"


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/latentrag_rerank_parity")
    p.add_argument("--out", default=None,
                   help="append the markdown table to this file")
    p.add_argument("--json-out", default="logs/rerank_parity.json")
    p.add_argument("--queries", type=int, default=1200)
    p.add_argument("--train_pairs", type=int, default=2835)
    p.add_argument("--encoder_epochs", type=int, default=6)
    p.add_argument("--reranker_epochs", type=int, default=6)
    p.add_argument("--reranker_batch", type=int, default=16)
    p.add_argument("--max_length", type=int, default=96)
    p.add_argument("--candidates", type=int, default=40)
    p.add_argument("--reranker_lr", type=float, default=None,
                   help="override training.learning_rate for the "
                        "reranker only (from-scratch cross-encoders "
                        "need ~2e-3 to learn in a few k steps)")
    p.add_argument("--hard_negatives", type=int, default=15,
                   help="stage-1 top candidates mined as training "
                        "negatives per pair")
    args = p.parse_args(argv)

    import jax

    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    from latentrag_tpu.data import load_evaluation_data
    from latentrag_tpu.data.squad import cloze_examples
    from latentrag_tpu.data.tokenizer import resolve_tokenizer
    from latentrag_tpu.models.encoder.convert import save_params
    from latentrag_tpu.models.encoder.cross import CrossEncoderScorer
    from latentrag_tpu.pipeline import PipelineRunner
    from latentrag_tpu.retrieval.reranker import (
        reranker_checkpoint_path,
        save_reranker_meta,
    )
    from latentrag_tpu.training.train_encoder import main as enc_main
    from latentrag_tpu.training.train_reranker import RerankerTrainer
    from latentrag_tpu.utils import apply_overrides, load_config

    wd = args.workdir
    os.makedirs(wd, exist_ok=True)

    with open(REF_META) as f:
        texts = json.load(f)["texts"]
    corpus_json = os.path.join(wd, "ref_chunks.json")
    with open(corpus_json, "w") as f:
        json.dump(texts, f)
    print(f"[rerank] {len(texts)} reference chunk texts", file=sys.stderr)

    h = 384
    base = [
        f"data.dataset=cloze:{corpus_json}",
        f"data.max_samples={args.queries}",
        "encoder.vocab_size=8000", f"encoder.hidden_dim={h}",
        "encoder.num_layers=2", "encoder.num_heads=4",
        f"encoder.mlp_dim={2 * h}", "encoder.max_length=64",
        "encoder.dtype=float32",
        f"models.vae.input_dim={h}", "models.vae.latent_dim=64",
        "models.vae.hidden_dim=512",
        f"models.vae.checkpoint={REF_VAE}",
        "retrieval.index_path=", "retrieval.top_k=10",
        "retrieval.kernel=xla_exact",
        f"retrieval.rerank_candidates={args.candidates}",
        f"paths.data_dir={wd}/data", f"paths.checkpoints_dir={wd}/ckpt",
        f"paths.logs_dir={wd}/logs", f"logging.log_file={wd}/logs/run.log",
    ]

    t0 = time.time()
    enc_main(["--epochs", str(args.encoder_epochs), "--batch_size", "64",
              "--max_length", "64", "--set"] + base)
    print(f"[rerank] encoder trained ({time.time() - t0:.0f}s)",
          file=sys.stderr)

    cfg = apply_overrides(load_config(None), base)

    # eval queries: seed 0 — the exact REFERENCE_PARITY.md §2 draw
    examples = cloze_examples(texts, max_samples=args.queries, seed=0)
    queries, corpus, relevant = load_evaluation_data(examples)
    eval_qs = set(queries)

    # reranker training pairs: a different rng (seed 7) samples different
    # snippet spans; drop any exact collision with an eval query so every
    # eval snippet is unseen
    train_ex = cloze_examples(texts, max_samples=args.train_pairs, seed=7)
    train_ex = [ex for ex in train_ex if ex["question"] not in eval_qs]
    tq = [ex["question"] for ex in train_ex]
    tp = [ex["context"] for ex in train_ex]
    print(f"[rerank] |eval|={len(queries)} |train_pairs|={len(tq)} "
          f"(collisions dropped: "
          f"{args.train_pairs - len(tq) if len(train_ex) < args.train_pairs else 0})",
          file=sys.stderr)

    tokenizer = resolve_tokenizer(
        cfg.paths.data_dir, cfg.encoder.vocab_size, tp
    )

    # mine HARD negatives with the trained stage-1 encoder: the
    # reranker's serving job is discriminating among stage-1's top
    # candidates, so that is the distribution it must train on (the
    # in-batch-random recipe measured an active quality LOSS on this
    # corpus — docs/RESULTS.md r5)
    import numpy as np

    from latentrag_tpu.models.encoder.convert import load_params
    from latentrag_tpu.models.encoder.minilm import SentenceEncoder

    probe = SentenceEncoder(tokenizer, cfg.encoder, seed=0)
    enc = SentenceEncoder(
        tokenizer, cfg.encoder,
        params=load_params(
            os.path.join(cfg.paths.checkpoints_dir, "encoder.msgpack"),
            probe.params,
        ),
    )
    emb_c = np.asarray(enc.encode_batch(texts), np.float32)
    emb_q = np.asarray(enc.encode_batch(tq), np.float32)
    sims = emb_q @ emb_c.T  # [n_train, n_corpus]
    h = args.hard_negatives
    negs = []
    for i in range(len(tq)):
        cand = np.argsort(-sims[i])
        row = []
        for c in cand:
            if texts[c] != tp[i]:
                row.append(texts[c])
                if len(row) == h:
                    break
        negs.append(row)
    print(f"[rerank] mined {h} stage-1 hard negatives per pair",
          file=sys.stderr)

    scorer = CrossEncoderScorer(tokenizer, cfg.encoder, seed=3)
    tcfg = dataclasses.replace(
        cfg.training, epochs=args.reranker_epochs,
        batch_size=args.reranker_batch,
        **({"learning_rate": args.reranker_lr}
           if args.reranker_lr else {}),
    )
    t0 = time.time()
    trainer = RerankerTrainer(scorer, tcfg, max_length=args.max_length)
    res = trainer.fit(tq, tp, negatives=negs, checkpoint_dir=os.path.join(
        cfg.paths.checkpoints_dir, "reranker_train"))
    save_params(res.params, reranker_checkpoint_path(cfg))
    save_reranker_meta(cfg, tokenizer, args.max_length, scorer.query_max)
    print(f"[rerank] reranker trained ({time.time() - t0:.0f}s, "
          f"best val {res.best_val_loss:.4f})", file=sys.stderr)

    rows = []
    out_json = {"n_corpus": len(texts), "n_eval": len(queries),
                "n_train_pairs": len(tq), "candidates": args.candidates,
                "reranker_epochs": args.reranker_epochs,
                "best_val_loss": round(res.best_val_loss, 4), "rows": []}
    for ae in ("none", "vae"):
        for rr in ("none", "cross"):
            rcfg = apply_overrides(cfg, [f"retrieval.rerank={rr}"])
            runner = PipelineRunner(rcfg, ae_type=ae)
            t0 = time.time()
            r = runner.process(queries, corpus, relevant)
            m = r["retrieval_metrics"]
            label = ("none (384-d raw)" if ae == "none"
                     else "vae-64 (reference .pth)")
            label += (" + cross-encoder" if rr == "cross" else "")
            rows.append((label, m))
            out_json["rows"].append({
                "stage1": ae, "rerank": rr,
                "recall10": round(m["Recall@10"]["mean"], 4),
                "mrr10": round(m["MRR@10"]["mean"], 4),
                "ndcg10": round(m["nDCG@10"]["mean"], 4),
                "rerank_s": round(r["timings"].get("rerank_s", 0.0), 2),
                "wall_s": round(time.time() - t0, 1),
            })
            print(f"[rerank] {label}: R@10="
                  f"{m['Recall@10']['mean']:.4f} "
                  f"MRR={m['MRR@10']['mean']:.4f} "
                  f"nDCG={m['nDCG@10']['mean']:.4f} "
                  f"({time.time() - t0:.0f}s)", file=sys.stderr)

    lines = [
        "| system | Recall@10 | MRR@10 | nDCG@10 |",
        "|---|---|---|---|",
    ]
    for label, m in rows:
        lines.append(
            f"| {label} | {m['Recall@10']['mean']:.4f} "
            f"| {m['MRR@10']['mean']:.4f} "
            f"| {m['nDCG@10']['mean']:.4f} |"
        )
    table = "\n".join(lines)
    print(table)
    if args.json_out:
        os.makedirs(os.path.dirname(args.json_out) or ".", exist_ok=True)
        with open(args.json_out, "w") as f:
            json.dump(out_json, f, indent=1)
    if args.out:
        with open(args.out, "a") as f:
            f.write("\n" + table + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
