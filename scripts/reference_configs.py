"""Run the five BASELINE.json reproduction configs end to end.

1. ae=none: raw embeddings, brute-force (exact) cosine top-10;
2. DAE with latent_dim = input/3 (the 384→128 shape), cosine, recall gap
   vs uncompressed;
3. VAE latent with euclidean AND Mahalanobis similarity variants;
4. CAE side-by-side with the BM25 sparse baseline;
5. MS-MARCO-scale latent index sharded over the mesh with all-gather merge
   (synthetic latents; delegates to the sharded search path).

Dataset: real SQuAD via the HF hub when reachable, otherwise the synthetic
offline corpus (`--dataset` overrides, e.g. `cloze:/path/corpus.json`).
Writes one experiments.csv row per run plus a summary table.

  python scripts/reference_configs.py --dataset synthetic --n 400
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

# honor JAX_PLATFORMS=cpu: the axon sitecustomize force-selects the
# TPU via jax.config AFTER import (CLAUDE.md)
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--n", type=int, default=400)
    p.add_argument("--workdir", default="/tmp/latentrag_refconfigs")
    p.add_argument("--encoder_epochs", type=int, default=6)
    p.add_argument("--ae_epochs", type=int, default=12)
    p.add_argument("--scale_n", type=int, default=100_000)
    p.add_argument("--hidden", type=int, default=96,
                   help="encoder dim (384 with converted real weights)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from latentrag_tpu.data import get_examples, load_evaluation_data
    from latentrag_tpu.evaluation import evaluate_retrieval
    from latentrag_tpu.pipeline import PipelineRunner
    from latentrag_tpu.retrieval import BM25Retriever
    from latentrag_tpu.training.train import main as ae_main
    from latentrag_tpu.training.train_encoder import main as enc_main
    from latentrag_tpu.utils import apply_overrides, load_config

    wd = args.workdir
    h = args.hidden
    latent_third = max(8, h // 3)  # the 384→128 proportion
    latent_sixth = max(8, h // 6)  # the 384→64 proportion
    base = [
        f"data.dataset={args.dataset}", f"data.max_samples={args.n}",
        f"encoder.vocab_size=6000", f"encoder.hidden_dim={h}",
        "encoder.num_layers=2", "encoder.num_heads=4",
        f"encoder.mlp_dim={2 * h}", "encoder.max_length=64",
        "encoder.dtype=float32",
        f"models.vae.input_dim={h}", f"models.vae.latent_dim={latent_sixth}",
        f"models.vae.hidden_dim={h}",
        f"models.dae.input_dim={h}", f"models.dae.latent_dim={latent_third}",
        f"models.dae.hidden_dim={h}",
        f"models.cae.input_dim={h}", f"models.cae.latent_dim={latent_sixth}",
        f"models.cae.hidden_dim={h}",
        "retrieval.index_path=", "retrieval.top_k=10",
        f"paths.data_dir={wd}/data", f"paths.checkpoints_dir={wd}/ckpt",
        f"paths.logs_dir={wd}/logs", f"logging.log_file={wd}/logs/run.log",
    ]

    enc_main(["--epochs", str(args.encoder_epochs), "--batch_size", "64",
              "--max_length", "64", "--set"] + base)
    for ae in ("vae", "dae", "cae"):
        ae_main(["--ae_type", ae, "--epochs", str(args.ae_epochs),
                 "--set"] + base)

    cfg0 = apply_overrides(load_config(None), base)
    examples = get_examples(cfg0)
    queries, corpus, relevant = load_evaluation_data(examples)
    print(f"[refconfigs] |queries|={len(queries)} |corpus|={len(corpus)}",
          file=sys.stderr)

    rows: list[tuple[str, dict]] = []

    def run(label, extra, ae):
        cfg = apply_overrides(load_config(None), base + extra)
        runner = PipelineRunner(cfg, ae_type=ae)
        res = runner.process(queries, corpus, relevant)
        rows.append((label, res["retrieval_metrics"]))
        return res

    # 1. uncompressed brute-force cosine
    run("1. none / exact cosine", ["retrieval.kernel=xla_exact"], "none")
    # 2. DAE h->h/3, cosine (recall gap vs config 1)
    run(f"2. dae {h}->{latent_third} cosine",
        ["retrieval.kernel=xla_exact"], "dae")
    # 3. VAE latent, euclidean and mahalanobis
    run("3a. vae euclidean",
        ["retrieval.kernel=xla_exact", "retrieval.metric=euclidean"], "vae")
    run("3b. vae mahalanobis",
        ["retrieval.kernel=xla_exact", "retrieval.metric=mahalanobis"], "vae")
    # 4. CAE vs BM25
    run("4a. cae cosine", ["retrieval.kernel=xla_exact"], "cae")
    bm = BM25Retriever()
    bm.build_index(corpus)
    _, bi = bm.search(queries, 10)
    rows.append((
        "4b. bm25",
        evaluate_retrieval([r.tolist() for r in bi], list(relevant)),
    ))

    # 5. sharded latent index with all-gather merge
    from latentrag_tpu.ops import l2_normalize
    from latentrag_tpu.parallel import make_mesh, make_sharded_topk, shard_rows

    mesh = make_mesh()
    nd = mesh.shape["data"]
    latents = l2_normalize(jax.random.normal(
        jax.random.PRNGKey(0), (args.scale_n, latent_sixth), jnp.float32))
    qs = l2_normalize(jax.random.normal(
        jax.random.PRNGKey(1), (256, latent_sixth), jnp.float32))
    search = make_sharded_topk(mesh, k=10, metric="cosine", backend="exact")
    s, i = search(qs, shard_rows(latents, mesh), jnp.int32(args.scale_n))
    # self-consistency: searching corpus rows retrieves themselves
    probe_s, probe_i = search(latents[:64], shard_rows(latents, mesh),
                              jnp.int32(args.scale_n))
    self_hit = float((np.asarray(probe_i)[:, 0] == np.arange(64)).mean())
    rows.append((
        f"5. sharded {args.scale_n:,}x{latent_sixth} over {nd} dev",
        {"self-retrieval@1": {"mean": self_hit, "std": 0.0}},
    ))

    print(f"\n# BASELINE.json reproduction configs — dataset "
          f"{args.dataset}, encoder {h}-d (trained offline)\n")
    print("| config | " + " | ".join(
        ["Recall@10", "MRR@10", "nDCG@10"]) + " |")
    print("|---|---|---|---|")
    for label, metrics in rows:
        cells = []
        for name in ("Recall@10", "MRR@10", "nDCG@10"):
            m = metrics.get(name)
            cells.append(f"{m['mean']:.4f}" if m else "—")
        extra = "".join(
            f" {k}={v['mean']:.3f}" for k, v in metrics.items()
            if k not in ("Recall@10", "MRR@10", "nDCG@10")
        )
        print(f"| {label}{extra} | " + " | ".join(cells) + " |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
