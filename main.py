"""latentrag-tpu pipeline CLI.

Parity with the reference driver (``main.py:368-429``): two-phase parse
(config pre-loaded so ``--ae_type all`` expands against it), per-variant
pipeline runs, run cards, experiment CSV rows with baseline speedup columns.

Usage:
  python main.py --config configs/default.yaml --ae_type vae
  python main.py --ae_type all --set retrieval.top_k=20 data.dataset=synthetic
"""

from __future__ import annotations

import argparse
import sys

from latentrag_tpu.data import get_examples, load_evaluation_data
from latentrag_tpu.pipeline import PipelineRunner
from latentrag_tpu.utils import (
    apply_overrides,
    canonical_ae_type,
    init_logger,
    load_config,
    set_seed,
)
from latentrag_tpu.utils.experiment_log import append_csv_row, build_metrics_row

AE_CHOICES = ("none", "vae", "dae", "cae", "contrastive", "all")


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="latentrag-tpu RAG pipeline")
    p.add_argument("--config", default=None, help="YAML config path")
    p.add_argument("--ae_type", default="none", choices=AE_CHOICES)
    p.add_argument("--generate", action="store_true",
                   help="run LLM answer generation")
    p.add_argument("--benchmark", nargs="*", metavar="SYSTEM",
                   help="run the multi-system benchmark instead of the "
                        "pipeline (default systems: bm25 sbert)")
    p.add_argument("--tag", default="run", help="experiment CSV tag")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler device trace of the "
                        "pipeline run into DIR (TensorBoard-loadable)")
    p.add_argument("--set", nargs="*", default=[], metavar="a.b=v",
                   help="config overrides")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    cfg = load_config(args.config)
    cfg = apply_overrides(cfg, args.set)
    loggers = init_logger(cfg.logging)
    set_seed(cfg.training.seed, cfg.training.deterministic)

    loggers.main.info("loading dataset %r", cfg.data.dataset)
    if cfg.data.dataset.startswith("msmarco"):
        # 'msmarco' (hub) or 'msmarco:<local.jsonl>' — corpus keeps every
        # passage (positives AND distractors), so it doesn't fit the
        # example->dedup shape of load_evaluation_data
        from latentrag_tpu.data.msmarco import load_msmarco_eval

        _, _, src = cfg.data.dataset.partition(":")
        queries, corpus, relevant = load_msmarco_eval(
            max_queries=cfg.data.max_samples, source=src or None
        )
        gold = None
    else:
        examples = get_examples(cfg, split="validation"
                                if cfg.data.dataset == "squad" else "train")
        queries, corpus, relevant, gold = load_evaluation_data(
            examples, with_answers=True
        )
    loggers.main.info("|queries|=%d |corpus|=%d", len(queries), len(corpus))

    if args.benchmark is not None:
        # working replacement for the reference's parsed-but-unused
        # --benchmark flag (SURVEY §2.2)
        from latentrag_tpu.evaluation import run_benchmark

        systems = tuple(args.benchmark) or ("bm25", "sbert")
        out = run_benchmark(cfg, queries, corpus, relevant, systems=systems,
                            generate=args.generate, gold_answers=gold)
        for system, res in out.items():
            if system == "_deltas":
                loggers.main.info("pairwise deltas: %s", res)
            elif "metrics" in res:
                loggers.main.info("%s: %s", system, {
                    m: round(v["mean"], 4) for m, v in res["metrics"].items()
                })
            else:
                loggers.main.info("%s: ERROR %s", system, res.get("error"))
        return 0

    mesh = None
    if cfg.retrieval.shard_corpus:
        from latentrag_tpu.parallel import make_mesh

        mesh = make_mesh()
        loggers.main.info("sharding corpus over %d devices", mesh.size)

    variants = (
        ["vae", "dae", "cae"]
        if args.ae_type == "all"
        else [canonical_ae_type(args.ae_type)]
    )
    for ae in variants:
        try:
            runner = PipelineRunner(cfg, ae_type=ae, generate=args.generate,
                                    mesh=mesh)
        except FileNotFoundError as e:
            loggers.main.error("%s", e)
            return 2
        if args.profile:
            from latentrag_tpu.utils.profiling import trace

            with trace(args.profile):
                result = runner.process(
                    queries, corpus, relevant,
                    gold_answers=gold if args.generate else None,
                )
        else:
            result = runner.process(
                queries, corpus, relevant,
                gold_answers=gold if args.generate else None,
            )
        runner.print_run_card(result)
        row = build_metrics_row(
            tag=args.tag,
            dataset=cfg.data.dataset,
            embedder=cfg.encoder.name,
            ae_type=ae,
            dim_in=result["dim_in"],
            dim_out=result["dim_out"],
            retriever=cfg.retrieval.backend,
            index_type=cfg.retrieval.kernel,
            metric_space=cfg.retrieval.metric,
            top_k=result["top_k"],
            candidate_k=result["candidate_k"],
            n_corpus=result["n_corpus"],
            retrieval_metrics=result["retrieval_metrics"],
            retriever_stats=result["retriever_stats"],
            logs_dir=cfg.paths.logs_dir,
            generation_metrics=result.get("generation_metrics"),
        )
        append_csv_row(
            row, f"{cfg.paths.logs_dir}/benchmarks/experiments.csv"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
