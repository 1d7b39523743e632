"""Batched retrieval/RAG server (stdin/stdout JSONL).

Production-serving surface: loads the configured encoder + AE + index once,
then serves queries in micro-batches — one JSON object per line in, one per
line out. Protocol:

  {"query": "...", "k": 5}                  -> retrieval
  {"query": "...", "k": 5, "generate": true} -> retrieval + LLM answer
  {"queries": ["...", "..."], "k": 5}       -> one batched device call

Usage:
  echo '{"query": "what do telescopes observe?"}' | \
      python serve.py --config configs/default.yaml --ae_type dae
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from latentrag_tpu.data import get_examples, load_evaluation_data
from latentrag_tpu.pipeline import PipelineRunner
from latentrag_tpu.utils import (
    apply_overrides,
    canonical_ae_type,
    init_logger,
    load_config,
)
from latentrag_tpu.retrieval import build_retriever


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="latentrag-tpu query server")
    p.add_argument("--config", default=None)
    p.add_argument("--ae_type", default="none")
    p.add_argument("--generate", action="store_true")
    p.add_argument("--set", nargs="*", default=[], metavar="a.b=v")
    args = p.parse_args(argv)

    cfg = apply_overrides(load_config(args.config), args.set)
    # stdout is the JSONL response channel — keep log lines on stderr
    loggers = init_logger(cfg.logging, stream=sys.stderr)

    examples = get_examples(cfg)
    _, corpus, _ = load_evaluation_data(examples)
    runner = PipelineRunner(
        cfg, ae_type=canonical_ae_type(args.ae_type), generate=args.generate
    )
    compressor = runner._ensure_compressor(corpus)
    corpus_emb = compressor.encode_text(corpus)
    retriever = build_retriever(
        corpus_emb, corpus, None, cfg.retrieval,
        embedding_model=cfg.encoder.name,
        ae_type=runner.ae_type if runner.ae_type != "none" else None,
        latent_dim=compressor.output_dim,
    )
    loggers.main.info(
        "serving: corpus=%d dim=%d ae=%s", len(corpus),
        compressor.output_dim, runner.ae_type,
    )

    # warm the full query path before accepting traffic: the first search
    # otherwise pays the jit compile (~30-60 s through the TPU relay) on a
    # live request. Use the RAW default k — it is the jit cache key, so
    # min()-clamping here would compile a different program than the one
    # live requests hit.
    if corpus:
        t0 = time.perf_counter()
        warm_emb = compressor.encode_text([corpus[0]])
        retriever.search(warm_emb, cfg.retrieval.top_k)
        retriever.get_stats(reset=True)  # exclude warmup from serving stats
        loggers.main.info(
            "query path warmed in %.1fs; serving", time.perf_counter() - t0
        )

    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
            queries = req.get("queries")
            if queries is None:
                queries = [req["query"]]
            elif not isinstance(queries, list):
                # a bare string would be encoded character-by-character
                raise ValueError('"queries" must be a list of strings')
            k = int(req.get("k", cfg.retrieval.top_k))
            t0 = time.perf_counter()
            q_emb = compressor.encode_text(queries)
            scores, idx = retriever.search(q_emb, k)
            latency_ms = (time.perf_counter() - t0) * 1000
            results = []
            for qi, query in enumerate(queries):
                hits = [
                    {
                        "text": retriever.texts[j],
                        "score": float(scores[qi][rank]),
                        "doc_id": retriever.doc_ids[j],
                    }
                    for rank, j in enumerate(idx[qi])
                    if j >= 0
                ]
                item = {"query": query, "hits": hits}
                if req.get("generate") and args.generate:
                    gen = runner._ensure_generator()
                    item["answer"] = gen.generate(
                        query, [h["text"] for h in hits]
                    )
                results.append(item)
            out = {
                "results": results,
                "latency_ms": round(latency_ms, 3),
            }
        except Exception as e:
            out = {"error": f"{type(e).__name__}: {e}"}
        print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
