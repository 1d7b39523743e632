"""Batched retrieval/RAG server (stdin/stdout JSONL, or HTTP).

Production-serving surface: loads the configured encoder + AE + index once,
then serves queries in micro-batches — one JSON object per line in, one per
line out. With ``--http PORT`` the same request handler serves over a
threaded stdlib HTTP server instead (no extra dependencies):

  POST /search   body = the query object below ({"query"|"queries", ...})
  POST /add      body = the "add" payload      ({"texts": [...], ...})
  POST /remove   body = the "remove" payload   ({"doc_ids": [...]})
  GET|POST /stats[?reset=1]                    -> serving stats
  GET /healthz                                 -> liveness + index info

Device work is serialized behind one lock (one TPU chip, one compiled
program at a time); HTTP threads only overlap on parse/IO. With
``--batch-window-ms N`` concurrent searches of one (k, filter) group
coalesce into a single batched device call (``latentrag_tpu.serving``) —
the kernels are batch-favored, so N in-flight singles cost ~1 search.
Protocol:

  {"query": "...", "k": 5}                  -> retrieval
  {"query": "...", "k": 5, "generate": true} -> retrieval + LLM answer
  {"queries": ["...", "..."], "k": 5}       -> one batched device call
  {"query": "...", "filter": {...}}         -> predicate-filtered search
                                               (doc_ids / exclude_doc_ids /
                                               where — retrieval.filtering)
  {"query": "...", "nprobe": 64}            -> per-request device-IVF
                                               probe budget (dense backend
                                               with retrieval.ivf_nlist;
                                               the latency/recall knob)
  {"add": {"texts": ["..."], "doc_ids": [..],
           "metadata": [{...}, ...]}}       -> incremental index growth
  {"remove": {"doc_ids": [..]}}             -> drop docs (dense tiers;
                                               survivors' scores unchanged)
  {"stats": true[, "reset": true]}          -> serving stats + index info

Boot modes: when ``retrieval.index_path`` holds a loadable persisted index,
the server WARM-boots from it — texts + vectors come straight off disk and
the corpus is never re-encoded (the reference's mmap-load capability,
``FAISSEmbeddingRetriever.py:65-69``, which its own pipeline never exploits
because build() always re-encodes). ``--cold-boot`` forces the full
dataset-load + encode + build path; it runs automatically when no store
exists or the store's provenance contradicts the serving config.

Usage:
  echo '{"query": "what do telescopes observe?"}' | \
      python serve.py --config configs/default.yaml --ae_type dae
"""

from __future__ import annotations

import argparse
import asyncio
import json
import sys
import time

from latentrag_tpu.pipeline import PipelineRunner
from latentrag_tpu.utils import (
    apply_overrides,
    canonical_ae_type,
    init_logger,
    load_config,
)
from latentrag_tpu.retrieval import build_retriever, load_retriever


def boot(cfg, args, loggers):
    """Returns (runner, compressor, retriever, mode)."""
    mesh = None
    if cfg.retrieval.shard_corpus:
        import jax

        from latentrag_tpu.parallel import make_mesh

        if jax.device_count() > 1:
            mesh = make_mesh()
            loggers.main.info(
                "serving sharded over %d devices", mesh.size
            )
    runner = PipelineRunner(
        cfg, ae_type=canonical_ae_type(args.ae_type),
        generate=args.generate, mesh=mesh,
    )
    retriever = None
    if not args.cold_boot:
        ae = runner.ae_type if runner.ae_type != "none" else None
        retriever = load_retriever(
            cfg.retrieval, mesh=mesh,
            expect={"embedding_model": cfg.encoder.name, "ae_type": ae},
        )
    if retriever is not None:
        # encoder/AE still load (queries need encoding) but the corpus
        # text feeding the tokenizer fallback comes from the store itself
        compressor = runner._ensure_compressor(retriever.texts)
        dim = getattr(retriever, "dim", 0)
        if dim and dim != compressor.output_dim:
            loggers.main.warning(
                "persisted index dim %d != encoder output %d; cold boot",
                dim, compressor.output_dim,
            )
            retriever = None
            # the compressor above may carry a tokenizer trained on the
            # STALE store's texts — the cold path must rebuild from the
            # configured corpus, exactly as a plain --cold-boot run would
            runner._compressor = None
    if retriever is not None:
        return runner, compressor, retriever, "warm"

    from latentrag_tpu.data import get_examples, load_evaluation_data

    examples = get_examples(cfg)
    _, corpus, _ = load_evaluation_data(examples)
    compressor = runner._ensure_compressor(corpus)
    # dense tiers: encode straight into device memory (no host corpus
    # matrix); the C++ ANN tiers consume numpy
    from latentrag_tpu.retrieval.factory import DEVICE_BACKENDS

    corpus_emb = compressor.encode_text(
        corpus, device=cfg.retrieval.backend in DEVICE_BACKENDS
    )
    retriever = build_retriever(
        corpus_emb, corpus, None, cfg.retrieval,
        mesh=mesh,
        embedding_model=cfg.encoder.name,
        ae_type=runner.ae_type if runner.ae_type != "none" else None,
        latent_dim=compressor.output_dim,
    )
    return runner, compressor, retriever, "cold"


def make_handle(cfg, args, runner, compressor, retriever, mode):
    """One request dict -> one response dict (raises on protocol errors).

    Shared by the JSONL loop and the HTTP front-end. Device work (encode +
    search + mutations) serializes behind one lock: there is one chip and
    one program running at a time anyway, and interleaved mutations would
    corrupt the texts/doc_ids/index alignment.
    """
    import threading

    lock = threading.Lock()

    def _validate_search(req: dict):
        """Shared request validation -> (queries, k, filter, nprobe)."""
        queries = req.get("queries")
        if queries is None:
            queries = [req["query"]]
        elif not isinstance(queries, list):
            # a bare string would be encoded character-by-character
            raise ValueError('"queries" must be a list of strings')
        k = int(req.get("k", cfg.retrieval.top_k))
        flt = req.get("filter")
        import inspect

        if flt is not None:
            # dense + ANN tiers take filter=; others raise a clear
            # protocol error instead of silently ignoring the key
            if "filter" not in inspect.signature(
                retriever.search
            ).parameters:
                raise ValueError(
                    f"{type(retriever).__name__} does not support filtered "
                    'search; use backend "dense", "hnsw" or "ivfpq"'
                )
        nprobe = req.get("nprobe")
        if nprobe is not None:
            # the per-request device-IVF probe budget (latency/recall
            # knob); reject clearly where it cannot mean anything —
            # strict int check: a float would silently truncate and a
            # bool would coerce to 0/1
            if isinstance(nprobe, bool) or not isinstance(nprobe, int) \
                    or nprobe <= 0:
                raise ValueError('"nprobe" must be a positive integer')
            if "nprobe" not in inspect.signature(
                retriever.search
            ).parameters or not getattr(retriever, "ivf_nlist", 0):
                raise ValueError(
                    '"nprobe" requires the dense backend with '
                    "retrieval.ivf_nlist > 0 (the device IVF tier)"
                )
        return queries, k, flt, nprobe

    # optional second-stage cross-encoder (retrieval.rerank=cross): boot
    # fails fast with the training command when the checkpoint is absent
    reranker = runner._ensure_reranker()

    def _hits_for(queries, k, flt, nprobe=None):
        """Encode + search (+ rerank) + assemble per-query hit lists. Must
        run under the lock: hit assembly reads texts/doc_ids, which
        mutations rewrite."""
        fetch_k = k
        if reranker is not None:
            fetch_k = max(k, cfg.retrieval.rerank_candidates or 4 * k)
        q_emb = compressor.encode_text(queries)
        kw = {}
        if flt is not None:
            kw["filter"] = flt
        if nprobe is not None:
            kw["nprobe"] = nprobe
        scores, idx = retriever.search(q_emb, fetch_k, **kw)
        if reranker is not None:
            import numpy as _np

            rescored = reranker.rescore_candidates(
                queries, idx, retriever.texts
            )
            order = _np.argsort(-rescored, axis=1)[:, :k]
            scores = _np.take_along_axis(rescored, order, axis=1)
            idx = _np.take_along_axis(_np.asarray(idx), order, axis=1)
            idx = _np.where(scores > -1e37, idx, -1)
        return [
            [
                {
                    "text": retriever.texts[j],
                    "score": float(scores[qi][rank]),
                    "doc_id": retriever.doc_ids[j],
                }
                for rank, j in enumerate(idx[qi])
                if j >= 0
            ]
            for qi in range(len(queries))
        ]

    # dynamic micro-batching (HTTP mode ONLY — a single-stream JSONL
    # caller would pay the window as pure latency with nothing to
    # coalesce): concurrent search requests of one (k, filter) group
    # coalesce into one device call — the kernels are batch-favored
    # (docs/ROOFLINE.md), so N in-flight singles cost ~1 search, not N
    batcher = None
    window_ms = float(getattr(args, "batch_window_ms", 0) or 0)
    if window_ms > 0 and getattr(args, "http", None) is not None:
        from latentrag_tpu.models.encoder.minilm import _bucket_batch
        from latentrag_tpu.serving import MicroBatcher

        def _score_batch(queries, k, flt, nprobe=None):
            # burst sizes are arbitrary; pad the query list to the same
            # power-of-two buckets the encoder uses so coalesced batches
            # reuse a handful of compiled programs instead of paying a
            # 30-60 s remote compile per novel size (CLAUDE.md)
            n = len(queries)
            nb = _bucket_batch(n)
            padded = list(queries) + [queries[0]] * (nb - n)
            with lock:
                return _hits_for(padded, k, flt, nprobe)[:n]

        batcher = MicroBatcher(
            _score_batch, window_ms=window_ms,
            max_batch=int(getattr(args, "max_batch", 64) or 64),
        )

    def handle(req: dict) -> dict:
        # device work + mutations serialize; generation (network-bound,
        # possibly seconds) runs OUTSIDE the lock so one slow LLM call
        # can't stall every other request — results are already
        # materialized host-side when the lock drops
        if batcher is not None and not (
            req.get("stats") or "add" in req or "remove" in req
        ):
            from latentrag_tpu.retrieval.filtering import (
                canonical_filter_key,
            )

            queries, k, flt, nprobe = _validate_search(req)
            fkey = canonical_filter_key(flt) if flt is not None else None
            t0 = time.perf_counter()
            hits = batcher.submit(queries, k, flt, fkey, nprobe)
            out = {
                "results": [
                    {"query": q, "hits": h} for q, h in zip(queries, hits)
                ],
                "latency_ms": round(
                    (time.perf_counter() - t0) * 1000, 3
                ),
            }
        else:
            with lock:
                out = _handle_locked(req)
        if req.get("generate") and args.generate and "results" in out:
            results = out["results"]
            queries = [r["query"] for r in results]
            gen = runner._ensure_generator()
            docs = [[h["text"] for h in r["hits"]] for r in results]
            if len(results) > 1:  # overlap in-flight completions
                answers = asyncio.run(
                    gen.generate_batch_async(
                        queries, docs,
                        concurrency=max(1, cfg.generation.concurrency),
                    )
                )
            else:
                answers = [gen.generate(queries[0], docs[0])]
            for r, a in zip(results, answers):
                r["answer"] = a
        return out

    def _handle_locked(req: dict) -> dict:
        if req.get("stats"):
            st = retriever.get_stats(reset=bool(req.get("reset")))
            out_stats = {
                "stats": st,
                "n_docs": len(retriever.texts),
                "boot": mode,
                "ae_type": runner.ae_type,
                "dim": compressor.output_dim,
                "rerank": cfg.retrieval.rerank,
                "micro_batch_window_ms": window_ms if batcher else 0,
            }
            ivf_r = getattr(retriever, "_ivf_recall_estimate", None)
            if ivf_r is not None:
                out_stats["ivf_recall_estimate"] = round(float(ivf_r), 4)
            return out_stats
        if "add" in req:
            spec = req["add"]
            texts = spec.get("texts")
            if not isinstance(texts, list) or not texts:
                raise ValueError(
                    '"add.texts" must be a non-empty list of strings'
                )
            t0 = time.perf_counter()
            emb = compressor.encode_text(texts)
            md = spec.get("metadata")
            if md is not None:
                retriever.add(emb, texts, spec.get("doc_ids"), metadata=md)
            else:
                retriever.add(emb, texts, spec.get("doc_ids"))
            return {
                "added": len(texts),
                "n_total": len(retriever.texts),
                "latency_ms": round((time.perf_counter() - t0) * 1000, 3),
            }
        if "remove" in req:
            spec = req["remove"]
            ids = spec.get("doc_ids") if isinstance(spec, dict) else spec
            if not isinstance(ids, list) or not ids:
                raise ValueError('"remove.doc_ids" must be a non-empty list')
            if not hasattr(retriever, "remove"):
                raise ValueError(
                    f"{type(retriever).__name__} does not support remove; "
                    "rebuild the index without those docs"
                )
            t0 = time.perf_counter()
            removed = retriever.remove(ids)
            return {
                "removed": removed,
                "n_total": len(retriever.texts),
                "latency_ms": round((time.perf_counter() - t0) * 1000, 3),
            }
        queries, k, flt, nprobe = _validate_search(req)
        t0 = time.perf_counter()
        hits = _hits_for(queries, k, flt, nprobe)
        latency_ms = (time.perf_counter() - t0) * 1000
        results = [
            {"query": q, "hits": h} for q, h in zip(queries, hits)
        ]
        # generation happens in handle(), after the lock is released
        return {"results": results, "latency_ms": round(latency_ms, 3)}

    handle.close = batcher.close if batcher is not None else (lambda: None)
    return handle


def serve_http(handle, retriever, mode, host, port, loggers):
    """Threaded stdlib HTTP front-end over the shared request handler.
    Returns the bound server (caller runs ``serve_forever``)."""
    import json as _json
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def _respond(self, code: int, obj: dict) -> None:
            body = _json.dumps(obj).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _dispatch(self, req: dict) -> None:
            try:
                self._respond(200, handle(req))
            except KeyError as e:
                self._respond(400, {"error": f"missing field {e}"})
            except Exception as e:
                self._respond(400, {"error": f"{type(e).__name__}: {e}"})

        def do_POST(self):  # noqa: N802 (stdlib naming)
            try:
                length = int(self.headers.get("Content-Length") or 0)
                body = _json.loads(self.rfile.read(length) or b"{}")
                if not isinstance(body, dict):
                    raise ValueError("request body must be a JSON object")
            except Exception as e:
                self._respond(400, {"error": f"{type(e).__name__}: {e}"})
                return
            path = self.path.split("?")[0].rstrip("/")
            if path == "/search":
                self._dispatch(body)
            elif path == "/add":
                self._dispatch({"add": body})
            elif path == "/remove":
                self._dispatch({"remove": body})
            elif path == "/stats":
                self._dispatch({"stats": True, **body})
            else:
                self._respond(404, {"error": f"unknown path {self.path!r}"})

        def do_GET(self):  # noqa: N802
            path, _, query = self.path.partition("?")
            path = path.rstrip("/")
            if path == "/healthz":
                self._respond(200, {
                    "ok": True, "n_docs": len(retriever.texts),
                    "boot": mode,
                })
            elif path == "/stats":
                from urllib.parse import parse_qs

                reset = parse_qs(query).get("reset", ["0"])[-1]
                self._dispatch(
                    {"stats": True,
                     "reset": reset.lower() in ("1", "true", "yes")}
                )
            else:
                self._respond(404, {"error": f"unknown path {self.path!r}"})

        def log_message(self, fmt, *a):  # route access logs off stdout
            loggers.main.debug("http: " + fmt, *a)

    server = ThreadingHTTPServer((host, port), Handler)
    loggers.main.info("http serving on %s:%d", *server.server_address[:2])
    return server


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="latentrag-tpu query server")
    p.add_argument("--config", default=None)
    p.add_argument("--ae_type", default="none")
    p.add_argument("--generate", action="store_true")
    p.add_argument(
        "--cold-boot", action="store_true",
        help="force dataset load + corpus re-encode even when a persisted "
             "index is loadable",
    )
    p.add_argument(
        "--http", type=int, default=None, metavar="PORT",
        help="serve HTTP on this port instead of stdin/stdout JSONL",
    )
    p.add_argument("--host", default="127.0.0.1",
                   help="bind address for --http (default loopback)")
    p.add_argument(
        "--batch-window-ms", type=float, default=0.0, metavar="MS",
        help="dynamic micro-batching window for concurrent --http "
             "searches: the first request of a (k, filter) group waits "
             "this long for others to coalesce into ONE device call "
             "(0 = off; 2-5 ms is a good start under real concurrency)",
    )
    p.add_argument(
        "--max-batch", type=int, default=64,
        help="micro-batching: flush a group at this many queries even "
             "inside the window",
    )
    p.add_argument("--set", nargs="*", default=[], metavar="a.b=v")
    args = p.parse_args(argv)

    cfg = apply_overrides(load_config(args.config), args.set)
    # stdout is the JSONL response channel — keep log lines on stderr
    loggers = init_logger(cfg.logging, stream=sys.stderr)

    t_boot = time.perf_counter()
    runner, compressor, retriever, mode = boot(cfg, args, loggers)
    loggers.main.info(
        "%s boot in %.1fs: corpus=%d dim=%d ae=%s", mode,
        time.perf_counter() - t_boot, len(retriever.texts),
        compressor.output_dim, runner.ae_type,
    )

    handle = make_handle(cfg, args, runner, compressor, retriever, mode)

    # warm the full LIVE request path before accepting traffic: the first
    # search otherwise pays the jit compile (~30-60 s through the TPU
    # relay) on a live request. Routing the warmup THROUGH handle() keeps
    # every jit cache key identical to real traffic — including the
    # rerank path's widened fetch_k and the cross-encoder's own program,
    # which a bare retriever.search(top_k) would miss.
    if retriever.texts:
        t0 = time.perf_counter()
        handle({"query": str(retriever.texts[0])[:256],
                "k": cfg.retrieval.top_k})
        retriever.get_stats(reset=True)  # exclude warmup from serving stats
        loggers.main.info(
            "query path warmed in %.1fs; serving", time.perf_counter() - t0
        )
    if args.http is not None:
        server = serve_http(
            handle, retriever, mode, args.host, args.http, loggers
        )
        try:
            server.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            server.server_close()
            handle.close()
        return 0
    try:
        for line in sys.stdin:
            line = line.strip()
            if not line:
                continue
            try:
                out = handle(json.loads(line))
            except Exception as e:
                out = {"error": f"{type(e).__name__}: {e}"}
            print(json.dumps(out), flush=True)
    finally:
        handle.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
