"""End-to-end RAG pipeline: encode → (chunk) → index → retrieve → aggregate →
(generate) → evaluate.

Parity with the reference orchestrator (``main.py`` ``PipelineRunner``
163-361), redesigned around batch-first device execution:

* all queries are scored in ONE batched search (the reference loops one
  query at a time through its batch API — SURVEY §3.1);
* doc-level MaxSim aggregation is an array op (``ops.maxsim_aggregate``)
  instead of a per-query Python dict loop (``main.py:274-281``);
* ``candidate_k = top_k * 3`` when chunking is enabled, else ``top_k``
  (``main.py:64,265``);
* compression ratio reports the TRUE input dim (fixes the reference's
  dim_in fallback defect, SURVEY §2.2);
* autoencoder checkpoints load from the Orbax store written by
  ``training.train`` (parity with ``main.py:106-144``'s factory).
"""

from __future__ import annotations

import asyncio
import logging
import os
import time
from typing import Any, Sequence

import jax.numpy as jnp
import numpy as np

from .data import WordPieceTokenizer, build_inference_corpus
from .evaluation import evaluate_retrieval
from .generation import GeneratorSettings, LLMSettings, RAGGenerator
from .models import build_autoencoder
from .models.encoder import SentenceEncoder
from .ops import maxsim_aggregate
from .retrieval import EmbeddingCompressor, build_retriever
from .training import load_checkpoint
from .utils import Config, canonical_ae_type

log = logging.getLogger("latentrag.main")


def load_autoencoder(cfg: Config, ae_type: str):
    """(model, params) from the Orbax checkpoint directory; canonicalises
    naming (the reference's cae/contrastive/coe split, SURVEY §2.2).

    A checkpoint name ending in ``.pth`` is treated as a reference torch
    checkpoint and converted on load (``models/convert_torch.py``) — users
    migrating from the reference keep their trained weights as-is.
    """
    ae_type = canonical_ae_type(ae_type)
    if ae_type == "none":
        return None
    acfg = cfg.models.for_type(ae_type)
    model = build_autoencoder(ae_type, acfg)
    ckpt_name = acfg.checkpoint or ae_type
    path = os.path.join(cfg.paths.checkpoints_dir, ckpt_name)
    if ckpt_name.endswith(".pth"):
        pth = ckpt_name if os.path.isabs(ckpt_name) else path
        if not os.path.isfile(pth):
            raise FileNotFoundError(
                f"reference torch checkpoint not found: {pth}"
            )
        from .models.convert_torch import load_reference_checkpoint

        return model, load_reference_checkpoint(pth, ae_type)
    if not os.path.isdir(path):
        raise FileNotFoundError(
            f"no checkpoint for ae_type={ae_type!r} at {path}; train it with "
            f"`python -m latentrag_tpu.training.train --ae_type {ae_type}`"
        )
    restored = load_checkpoint(path)
    return model, restored["params"]


def _hf_checkpoint_usable(ecfg) -> bool:
    """An HF source is usable when ``encoder.name`` is a local checkpoint
    directory (offline-testable) or hub access is explicitly enabled."""
    name = ecfg.name
    if os.path.isdir(name) and os.path.exists(
        os.path.join(name, "config.json")
    ):
        return True
    return bool(getattr(ecfg, "hub_fallback", False))


def default_encoder(
    cfg: Config, corpus: Sequence[str], mesh=None
) -> SentenceEncoder:
    """Build the sentence encoder: converted weights + checkpoint vocab when
    present, otherwise a corpus-trained tokenizer + deterministic init.

    When no converted/trained weights exist yet and ``encoder.name``
    resolves to an HF checkpoint (local dir, or hub with
    ``encoder.hub_fallback=true``), it is converted NOW and persisted
    (msgpack + vocab.txt), so the documented quality-band parity command
    (docs/REFERENCE_PARITY.md §3) is one self-contained invocation."""
    tok_path = os.path.join(cfg.paths.data_dir, "tokenizer.json")
    vocab_path = os.path.join(cfg.paths.data_dir, "vocab.txt")
    default_weights = cfg.encoder.weights_path or os.path.join(
        cfg.paths.checkpoints_dir, "encoder.msgpack"
    )
    if not os.path.exists(default_weights) and _hf_checkpoint_usable(
        cfg.encoder
    ):
        try:
            from .models.encoder import convert_hf_bert_to_params, save_params

            hf_params, vocab_file = convert_hf_bert_to_params(
                cfg.encoder.name
            )
            save_params(hf_params, default_weights)
            if vocab_file and not os.path.exists(vocab_path):
                import shutil

                os.makedirs(cfg.paths.data_dir, exist_ok=True)
                shutil.copyfile(vocab_file, vocab_path)
            log.info(
                "converted HF checkpoint %s -> %s",
                cfg.encoder.name,
                default_weights,
            )
        except Exception as e:
            log.warning(
                "HF checkpoint %r unusable (%s); falling back to the "
                "self-init encoder",
                cfg.encoder.name,
                e,
            )
    # shared resolution order (vocab.txt > tokenizer.json > train) — the
    # DPR and reranker trainers resolve through the same helper, so every
    # component serves under ONE vocabulary
    from .data.tokenizer import resolve_tokenizer

    if not (os.path.exists(vocab_path) or os.path.exists(tok_path)):
        log.info("training tokenizer from corpus (%d docs)", len(corpus))
    tokenizer = resolve_tokenizer(
        cfg.paths.data_dir, cfg.encoder.vocab_size, corpus
    )
    params = None
    weights = default_weights
    if os.path.exists(weights):
        from .models.encoder import load_params

        probe = SentenceEncoder(tokenizer, cfg.encoder)
        params = load_params(weights, probe.params)
        log.info("loaded encoder weights: %s", weights)
    return SentenceEncoder(tokenizer, cfg.encoder, params=params, mesh=mesh)


class PipelineRunner:
    def __init__(
        self,
        cfg: Config,
        ae_type: str = "none",
        generate: bool = False,
        compressor: EmbeddingCompressor | None = None,
        generator: RAGGenerator | None = None,
        mesh=None,
        reranker=None,
    ):
        self.cfg = cfg
        self.ae_type = canonical_ae_type(ae_type)
        self.generate = generate
        self.mesh = mesh
        self._compressor = compressor
        self._generator = generator
        self._reranker = reranker
        self._autoencoder = (
            load_autoencoder(cfg, self.ae_type)
            if self.ae_type != "none"
            else None
        )

    def _ensure_compressor(self, corpus: Sequence[str]) -> EmbeddingCompressor:
        if self._compressor is None:
            encoder = default_encoder(self.cfg, corpus, mesh=self.mesh)
            self._compressor = EmbeddingCompressor(
                encoder,
                autoencoder=self._autoencoder,
                ae_type=self.ae_type if self.ae_type != "none" else None,
                batch_size=self.cfg.encoder.batch_size,
            )
        elif self._compressor.autoencoder is None and self._autoencoder:
            self._compressor.autoencoder = self._autoencoder
            self._compressor.ae_type = self.ae_type
        return self._compressor

    def _ensure_reranker(self):
        """The configured second-stage reranker (or None). Built from the
        trained checkpoint with the compressor's tokenizer — an injected
        instance (tests, pre-loaded servers) wins."""
        if self.cfg.retrieval.rerank == "none":
            return None
        if self._reranker is None:
            if self.cfg.retrieval.rerank != "cross":
                raise ValueError(
                    f"unknown retrieval.rerank="
                    f"{self.cfg.retrieval.rerank!r}; use 'none' or 'cross'"
                )
            from .retrieval.reranker import build_reranker

            self._reranker = build_reranker(
                self.cfg, self._compressor.encoder.tokenizer
            )
        return self._reranker

    def _ensure_generator(self) -> RAGGenerator:
        if self._generator is None:
            g = self.cfg.generation
            self._generator = RAGGenerator(
                GeneratorSettings(
                    llm=LLMSettings(
                        provider=g.provider,
                        model=g.model,
                        temperature=g.temperature,
                        max_tokens=g.max_tokens,
                    ),
                    system_prompt_path=g.system_prompt_path,
                    max_context_tokens=g.max_context_tokens,
                )
            )
        return self._generator

    # -------------------------------------------------------------- process

    def process(
        self,
        queries: Sequence[str],
        corpus: Sequence[str],
        relevant_ids: Sequence[int],
        gold_answers: Sequence[str] | None = None,
    ) -> dict[str, Any]:
        cfg = self.cfg
        compressor = self._ensure_compressor(corpus)
        timings: dict[str, float] = {}

        # 1. chunking (host stage)
        if cfg.chunking.enabled:
            t0 = time.perf_counter()
            records = build_inference_corpus(
                corpus,
                list(range(len(corpus))),
                compressor.encoder.tokenizer,
                mode=cfg.chunking.mode,
                max_tokens=cfg.chunking.max_tokens,
                stride=cfg.chunking.stride,
                min_tokens=cfg.chunking.min_tokens,
            )
            texts = [r.text for r in records]
            doc_ids = [r.doc_id for r in records]
            timings["chunking_s"] = time.perf_counter() - t0
        else:
            texts = list(corpus)
            doc_ids = list(range(len(corpus)))

        # 2. encode corpus + queries (batched on device). For the dense
        # tiers the embeddings STAY on device end to end — encode feeds
        # the index build and the batched search without ever
        # materialising the corpus matrix on the host (the C++ ANN/BM25
        # tiers are host consumers, so they take the numpy path)
        from .retrieval.factory import DEVICE_BACKENDS

        on_device = cfg.retrieval.backend in DEVICE_BACKENDS
        from .utils.timing import force_completion

        t0 = time.perf_counter()
        corpus_emb = compressor.encode_text(texts, device=on_device)
        if on_device:  # async device arrays: sync so the timing is real
            force_completion(corpus_emb)
        timings["encode_corpus_s"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        query_emb = compressor.encode_text(queries, device=on_device)
        if on_device:
            force_completion(query_emb)
        timings["encode_queries_s"] = time.perf_counter() - t0

        # 3. build index
        retriever = build_retriever(
            corpus_emb,
            texts,
            doc_ids,
            cfg.retrieval,
            mesh=self.mesh,
            embedding_model=cfg.encoder.name,
            ae_type=self.ae_type if self.ae_type != "none" else None,
            latent_dim=compressor.output_dim,
            chunking={
                "enabled": cfg.chunking.enabled,
                "mode": cfg.chunking.mode,
                "max_tokens": cfg.chunking.max_tokens
                if cfg.chunking.enabled
                else None,
                "stride": cfg.chunking.stride if cfg.chunking.enabled else None,
                "min_tokens": cfg.chunking.min_tokens
                if cfg.chunking.enabled
                else None,
            },
        )

        # 4. batched retrieve + MaxSim doc aggregation
        top_k = cfg.retrieval.top_k
        candidate_k = top_k * 3 if cfg.chunking.enabled else top_k
        reranker = self._ensure_reranker()
        if reranker is not None:
            # second stage needs an oversampled candidate pool to be
            # worth running (rescoring exactly top_k can only reorder)
            candidate_k = max(
                candidate_k,
                cfg.retrieval.rerank_candidates or 4 * top_k,
            )
        candidate_k = min(candidate_k, len(texts))
        scores, idx = retriever.search(query_emb, candidate_k)
        if reranker is not None:
            # cross-encoder rescoring of the chunk-level candidates; the
            # replaced score matrix flows through the SAME MaxSim/top-k
            # path (empty slots arrive NEG_INF and stay sentinels)
            t0 = time.perf_counter()
            scores = reranker.rescore_candidates(queries, idx, texts)
            timings["rerank_s"] = time.perf_counter() - t0
        # ANN backends signal unfilled slots with idx -1 / score -inf; map
        # them to a sentinel doc and force the score so they can never win
        chunk_doc = np.asarray(
            [doc_ids[j] if j >= 0 else -1 for j in idx.ravel()],
            dtype=np.int64,
        ).reshape(idx.shape)
        scores = np.where(idx >= 0, scores, -3.4e38).astype(np.float32)
        doc_scores, doc_top = maxsim_aggregate(
            jnp.asarray(scores), jnp.asarray(chunk_doc.astype(np.int32)),
            k=min(top_k, candidate_k),
        )
        doc_scores = np.asarray(doc_scores)
        doc_top = np.asarray(doc_top)
        # drop duplicate-doc sentinels (score NEG_INF) emitted when fewer
        # unique docs than k exist among the candidates
        retrieved_doc_ids = [
            [int(d) for d, s in zip(row, srow) if s > -1e37 and d >= 0]
            for row, srow in zip(doc_top, doc_scores)
        ]

        # 5. retrieval evaluation
        metrics = evaluate_retrieval(
            retrieved_doc_ids,
            list(relevant_ids),
            metrics=cfg.evaluation.retrieval_metrics,
        )

        result: dict[str, Any] = {
            "ae_type": self.ae_type,
            "dim_in": compressor.input_dim,
            "dim_out": compressor.output_dim,
            "n_corpus": len(corpus),
            "n_chunks": len(texts),
            "n_queries": len(queries),
            "top_k": top_k,
            "candidate_k": candidate_k,
            "retrieval_metrics": metrics,
            "retriever_stats": retriever.get_stats(),
            "timings": timings,
            "retrieved_doc_ids": retrieved_doc_ids,
            "doc_scores": doc_scores,
        }

        # 6. optional generation + eval (ref main.py:331-335: bootstrap
        # generation metrics when gold answers exist and the sample is
        # large enough for stable CIs)
        if self.generate:
            gen_out = self._run_generation(
                queries, texts, doc_ids, idx, doc_top, retriever
            )
            result.update(gen_out)
            ecfg = cfg.evaluation
            if gold_answers is None:
                log.info("no gold answers supplied; skipping generation eval")
            elif len(gen_out["answers"]) < ecfg.min_pairs_for_bootstrap:
                log.info(
                    "generation eval skipped: %d pairs < min %d for a "
                    "stable bootstrap",
                    len(gen_out["answers"]), ecfg.min_pairs_for_bootstrap,
                )
            else:
                from .evaluation import evaluate_generation_bootstrap

                result["generation_metrics"] = evaluate_generation_bootstrap(
                    gen_out["answers"],
                    [str(a) for a in gold_answers],
                    metrics=ecfg.generation_metrics,
                    n_resamples=ecfg.bootstrap_samples,
                    alpha=ecfg.bootstrap_alpha,
                    min_pairs=ecfg.min_pairs_for_bootstrap,
                )
        return result

    def _run_generation(
        self, queries, texts, doc_ids, chunk_idx, doc_top, retriever
    ) -> dict[str, Any]:
        """Context selection is a host loop; the completions themselves run
        through ``generate_batch_async`` — N serial network round trips
        collapse to ceil(N / concurrency) waves while answer order stays
        query order (``asyncio.gather`` preserves it)."""
        gen = self._ensure_generator()
        max_chunks = self.cfg.retrieval.max_chunks_per_doc
        docs_per_query: list[list[str]] = []
        for qi in range(len(queries)):
            per_doc: dict[int, int] = {}
            chosen: list[str] = []
            top_docs = set(doc_top[qi].tolist())
            for j in chunk_idx[qi]:
                if j < 0:  # ANN 'no result' slot
                    continue
                did = doc_ids[j]
                if did not in top_docs:
                    continue
                if per_doc.get(did, 0) >= max_chunks:
                    continue
                per_doc[did] = per_doc.get(did, 0) + 1
                chosen.append(texts[j])
            docs_per_query.append(chosen)
        concurrency = max(1, self.cfg.generation.concurrency)
        # duck-typed stand-ins (tests, custom generators) may implement
        # only generate(); batch them sequentially
        if not hasattr(gen, "generate_batch_async"):
            concurrency = 1
        if concurrency == 1:
            answers = [
                gen.generate(q, d) for q, d in zip(queries, docs_per_query)
            ]
        else:
            answers = asyncio.run(
                gen.generate_batch_async(
                    list(queries), docs_per_query, concurrency=concurrency
                )
            )
        return {"answers": answers}

    # ------------------------------------------------------------- run card

    def print_run_card(self, result: dict[str, Any]) -> None:
        try:
            from rich.console import Console
            from rich.table import Table

            console = Console()
            t = Table(title=f"latentrag-tpu run — ae_type={result['ae_type']}")
            t.add_column("metric")
            t.add_column("value", justify="right")
            t.add_row("corpus", str(result["n_corpus"]))
            t.add_row("chunks", str(result["n_chunks"]))
            t.add_row("queries", str(result["n_queries"]))
            t.add_row(
                "compression",
                f"{result['dim_in']}→{result['dim_out']} "
                f"({result['dim_in'] / result['dim_out']:.1f}x)",
            )
            for name, stats in result["retrieval_metrics"].items():
                t.add_row(name, f"{stats['mean']:.4f} ± {stats['std']:.4f}")
            st = result["retriever_stats"]
            t.add_row("build time", f"{st['build_time_s'] * 1e3:.2f} ms")
            t.add_row("search time", f"{st['search_time_s'] * 1e3:.2f} ms")
            if "p50" in st:
                t.add_row("query p50/p95", f"{st['p50']:.4f}/{st['p95']:.4f} ms")
            for name, stats in result.get("generation_metrics", {}).items():
                t.add_row(
                    name,
                    f"{stats['mean']:.2f} "
                    f"[{stats['ci_low']:.2f}, {stats['ci_high']:.2f}]",
                )
            console.print(t)
        except ImportError:
            log.info("run result: %s", result["retrieval_metrics"])
