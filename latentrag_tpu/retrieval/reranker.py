"""Cross-encoder reranking stage (two-stage retrieval's second stage).

The bi-encoder tiers (dense/ANN/BM25) fetch an oversampled candidate set
at corpus scale; this stage rescores each (query, candidate-text) PAIR
with a jointly-attending cross-encoder (``models/encoder/cross.py``) —
the standard production recipe for closing the quality gap between
bi-encoder recall and human relevance (Nogueira & Cho 2019). The
reference has no reranking stage.

Wire-up: ``retrieval.rerank=cross`` in config makes the pipeline (and
serve) rescore the chunk-level candidates before MaxSim doc aggregation;
``retrieval.rerank_candidates`` widens the stage-1 fetch (0 = 4 x top_k).
The reranker REQUIRES a trained checkpoint
(``checkpoints/reranker.msgpack`` — ``python -m
latentrag_tpu.training.train_reranker``): an untrained cross-encoder
would actively scramble stage-1's ranking, so a missing checkpoint is an
error naming the training command, exactly like a missing AE checkpoint.
"""

from __future__ import annotations

import logging
import os
from typing import Sequence

import numpy as np

log = logging.getLogger("latentrag.retrieval")

NEG_INF = float(-3.4e38)


class CrossEncoderReranker:
    """Batched candidate rescoring over a ``CrossEncoderScorer``."""

    def __init__(self, scorer):
        self.scorer = scorer

    def rescore_candidates(
        self,
        queries: Sequence[str],
        idx: np.ndarray,
        texts: Sequence[str],
    ) -> np.ndarray:
        """Cross-encoder scores for stage-1 candidates.

        ``idx`` is the [Q, C] candidate matrix of row indices into
        ``texts`` (-1 = empty slot). Returns fp32 [Q, C] relevance logits
        with NEG_INF in empty slots — a drop-in replacement for the
        stage-1 score matrix, so downstream MaxSim/top-k code is
        unchanged. All Q*C live pairs run as ONE batched scorer call
        (bucketed internally)."""
        idx = np.asarray(idx)
        nq, c = idx.shape
        valid = idx >= 0
        pair_q = []
        pair_d = []
        for i in range(nq):
            for j in range(c):
                if valid[i, j]:
                    pair_q.append(queries[i])
                    pair_d.append(texts[int(idx[i, j])])
        out = np.full((nq, c), NEG_INF, dtype=np.float32)
        if pair_q:
            out[valid] = self.scorer.score_pairs(pair_q, pair_d)
        return out

def reranker_checkpoint_path(cfg) -> str:
    return os.path.join(cfg.paths.checkpoints_dir, "reranker.msgpack")


def save_reranker_meta(cfg, tokenizer, max_length: int,
                       query_max: int) -> None:
    """Sidecar recording what the checkpoint was trained WITH: pair
    truncation lengths and the tokenizer's vocabulary identity. Serving
    must replay these — a longer max_length would attend over position
    rows the training never touched, and an equal-size but different
    vocabulary would silently index wrong embedding rows."""
    import json

    from ..data.tokenizer import tokenizer_digest

    meta = {
        "max_length": int(max_length),
        "query_max": int(query_max),
        "vocab_size": int(tokenizer.vocab_size),
        "vocab_sha1": tokenizer_digest(tokenizer),
    }
    path = reranker_checkpoint_path(cfg) + ".meta.json"
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, path)


def build_reranker(cfg, tokenizer) -> CrossEncoderReranker:
    """Construct the configured reranker from its trained checkpoint.

    Raises FileNotFoundError (naming the exact training command) when the
    checkpoint is absent — an untrained cross-encoder is worse than no
    reranker at all. The checkpoint's meta sidecar pins the TRAINED pair
    length (served pairs truncate to it, never beyond) and the training
    vocabulary (a mismatch refuses to serve: same-size different vocabs
    would scramble every embedding lookup)."""
    import dataclasses
    import json

    from ..data.tokenizer import tokenizer_digest
    from ..models.encoder.convert import load_params
    from ..models.encoder.cross import CrossEncoderScorer

    path = reranker_checkpoint_path(cfg)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"retrieval.rerank=cross needs a trained reranker at {path}; "
            "train one with: python -m latentrag_tpu.training."
            "train_reranker --epochs 5"
        )
    ecfg = cfg.encoder
    query_max = 64
    meta_path = path + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        want_sha = meta.get("vocab_sha1")
        if want_sha is not None and want_sha != tokenizer_digest(tokenizer):
            raise ValueError(
                f"reranker at {path} was trained under a different "
                "vocabulary than the serving tokenizer; retrain it "
                "(train_reranker resolves the tokenizer the same way the "
                "pipeline does, so rerun it in this workspace)"
            )
        trained_len = int(meta.get("max_length", ecfg.max_length))
        if trained_len != ecfg.max_length:
            # the trained pair length IS the model's input contract —
            # serve at exactly it, in BOTH directions: shorter wastes
            # trained capacity, and capping at the bi-encoder's
            # (unrelated) max_length silently truncated the passage out
            # of long-pair rerankers (r5: a 192-token reranker served
            # at the stage-1 encoder's 64 never saw the evidence)
            ecfg = dataclasses.replace(ecfg, max_length=trained_len)
        query_max = int(meta.get("query_max", query_max))
    else:
        log.warning(
            "reranker at %s has no meta sidecar (pre-meta checkpoint); "
            "serving with encoder.max_length=%d untruncated — retrain to "
            "pin the trained pair length", path, ecfg.max_length,
        )
    scorer = CrossEncoderScorer(tokenizer, ecfg, query_max=query_max)
    scorer.params = load_params(path, scorer.params)
    log.info("cross-encoder reranker loaded: %s (pair length %d)",
             path, ecfg.max_length)
    return CrossEncoderReranker(scorer)
