"""DPR-style dual-encoder retrieval baseline.

Parity with ``retrieval/dpr.py:5-32`` (facebook-dpr question/context
encoders + ANN index): two independent sentence encoders — one for
questions, one for passages — over a shared dense index. Weights can be
converted from the HF DPR checkpoints (BERT-base geometry, CLS pooling —
``EncoderConfig(pooling="cls", normalize=False)``) via
``models.encoder.convert``; offline, the towers TRAIN from scratch with
in-batch InfoNCE (``training/train_dpr.py``) — beyond the reference, which
can only load frozen hub weights. Scoring is the raw [CLS] dot product
(Karpukhin et al.), metric="dot".
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from .dense import DenseRetriever, make_fingerprint


class DPRRetriever:
    """Dual-encoder dense retriever with the BaseRetriever text surface."""

    def __init__(
        self,
        question_encoder,
        context_encoder,
        metric: str = "dot",  # DPR scores raw [CLS] dot products
        backend: str = "auto",
        store_dtype: str = "bfloat16",
    ):
        self.q_encoder = question_encoder
        self.c_encoder = context_encoder
        # store_dtype="float32" pins exact fp32 dot products (the
        # differential-parity mode, tests/test_dpr_conversion.py);
        # the bf16 default matches the framework's production store
        self.dense = DenseRetriever(
            metric=metric, backend=backend, store_dtype=store_dtype
        )

    def build_index(self, corpus: Sequence[str],
                    metadata: Sequence[dict] | None = None) -> None:
        emb = np.asarray(self.c_encoder.encode_batch(list(corpus)),
                         dtype=np.float32)
        fp = make_fingerprint(
            d=emb.shape[1],
            embedding_model=f"dpr:{getattr(self.c_encoder, 'name', 'ctx')}",
            metric=self.dense.metric,
        )
        self.dense.build(emb, corpus, fingerprint=fp, metadata=metadata)

    def retrieve(self, query: str, top_k: int = 5,
                 filter: dict | None = None):
        q = np.asarray(self.q_encoder.encode_batch([query]), dtype=np.float32)
        texts, scores, _ = self.dense.retrieve(q[0], top_k, filter=filter)
        return list(zip(texts, scores))

    def search(self, queries: Sequence[str], k: int,
               filter: dict | None = None):
        q = np.asarray(self.q_encoder.encode_batch(list(queries)),
                       dtype=np.float32)
        return self.dense.search(q, k, filter=filter)

    def get_stats(self, reset: bool = False) -> dict:
        return self.dense.get_stats(reset)
