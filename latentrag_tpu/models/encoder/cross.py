"""Cross-encoder relevance scorer (BERT pair classification) in Flax.

Late-stage reranking tier: a bi-encoder (MiniLM/DPR/AE-latent) fetches
candidates at corpus scale, then this cross-encoder reads each
``[CLS] query [SEP] document [SEP]`` PAIR jointly and emits one relevance
logit — the standard two-stage production recipe (Nogueira & Cho 2019,
arXiv:1901.04085; sentence-transformers' ms-marco-MiniLM cross-encoders).
The reference has no reranking stage at all.

Architecture mirrors HF ``BertForSequenceClassification`` with one label:
the MiniLM trunk (``TransformerLayer`` reused verbatim), a 2-row
token-type embedding distinguishing query/document segments, a tanh
pooler over [CLS], and a scalar classifier head — so converted HF
cross-encoder checkpoints drop in when the hub is reachable, and the
offline path trains from scratch (``training/train_reranker.py``).

TPU notes: pairs pad to power-of-two length/batch buckets (a handful of
compiled shapes), activations bf16 with fp32 layernorm/softmax-max/head —
the same measured recipe as the sentence encoder (docs/ROOFLINE.md r4).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...utils.config import EncoderConfig
from .minilm import TransformerLayer, _bucket_batch, _bucket_length


class CrossEncoderModel(nn.Module):
    """Trunk + pair embeddings + pooler + scalar relevance head."""

    vocab_size: int = 30522
    hidden_dim: int = 384
    num_layers: int = 6
    num_heads: int = 12
    mlp_dim: int = 1536
    max_position_embeddings: int = 512
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids):
        b, l = input_ids.shape
        word = nn.Embed(
            self.vocab_size, self.hidden_dim, dtype=jnp.float32,
            name="word_embeddings",
        )(input_ids)
        pos = nn.Embed(
            self.max_position_embeddings, self.hidden_dim,
            dtype=jnp.float32, name="position_embeddings",
        )(jnp.arange(l)[None, :])
        # two segments (query=0, document=1) — the pair-input analogue of
        # the sentence encoder's single learned vector
        seg = nn.Embed(
            2, self.hidden_dim, dtype=jnp.float32,
            name="token_type_embeddings",
        )(token_type_ids)
        x = word + pos + seg
        x = nn.LayerNorm(dtype=jnp.float32, name="embed_ln")(x)
        x = x.astype(self.dtype)

        additive = jnp.where(
            attention_mask[:, None, None, :] > 0, 0.0, -1e9
        ).astype(jnp.float32)
        for i in range(self.num_layers):
            x = TransformerLayer(
                self.hidden_dim, self.num_heads, self.mlp_dim, self.dtype,
                name=f"layer_{i}",
            )(x, additive)

        cls = x[:, 0, :].astype(jnp.float32)
        pooled = jnp.tanh(
            nn.Dense(self.hidden_dim, dtype=jnp.float32, name="pooler")(cls)
        )
        logit = nn.Dense(1, dtype=jnp.float32, name="classifier")(pooled)
        return logit[:, 0]  # [B] fp32 relevance logits


def encode_pairs(
    tokenizer,
    queries,
    docs,
    max_length: int = 256,
    query_max: int = 64,
):
    """Tokenize (query, doc) pairs into BERT pair inputs.

    Returns (ids, mask, token_type) int32 [N, L]. Queries keep at most
    ``query_max`` tokens (CLS+SEP included); each document fills the rest
    of ``max_length`` and is truncated with a forced trailing [SEP] —
    fixed-split truncation (documented; HF's longest_first differs only
    when the query itself overflows). Token types are 0 through the
    query's [SEP], 1 after.
    """
    if len(queries) != len(docs):
        raise ValueError("queries and docs must pair 1:1")
    n = len(queries)
    q_ids, q_mask = tokenizer.encode_batch(list(queries),
                                           max_length=query_max)
    d_ids, d_mask = tokenizer.encode_batch(list(docs),
                                           max_length=max_length)
    out_ids = np.full((n, max_length), tokenizer.pad_id, dtype=np.int32)
    out_mask = np.zeros((n, max_length), dtype=np.int32)
    out_type = np.zeros((n, max_length), dtype=np.int32)
    for i in range(n):
        ql = int(q_mask[i].sum())  # [CLS] q... [SEP]
        dl = int(d_mask[i].sum())
        body = d_ids[i, 1:dl]  # drop the doc's [CLS]; keeps its [SEP]
        budget = max_length - ql
        if len(body) > budget:
            body = body[:budget]
            if budget > 0:
                body = np.concatenate(
                    [body[:-1], [tokenizer.sep_id]]
                )  # truncation keeps a closing [SEP]
        out_ids[i, :ql] = q_ids[i, :ql]
        out_ids[i, ql:ql + len(body)] = body
        out_mask[i, :ql + len(body)] = 1
        out_type[i, ql:ql + len(body)] = 1
    return out_ids, out_mask, out_type


class CrossEncoderScorer:
    """Tokenizer + model + params; the (query, doc) -> score surface."""

    def __init__(
        self,
        tokenizer,
        cfg: EncoderConfig | None = None,
        params=None,
        seed: int = 0,
        query_max: int = 64,
    ):
        self.cfg = cfg or EncoderConfig()
        self.tokenizer = tokenizer
        self.query_max = query_max
        dtype = jnp.bfloat16 if self.cfg.dtype == "bfloat16" else jnp.float32
        self.module = CrossEncoderModel(
            vocab_size=max(self.cfg.vocab_size, tokenizer.vocab_size),
            hidden_dim=self.cfg.hidden_dim,
            num_layers=self.cfg.num_layers,
            num_heads=self.cfg.num_heads,
            mlp_dim=self.cfg.mlp_dim,
            max_position_embeddings=self.cfg.max_position_embeddings,
            dtype=dtype,
        )
        if params is None:
            dummy = jnp.zeros((1, 8), jnp.int32)
            params = self.module.init(
                jax.random.PRNGKey(seed), dummy,
                jnp.ones((1, 8), jnp.int32), dummy,
            )["params"]
        self.params = params
        self._apply = jax.jit(
            lambda p, ids, mask, tt: self.module.apply(
                {"params": p}, ids, mask, tt
            )
        )

    def score_pairs(self, queries, docs) -> np.ndarray:
        """Relevance logits for N (query, doc) pairs -> fp32 [N]."""
        queries, docs = list(queries), list(docs)
        if not queries:
            return np.zeros((0,), np.float32)
        bs = self.cfg.batch_size
        out = [
            self._score_chunk(queries[i:i + bs], docs[i:i + bs])
            for i in range(0, len(queries), bs)
        ]
        return np.concatenate(out)

    def _score_chunk(self, queries, docs) -> np.ndarray:
        ids, mask, tt = encode_pairs(
            self.tokenizer, queries, docs,
            max_length=self.cfg.max_length, query_max=self.query_max,
        )
        used = int(mask.sum(axis=1).max()) if ids.shape[0] else 1
        bucket = _bucket_length(used, self.cfg.max_length)
        ids, mask, tt = ids[:, :bucket], mask[:, :bucket], tt[:, :bucket]
        n = ids.shape[0]
        nb = _bucket_batch(n)
        if n < nb:
            pad = ((0, nb - n), (0, 0))
            ids = np.pad(ids, pad, constant_values=self.tokenizer.pad_id)
            mask = np.pad(mask, pad)
            tt = np.pad(tt, pad)
        logits = self._apply(
            self.params, jnp.asarray(ids), jnp.asarray(mask),
            jnp.asarray(tt),
        )
        return np.asarray(logits[:n], dtype=np.float32)
