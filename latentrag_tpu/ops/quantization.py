"""Int8 scalar quantization (SQ8) for the latent corpus.

Capability parity with FAISS's scalar-quantizer index tier, designed for the
TPU's strengths: symmetric per-tensor int8 keeps scoring a single
``int8 x int8 -> int32`` MXU matmul (2x the bf16 rate on v5e) and halves
corpus HBM traffic vs bf16. The scale factors commute out of the dot
product, so ranking is exact up to quantization rounding; the host wrapper
can rescore survivors in fp32 when exact scores matter.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .topk import _apply_mask, blocked_topk


@jax.jit
def sq8_quantize(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-tensor int8: returns (codes [N, D] int8, scale f32).

    ``x ≈ codes * scale``; scale = max|x| / 127.
    """
    x = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(x)) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    codes = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return codes, scale


@partial(jax.jit, static_argnames=("k", "block_size", "recall_target"))
def sq8_topk(
    queries: jax.Array,
    corpus_codes: jax.Array,
    corpus_scale: jax.Array,
    k: int,
    block_size: int = 2097152,
    recall_target: float = 0.99,
    mask: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Cosine/dot top-k over an int8 corpus.

    Queries are fp32/bf16 (prepared for the metric: pre-normalized for
    cosine) and quantized on the fly; scores returned in the original float
    scale. Indices/candidates via ``approx_max_k`` per block. ``mask``
    (bool [N], optional) restricts eligibility — see ``ops.topk``.
    """
    q_codes, q_scale = sq8_quantize(queries)
    factor = (q_scale * corpus_scale).astype(jnp.float32)
    n = corpus_codes.shape[0]
    k = min(k, n)

    def block_topk(codes, base, kk):
        dots = jax.lax.dot_general(
            q_codes,
            codes,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        scores = dots.astype(jnp.float32) * factor
        if mask is not None:
            scores = _apply_mask(
                scores,
                jax.lax.dynamic_slice_in_dim(mask, base, codes.shape[0]),
            )
        s, local = jax.lax.approx_max_k(
            scores, kk, recall_target=recall_target
        )
        return s, local + base

    if n <= block_size:
        return block_topk(corpus_codes, 0, k)

    # <=16 blocks unroll, beyond that a block scan bounds program size
    # (an unbounded unroll at ~200M int8 rows would emit ~100 kernel
    # instances); shared driver + measurement basis: ops/topk.py
    return blocked_topk(block_topk, corpus_codes, k, block_size,
                        q_codes.shape[0])
