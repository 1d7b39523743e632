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


# ---------------------------------------------------------------- int4 (SQ4)
#
# The middle rung of the quantization ladder (bf16 -> int8 -> INT4 ->
# 1-bit): two 4-bit codes pack per byte, halving HBM traffic and index
# storage again vs SQ8 at ~8x finer resolution than the sign-bit tier.
# The binary tier's measured lesson applies (docs/ROOFLINE.md): the VPU
# unpack turns the scan into a full-rate int8 matmul, so the win lives
# in the HBM-BOUND regimes (small/mid query batches at >=16M rows) and
# in capacity (~2x int8 rows per chip); MXU-bound 1024q batches expect
# parity at best. FAISS's SQ4 scalar quantizer is the reference-world
# counterpart (the reference itself never exposes it).

SQ4_LEVELS = 7  # symmetric [-7, 7]; code -8 is unused so negation is exact


@jax.jit
def sq4_quantize(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-tensor int4: (packed uint8 [N, ceil(D/2)], scale).

    ``x ~= codes * scale``; scale = max|x| / 7. Codes live in [-7, 7]
    and pack two per byte (low nibble = even dim, high nibble = odd
    dim, two's-complement in 4 bits). Odd D pads with code 0 — a zero
    column contributes nothing to any dot product.
    """
    x = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(x)) / SQ4_LEVELS, 1e-12)
    return sq4_quantize_with_scale(x, scale), scale


@jax.jit
def sq4_quantize_with_scale(x: jax.Array, scale: jax.Array) -> jax.Array:
    """Pack int4 codes using an EXISTING scale (incremental adds must
    stay comparable with the base corpus — ``DenseRetriever.add``)."""
    codes = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale), -SQ4_LEVELS, SQ4_LEVELS
    ).astype(jnp.int8)
    n, d = codes.shape
    if d % 2:
        codes = jnp.concatenate(
            [codes, jnp.zeros((n, 1), jnp.int8)], axis=1
        )
    lo = codes[:, 0::2]
    hi = codes[:, 1::2]
    return (
        (lo.astype(jnp.uint8) & jnp.uint8(0xF))
        | ((hi.astype(jnp.uint8) & jnp.uint8(0xF)) << 4)
    )


def sq4_unpack(packed: jax.Array, d: int) -> jax.Array:
    """uint8 [N, ceil(d/2)] -> int8 codes [N, d] (sign-extended)."""
    lo = (packed & jnp.uint8(0xF)).astype(jnp.int8)
    hi = ((packed >> 4) & jnp.uint8(0xF)).astype(jnp.int8)
    # sign-extend 4-bit two's complement: v >= 8 -> v - 16
    lo = jnp.where(lo >= 8, lo - 16, lo)
    hi = jnp.where(hi >= 8, hi - 16, hi)
    out = jnp.stack([lo, hi], axis=-1).reshape(packed.shape[0], -1)
    return out[:, :d]


@partial(
    jax.jit, static_argnames=("k", "d", "block_size", "recall_target")
)
def sq4_topk(
    queries: jax.Array,
    packed: jax.Array,
    corpus_scale: jax.Array,
    d: int,
    k: int,
    block_size: int = 2097152,
    recall_target: float = 0.99,
    mask: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Cosine/dot top-k over a packed int4 corpus.

    Each block unpacks on the VPU (nibble shift/mask + sign-extend) and
    scores as an ``int8 x int8 -> int32`` MXU matmul against int8-
    quantized queries — the SQ8 kernel's arithmetic over half the HBM
    bytes. Scores return in float space like ``sq8_topk``.
    """
    q_codes, q_scale = sq8_quantize(queries)
    factor = (q_scale * corpus_scale).astype(jnp.float32)
    n = packed.shape[0]
    k = min(k, n)

    # measured r4 (8.8M x 64, 256q): this unpack->matmul form runs
    # 18.9 ms; a no-interleave variant scoring two half-width matmuls
    # (dot(q_even, lo) + dot(q_odd, hi)) measured 34.2 ms — K=32
    # contractions starve the MXU worse than the nibble interleave
    # costs. Both trail int8's 6.9-9.2 ms: like the 1-bit tier, the
    # unpack makes the scan matmul-rate-bound, so this tier's value is
    # CAPACITY (d/2 device bytes/row), not speed (docs/ROOFLINE.md).
    def block_topk(pk, base, kk):
        codes = sq4_unpack(pk, d)
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
                jax.lax.dynamic_slice_in_dim(mask, base, pk.shape[0]),
            )
        s, local = jax.lax.approx_max_k(
            scores, kk, recall_target=recall_target
        )
        return s, local + base

    if n <= block_size:
        return block_topk(packed, 0, k)

    # one fused unpack->matmul->select block per scan step — the binary
    # kernel's measured scheduling preference for unpack chains
    # (docs/ROOFLINE.md "scan vs unroll")
    return blocked_topk(
        block_topk, packed, k, block_size, queries.shape[0],
        unroll_limit=0,
    )
