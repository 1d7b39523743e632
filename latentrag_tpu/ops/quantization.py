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
) -> tuple[jax.Array, jax.Array]:
    """Cosine/dot top-k over an int8 corpus.

    Queries are fp32/bf16 (prepared for the metric: pre-normalized for
    cosine) and quantized on the fly; scores returned in the original float
    scale. Indices/candidates via ``approx_max_k`` per block.
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
        s, local = jax.lax.approx_max_k(
            scores, kk, recall_target=recall_target
        )
        return s, local + base

    if n <= block_size:
        return block_topk(corpus_codes, 0, k)

    if n <= 16 * block_size:
        # full blocks slice the original codes (no padded copy, no mask);
        # the remainder gets its own smaller block so pad rows never exist
        n_full = n // block_size
        parts_s, parts_i = [], []
        for b in range(n_full):
            blk = jax.lax.slice_in_dim(
                corpus_codes, b * block_size, (b + 1) * block_size, axis=0
            )
            s, i = block_topk(blk, b * block_size, k)
            parts_s.append(s)
            parts_i.append(i)
        rem = n - n_full * block_size
        if rem:
            blk = jax.lax.slice_in_dim(corpus_codes, n_full * block_size, n,
                                       axis=0)
            s, i = block_topk(blk, n_full * block_size, min(k, rem))
            parts_s.append(s)
            parts_i.append(i)
        cat_s = jnp.concatenate(parts_s, axis=1)
        cat_i = jnp.concatenate(parts_i, axis=1)
        top_s, sel = jax.lax.top_k(cat_s, k)
        return top_s, jnp.take_along_axis(cat_i, sel, axis=1)

    # many blocks: lax.scan, one block per step, to bound program size —
    # same design + measurement as ops/topk.py (scan ≈ unrolled at
    # >=1M-row blocks, docs/ROOFLINE.md "scan vs unroll"); an unbounded
    # unroll at ~200M int8 rows would emit ~100 kernel instances
    n_super = n // block_size
    nq = q_codes.shape[0]
    init = (
        jnp.full((nq, k), float(-3.4e38), dtype=jnp.float32),
        jnp.zeros((nq, k), dtype=jnp.int32),
    )

    def scan_body(carry, b_idx):
        run_s, run_i = carry
        base = b_idx * block_size
        blk = jax.lax.dynamic_slice_in_dim(corpus_codes, base, block_size,
                                           axis=0)
        s, i = block_topk(blk, base, k)
        cat_s = jnp.concatenate([run_s, s], axis=1)
        cat_i = jnp.concatenate([run_i, i], axis=1)
        new_s, sel = jax.lax.top_k(cat_s, k)
        return (new_s, jnp.take_along_axis(cat_i, sel, axis=1)), None

    (top_s, top_i), _ = jax.lax.scan(
        scan_body, init, jnp.arange(n_super, dtype=jnp.int32)
    )
    parts_s, parts_i = [top_s], [top_i]
    b = n_super * block_size
    while b < n:
        e = min(b + block_size, n)
        blk = jax.lax.slice_in_dim(corpus_codes, b, e, axis=0)
        s, i = block_topk(blk, b, min(k, e - b))
        parts_s.append(s)
        parts_i.append(i)
        b = e
    if len(parts_s) > 1:
        cat_s = jnp.concatenate(parts_s, axis=1)
        cat_i = jnp.concatenate(parts_i, axis=1)
        top_s, sel = jax.lax.top_k(cat_s, k)
        top_i = jnp.take_along_axis(cat_i, sel, axis=1)
    return top_s, top_i
