"""Binary (1-bit sign) corpus quantization with asymmetric TPU scoring.

The extreme capacity tier (cf. binary embedding retrieval at production
scale, Tencent BEBR arXiv:2302.08714, and FAISS's IndexBinary family): each
vector stores only its sign bits — 8 B/vector at D=64, 16x smaller than
bf16 — so a ~1B-vector index fits one v5e chip's HBM.

TPU-first design: bits live packed in HBM as uint32 [N, D/32]; each corpus
block unpacks on the VPU (broadcast shift + mask → ±1) and scores against
FULL-PRECISION queries on the MXU (asymmetric scoring — queries lose
nothing, only the corpus is binarized; measured 3.5x faster than symmetric
XOR+popcount Hamming, which has no MXU path). Ranking recall is recovered
the standard way: fetch an oversampled candidate set by binary score, then
re-rank the survivors exactly.

Measured positioning (docs/ROOFLINE.md): unpacking makes the scan matmul-
rate-bound, so for corpora that FIT in HBM the int8 tier is strictly
faster — this tier exists for HBM-overflow corpora (~1B vectors/chip),
where only the packed bits stay device-resident.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .topk import _apply_mask, blocked_topk

BITS = 32


def binary_quantize(x: jax.Array) -> jax.Array:
    """Pack sign bits: [N, D] floats -> uint32 [N, ceil(D/32)].

    Bit j of word w is 1 iff x[:, w*32+j] >= 0. D pads to a 32 multiple
    (pad dims contribute a constant to every score — rank-neutral).
    """
    n, d = x.shape
    pad = (-d) % BITS
    if pad:
        # pad with -1 so the pad bits are 0
        x = jnp.concatenate(
            [x, -jnp.ones((n, pad), x.dtype)], axis=1
        )
    bits = (x >= 0).astype(jnp.uint32)
    bits = bits.reshape(n, -1, BITS)
    shifts = jnp.arange(BITS, dtype=jnp.uint32)
    return jnp.sum(bits << shifts[None, None, :], axis=-1, dtype=jnp.uint32)


def binary_unpack(packed: jax.Array, d: int) -> jax.Array:
    """uint32 [N, W] -> ±1 int8 [N, d] (pad columns dropped)."""
    shifts = jnp.arange(BITS, dtype=jnp.uint32)
    bits = (packed[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    pm1 = (2 * bits.astype(jnp.int8) - 1).reshape(packed.shape[0], -1)
    return pm1[:, :d]


def binary_quantize_t(x: jax.Array) -> jax.Array:
    """Pack sign bits TRANSPOSED: [N, D] floats -> uint32 [ceil(D/32), N].

    Same bits as ``binary_quantize`` (word w of column n == word w of row
    n there), laid out so corpus rows ride the 128-lane dimension — the
    layout ``binary_topk_t`` consumes.
    """
    return binary_quantize(x).T


def binary_unpack_t(packed_t: jax.Array, d: int) -> jax.Array:
    """uint32 [W, N] -> ±1 int8 [d, N] — the transposed unpack.

    Every shift/mask op here runs over an [*, N] vector with corpus rows
    on the 128-lane axis (full lane width); the row-major unpack's
    [N, W, 32] intermediates put 32 on the lane axis (25% occupancy) and
    its [N, d] output 64 (50%) — which is what made the packed sweep
    unpack-rate-bound (docs/ROOFLINE.md).
    """
    w, n = packed_t.shape
    shifts = jnp.arange(BITS, dtype=jnp.uint32)
    bits = (packed_t[:, None, :] >> shifts[None, :, None]) & jnp.uint32(1)
    pm1 = (2 * bits.astype(jnp.int8) - 1).reshape(w * BITS, n)
    return pm1[:d]


@partial(jax.jit, static_argnames=("k", "d", "block_size", "recall_target"))
def binary_topk_t(
    queries: jax.Array,
    packed_t: jax.Array,
    d: int,
    k: int,
    block_size: int = 1_048_576,
    recall_target: float = 0.95,
    mask: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Asymmetric top-k over a TRANSPOSED packed store ([W, N] uint32).

    Scores and rank order are identical to ``binary_topk`` over the
    row-major store (same bits, same estimator); only the unpack's lane
    occupancy differs. Corpus blocks slice the lane axis.
    """
    n = packed_t.shape[1]
    k = min(k, n)
    q = queries.astype(jnp.bfloat16)

    def block_topk(pk_t, base, kk):
        c = binary_unpack_t(pk_t, d).astype(jnp.bfloat16)  # [d, B] ±1
        dots = jax.lax.dot_general(
            q, c,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if mask is not None:
            dots = _apply_mask(
                dots,
                jax.lax.dynamic_slice_in_dim(mask, base, pk_t.shape[1]),
            )
        s, i = jax.lax.approx_max_k(dots, kk, recall_target=recall_target)
        return s, i + base

    if n <= block_size:
        return block_topk(packed_t, 0, k)
    return blocked_topk(block_topk, packed_t, k, block_size, q.shape[0],
                        unroll_limit=0, axis=1)


@partial(jax.jit, static_argnames=("k", "d", "block_size", "recall_target"))
def binary_topk(
    queries: jax.Array,
    packed: jax.Array,
    d: int,
    k: int,
    block_size: int = 1_048_576,
    recall_target: float = 0.95,
    mask: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Asymmetric top-k: fp/bf16 queries vs sign-bit corpus.

    Returns (scores, idx) where score = dot(q, sign(c)) — a monotone proxy
    for cosine against the binarized corpus. Fetch k = oversample *
    final_k and re-rank the survivors exactly for production recall.
    ``mask`` (bool [N], optional) restricts stage-1 eligibility; callers
    must sentinel NEG_INF-scored candidates before rescoring (see
    ``ops.topk``).
    """
    n = packed.shape[0]
    k = min(k, n)
    q = queries.astype(jnp.bfloat16)

    def block_topk(pk, base, kk):
        c = binary_unpack(pk, d).astype(jnp.bfloat16)  # [B, d] ±1
        dots = jax.lax.dot_general(
            q, c,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if mask is not None:
            dots = _apply_mask(
                dots,
                jax.lax.dynamic_slice_in_dim(mask, base, pk.shape[0]),
            )
        s, i = jax.lax.approx_max_k(dots, kk, recall_target=recall_target)
        return s, i + base

    if n <= block_size:
        return block_topk(packed, 0, k)

    # unroll_limit=0: ALWAYS scan one block per step. Measured (r3,
    # in-program methodology, docs/ROOFLINE.md "scan vs unroll"): for this
    # unpack+matmul kernel any unrolling LOSES — 100M: scan 73.7 ms vs
    # 8-way-unrolled 115.5 ms; 32M: scan 25.7 ms vs 16-block unrolled
    # 39.3 ms. The VPU unpack chain schedules worse when unrolled copies
    # compete for VMEM; a single-block body keeps unpack → matmul →
    # approx_max_k fused tile-wise.
    return blocked_topk(block_topk, packed, k, block_size, q.shape[0],
                        unroll_limit=0)
