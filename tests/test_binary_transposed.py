"""Transposed packed-binary stage 1: XLA lane-major sweep
(``binary_topk_t``) and the Mosaic fused kernel (``pallas_binary_topk``,
interpret mode on CPU) against the row-major oracle — identical bits,
identical estimator, so score MULTISETS must match exactly (sign-dot
ties at d=64 are the norm; id equality is not required)."""

import jax.numpy as jnp
import numpy as np
import pytest

from latentrag_tpu.ops.binary import (
    binary_quantize,
    binary_quantize_t,
    binary_topk,
    binary_topk_t,
    binary_unpack,
    binary_unpack_t,
)

N, D, K, Q = 20_011, 64, 10, 16


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    x = rng.normal(size=(N, D)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = rng.normal(size=(Q, D)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(q)


def test_transposed_pack_same_bits(data):
    x, _ = data
    pk = binary_quantize(x)
    pkt = binary_quantize_t(x)
    np.testing.assert_array_equal(np.asarray(pkt), np.asarray(pk).T)
    np.testing.assert_array_equal(
        np.asarray(binary_unpack_t(pkt, D)),
        np.asarray(binary_unpack(pk, D)).T,
    )


def test_transposed_topk_scores_match_row_major(data):
    x, q = data
    s_ref, _ = binary_topk(q, binary_quantize(x), d=D, k=K,
                           recall_target=1.0)
    # exercise the axis=1 block path with a non-multiple block size
    s_t, i_t = binary_topk_t(q, binary_quantize_t(x), d=D, k=K,
                             block_size=8_192, recall_target=1.0)
    np.testing.assert_allclose(
        np.sort(np.asarray(s_t)), np.sort(np.asarray(s_ref)), atol=1e-5
    )
    assert np.asarray(i_t).max() < N and np.asarray(i_t).min() >= 0


def test_pallas_binary_topk_interpret(data):
    from latentrag_tpu.ops.pallas_topk import pallas_binary_topk

    x, q = data
    s_ref, _ = binary_topk(q, binary_quantize(x), d=D, k=K,
                           recall_target=1.0)
    s_p, i_p = pallas_binary_topk(
        q, binary_quantize_t(x), d=D, k=K, block_n=1024, interpret=True
    )
    # exact rescore inside the wrapper -> exact sign-dots; the fold is
    # quasi-exact (lane collisions), so allow <=1 slip per query
    a = np.sort(np.asarray(s_p), axis=1)
    b = np.sort(np.asarray(s_ref), axis=1)
    assert np.mean(a == b) >= 0.9
    ids = np.asarray(i_p)
    assert ids.max() < N and ids.min() >= 0
    # no duplicate candidates per query
    for row in ids:
        assert len(set(map(int, row))) == K
