"""Similarity-space transforms: normalization, whitening, score kernels.

Metric support matches (and extends) the reference: cosine and euclidean
(``retrieval/bruteforce.py:58-83``), plus Mahalanobis — advertised by the
reference README but never implemented there (SURVEY §2.2). Mahalanobis is
realised TPU-style: factor the inverse covariance once (Cholesky), whiten both
sides, and the hot path stays a plain MXU matmul (euclidean in whitened space).

Score convention everywhere: **higher is better**. Euclidean/Mahalanobis
scores are negated squared distances, so all metrics share one top-k path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

METRICS = ("cosine", "dot", "euclidean", "mahalanobis")


@jax.jit
def l2_normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Row-wise L2 normalization (fp32 accumulation for the norm)."""
    norm = jnp.sqrt(
        jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    )
    return (x / jnp.maximum(norm, eps).astype(x.dtype)).astype(x.dtype)


@partial(jax.jit, static_argnames=("shrinkage",))
def estimate_covariance(x: jax.Array, shrinkage: float = 1e-3) -> jax.Array:
    """Empirical covariance with diagonal shrinkage toward mean variance.

    Shrinkage keeps the factorization well-conditioned for small samples
    (the reference imported ``EmpiricalCovariance`` but never used it).
    """
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=0, keepdims=True)
    xc = x - mu
    cov = (xc.T @ xc) / jnp.maximum(x.shape[0] - 1, 1)
    avg_var = jnp.trace(cov) / cov.shape[0]
    eye = jnp.eye(cov.shape[0], dtype=cov.dtype)
    return (1.0 - shrinkage) * cov + shrinkage * avg_var * eye


@jax.jit
def whitening_factor(cov: jax.Array) -> jax.Array:
    """W with ``(x-y) Σ⁻¹ (x-y)ᵀ == ||xW - yW||²``.

    With Σ = L Lᵀ (Cholesky), W = L⁻ᵀ. Computed once at index build; queries
    and corpus are whitened by a single matmul each.
    """
    L = jnp.linalg.cholesky(cov.astype(jnp.float32))
    eye = jnp.eye(cov.shape[0], dtype=jnp.float32)
    L_inv = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
    return L_inv.T  # x @ W = x @ L^-T  => whitened coordinates


def whiten(x: jax.Array, w: jax.Array) -> jax.Array:
    return (x.astype(jnp.float32) @ w).astype(x.dtype)


def pairwise_scores(
    queries: jax.Array, corpus: jax.Array, metric: str = "cosine"
) -> jax.Array:
    """Dense [Q, N] score block. Inputs are assumed *prepared*:

    - cosine: both sides already L2-normalized (score = dot);
    - euclidean: raw vectors (score = -||q - c||²);
    - mahalanobis: both sides already whitened (then identical to euclidean).

    One MXU matmul in every case, fp32 accumulation.
    """
    if metric not in METRICS:
        raise ValueError(f"metric {metric!r} not in {METRICS}")
    # HIGHEST keeps fp32 inputs fp32-accurate on the MXU (multi-pass bf16);
    # for speed-of-light scoring pass bf16 inputs — they take the native path.
    dots = jax.lax.dot_general(
        queries,
        corpus,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if metric in ("cosine", "dot"):
        return dots
    q_sq = jnp.sum(
        jnp.square(queries.astype(jnp.float32)), axis=-1, keepdims=True
    )
    c_sq = jnp.sum(jnp.square(corpus.astype(jnp.float32)), axis=-1)[None, :]
    return 2.0 * dots - q_sq - c_sq  # = -||q - c||²


def prepare_for_metric(
    x: jax.Array, metric: str, whitener: jax.Array | None = None
) -> jax.Array:
    """Apply the one-time per-side transform for a metric (see above)."""
    if metric == "cosine":
        return l2_normalize(x)
    if metric == "mahalanobis":
        if whitener is None:
            raise ValueError("mahalanobis requires a whitening factor")
        return whiten(x, whitener)
    return x
