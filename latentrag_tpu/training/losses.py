"""Training objectives for the three autoencoder variants.

Parity with the reference losses (``training/loss_functions.py:13-79``):

* VAE: cosine reconstruction ``(1 - cos(x̂, x)).mean()`` + β·KL where
  KL = ``-0.5·mean(1 + logvar - mu² - e^logvar)``;
* DAE: plain MSE (noisy input → clean target);
* contrastive: triplet margin loss with either in-batch hard-negative mining
  (masked pairwise-distance row-min) or provided/permuted negatives.

All pure jittable functions over arrays; reductions accumulate in fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cosine_reconstruction(x_recon: jax.Array, x: jax.Array) -> jax.Array:
    x_recon = x_recon.astype(jnp.float32)
    x = x.astype(jnp.float32)
    dot = jnp.sum(x_recon * x, axis=-1)
    nr = jnp.linalg.norm(x_recon, axis=-1)
    nx = jnp.linalg.norm(x, axis=-1)
    cos = dot / jnp.maximum(nr * nx, 1e-12)
    return jnp.mean(1.0 - cos)


def kl_divergence(mu: jax.Array, logvar: jax.Array) -> jax.Array:
    mu = mu.astype(jnp.float32)
    logvar = logvar.astype(jnp.float32)
    return -0.5 * jnp.mean(1.0 + logvar - jnp.square(mu) - jnp.exp(logvar))


def vae_loss(
    x_recon: jax.Array,
    x: jax.Array,
    mu: jax.Array,
    logvar: jax.Array,
    beta: float = 1e-3,
) -> tuple[jax.Array, dict]:
    recon = cosine_reconstruction(x_recon, x)
    kl = kl_divergence(mu, logvar)
    return recon + beta * kl, {"recon": recon, "kl": kl}


def dae_loss(x_recon: jax.Array, x_clean: jax.Array) -> jax.Array:
    d = x_recon.astype(jnp.float32) - x_clean.astype(jnp.float32)
    return jnp.mean(jnp.square(d))


def _pairwise_dists(a: jax.Array, b: jax.Array) -> jax.Array:
    """Euclidean distance matrix [N, M] with fp32 accumulation."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    a_sq = jnp.sum(jnp.square(a), axis=1, keepdims=True)
    b_sq = jnp.sum(jnp.square(b), axis=1)[None, :]
    d2 = a_sq + b_sq - 2.0 * (a @ b.T)
    return jnp.sqrt(jnp.maximum(d2, 0.0))


def triplet_loss(
    anchor: jax.Array,
    positive: jax.Array,
    negative: jax.Array,
    margin: float = 0.2,
) -> jax.Array:
    d_pos = jnp.linalg.norm(
        anchor.astype(jnp.float32) - positive.astype(jnp.float32), axis=-1
    )
    d_neg = jnp.linalg.norm(
        anchor.astype(jnp.float32) - negative.astype(jnp.float32), axis=-1
    )
    return jnp.mean(jnp.maximum(d_pos - d_neg + margin, 0.0))


def contrastive_loss(
    z_query: jax.Array,
    z_positive: jax.Array,
    z_negative: jax.Array | None = None,
    margin: float = 0.2,
    mine_hard_negatives: bool = True,
) -> jax.Array:
    """Triplet margin loss over latent codes.

    With ``mine_hard_negatives`` the negative for anchor i is the hardest
    in-batch positive j≠i (row-min of the masked distance matrix — the
    reference's cdist + diagonal-inf trick, ``loss_functions.py:69-72``)
    and ``z_negative`` is IGNORED — mining is config-driven, so callers
    should not compute/pass negatives in that mode (the Trainer doesn't).
    Otherwise uses the provided negatives (or a batch roll as a stand-in for
    the reference's random permutation, which keeps the function pure).
    """
    if mine_hard_negatives:
        d = _pairwise_dists(z_query, z_positive)
        n = d.shape[0]
        eye = jnp.eye(n, dtype=bool)
        # duplicate positives (SQuAD: ~6 questions share one context) are
        # by construction the closest points — mining one as the negative
        # makes negative == positive, a zero-gradient anchor; exclude them
        # like the diagonal
        dup = jnp.all(
            z_positive[:, None, :] == z_positive[None, :, :], axis=-1
        )
        d = jnp.where(eye | dup, jnp.inf, d)
        hard_idx = jnp.argmin(d, axis=1)
        negative = z_positive[hard_idx]
    elif z_negative is not None:
        negative = z_negative
    else:
        negative = jnp.roll(z_positive, 1, axis=0)
    return triplet_loss(z_query, z_positive, negative, margin)
