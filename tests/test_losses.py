"""Loss tests (mirrors reference ``test/test_loss_functions.py``: scalarness,
positivity, parameter sensitivity, hard-negative mining behaviour)."""

import numpy as np
import pytest

import jax.numpy as jnp

from latentrag_tpu.training import (
    contrastive_loss,
    cosine_reconstruction,
    dae_loss,
    kl_divergence,
    triplet_loss,
    vae_loss,
)


def test_vae_loss_scalar_and_beta(rng):
    x = jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32))
    xr = jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32))
    mu = jnp.asarray(rng.standard_normal((8, 4)).astype(np.float32))
    logvar = jnp.asarray(rng.standard_normal((8, 4)).astype(np.float32))
    l0, aux = vae_loss(xr, x, mu, logvar, beta=0.0)
    l1, _ = vae_loss(xr, x, mu, logvar, beta=1.0)
    assert l0.shape == () and float(l0) >= 0
    assert float(l1) != float(l0)  # beta matters
    assert float(aux["kl"]) >= 0


def test_perfect_reconstruction_zero():
    x = jnp.ones((4, 8))
    assert float(cosine_reconstruction(x, x)) == pytest.approx(0.0, abs=1e-6)
    assert float(dae_loss(x, x)) == pytest.approx(0.0, abs=1e-9)


def test_kl_zero_for_standard_normal_params():
    mu = jnp.zeros((5, 3))
    logvar = jnp.zeros((5, 3))
    assert float(kl_divergence(mu, logvar)) == pytest.approx(0.0, abs=1e-7)


def test_triplet_margin_semantics():
    a = jnp.zeros((2, 4))
    pos = jnp.zeros((2, 4))
    neg = jnp.ones((2, 4)) * 10
    # far negative, identical positive -> zero loss
    assert float(triplet_loss(a, pos, neg, margin=0.2)) == 0.0
    # identical negative -> loss == margin
    assert float(triplet_loss(a, pos, pos, margin=0.2)) == pytest.approx(0.2)


def test_contrastive_hard_mining_picks_hardest(rng):
    q = jnp.asarray([[0.0, 0.0], [10.0, 10.0]], jnp.float32)
    p = jnp.asarray([[0.1, 0.0], [10.0, 10.1]], jnp.float32)
    mined = float(contrastive_loss(q, p, margin=0.5, mine_hard_negatives=True))
    # hardest in-batch negative is far away (the other pair) -> hinge inactive
    # except via margin; loss bounded by margin
    assert 0.0 <= mined <= 0.5
    provided = float(
        contrastive_loss(
            q, p, jnp.flipud(p), margin=0.5, mine_hard_negatives=False
        )
    )
    assert provided >= 0.0


def test_dae_loss_positive(rng):
    x = jnp.asarray(rng.standard_normal((6, 12)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((6, 12)).astype(np.float32))
    assert float(dae_loss(x, y)) > 0
