"""Model shape/invariant tests (mirrors reference ``test/test_models.py``)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latentrag_tpu.models import (
    AE_CLASSES,
    build_autoencoder,
    encode_latents,
    init_autoencoder,
)
from latentrag_tpu.utils.config import AutoencoderConfig

CFG = AutoencoderConfig(input_dim=384, latent_dim=64, hidden_dim=512)


@pytest.fixture(params=["vae", "dae", "cae"])
def ae(request):
    model = build_autoencoder(request.param, CFG)
    params = init_autoencoder(model, jax.random.PRNGKey(0), CFG.input_dim)
    return request.param, model, params


def test_forward_shapes(ae, rng):
    ae_type, model, params = ae
    x = jnp.asarray(rng.standard_normal((7, 384)).astype(np.float32))
    out = model.apply({"params": params}, x, train=False)
    if ae_type == "vae":
        recon, mu, logvar = out
        assert mu.shape == (7, 64) and logvar.shape == (7, 64)
    elif ae_type == "cae":
        recon, z = out
        assert z.shape == (7, 64)
    else:
        recon = out
    assert recon.shape == (7, 384)


def test_latent_shapes_and_determinism(ae, rng):
    ae_type, model, params = ae
    x = jnp.asarray(rng.standard_normal((5, 384)).astype(np.float32))
    z1 = encode_latents(model, params, x)
    z2 = encode_latents(model, params, x)
    assert z1.shape == (5, 64)
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))


def test_cae_latent_normalized(rng):
    model = build_autoencoder("cae", CFG)
    params = init_autoencoder(model, jax.random.PRNGKey(0), 384)
    x = jnp.asarray(rng.standard_normal((6, 384)).astype(np.float32))
    z = encode_latents(model, params, x)
    norms = np.linalg.norm(np.asarray(z), axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)


def test_vae_train_mode_stochastic(rng):
    model = build_autoencoder("vae", CFG)
    params = init_autoencoder(model, jax.random.PRNGKey(0), 384)
    x = jnp.asarray(rng.standard_normal((4, 384)).astype(np.float32))
    r1, *_ = model.apply(
        {"params": params}, x, train=True,
        rngs={"reparam": jax.random.PRNGKey(1)},
    )
    r2, *_ = model.apply(
        {"params": params}, x, train=True,
        rngs={"reparam": jax.random.PRNGKey(2)},
    )
    assert not np.allclose(np.asarray(r1), np.asarray(r2))
    # eval path deterministic
    e1 = model.apply({"params": params}, x, train=False)[0]
    e2 = model.apply({"params": params}, x, train=False)[0]
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


def test_all_variants_registered():
    assert set(AE_CLASSES) == {"vae", "dae", "cae"}
