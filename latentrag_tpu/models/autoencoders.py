"""Latent-compression autoencoders (VAE / DAE / CAE) as Flax modules.

Capability parity with the reference model zoo (``models/base_autoencoder.py:
5-21``, ``variational_autoencoder.py:6-44``, ``denoising_autoencoder.py:8-41``,
``contrastive_autoencoder.py:6-33``): 384→512→64 MLPs compressing sentence
embeddings into a retrieval latent space. Canonical naming: ``vae|dae|cae``
(the reference's ``contrastive``/``coe`` aliases are normalised in config).

Functional design notes:
* ``encode``/``decode``/``__call__`` mirror the reference's abstract surface.
* The VAE's reparameterisation consumes an explicit PRNG key via flax's
  ``'reparam'`` rng collection; in deterministic mode (``train=False``) it
  returns the posterior mean, matching the reference's eval behaviour
  (``variational_autoencoder.py:42``).
* The CAE L2-normalises its latent (``contrastive_autoencoder.py:24-25``) so
  cosine retrieval in latent space is scale-free.
* Params default to fp32 (these MLPs are tiny — the MXU win on TPU comes from
  batching, not precision); activations may be bf16 via ``dtype``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class EncoderMLP(nn.Module):
    hidden_dim: int
    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="hidden")(x)
        x = nn.relu(x)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="out")(x)


class DecoderMLP(nn.Module):
    hidden_dim: int
    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        z = nn.Dense(self.hidden_dim, dtype=self.dtype, name="hidden")(z)
        z = nn.relu(z)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="out")(z)


class VariationalAutoencoder(nn.Module):
    """Gaussian-posterior VAE; ``encode`` returns (mu, logvar)."""

    input_dim: int = 384
    latent_dim: int = 64
    hidden_dim: int = 512
    dtype: Any = jnp.float32

    def setup(self):
        self.enc_hidden = nn.Dense(self.hidden_dim, dtype=self.dtype)
        self.mu_head = nn.Dense(self.latent_dim, dtype=self.dtype)
        self.logvar_head = nn.Dense(self.latent_dim, dtype=self.dtype)
        self.decoder = DecoderMLP(self.hidden_dim, self.input_dim, self.dtype)

    def encode(self, x):
        h = nn.relu(self.enc_hidden(x))
        return self.mu_head(h), self.logvar_head(h)

    def reparameterize(self, mu, logvar, rng):
        eps = jax.random.normal(rng, mu.shape, dtype=mu.dtype)
        return mu + eps * jnp.exp(0.5 * logvar)

    def decode(self, z):
        return self.decoder(z)

    def __call__(self, x, train: bool = False):
        mu, logvar = self.encode(x)
        if train:
            z = self.reparameterize(mu, logvar, self.make_rng("reparam"))
        else:
            z = mu  # deterministic eval path
        return self.decode(z), mu, logvar

    def latent(self, x):
        """Retrieval-time latent = posterior mean."""
        return self.encode(x)[0]


class DenoisingAutoencoder(nn.Module):
    """Plain MLP AE trained noisy→clean."""

    input_dim: int = 384
    latent_dim: int = 64
    hidden_dim: int = 512
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = EncoderMLP(self.hidden_dim, self.latent_dim, self.dtype)
        self.decoder = DecoderMLP(self.hidden_dim, self.input_dim, self.dtype)

    def encode(self, x):
        return self.encoder(x)

    def decode(self, z):
        return self.decoder(z)

    def __call__(self, x, train: bool = False):
        return self.decode(self.encode(x))

    def latent(self, x):
        return self.encode(x)


class ContrastiveAutoencoder(nn.Module):
    """AE whose latent is L2-normalised; ``__call__`` returns (recon, z)."""

    input_dim: int = 384
    latent_dim: int = 64
    hidden_dim: int = 512
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = EncoderMLP(self.hidden_dim, self.latent_dim, self.dtype)
        self.decoder = DecoderMLP(self.hidden_dim, self.input_dim, self.dtype)

    def encode(self, x):
        z = self.encoder(x)
        norm = jnp.linalg.norm(z, axis=-1, keepdims=True)
        return z / jnp.maximum(norm, 1e-12)

    def decode(self, z):
        return self.decoder(z)

    def __call__(self, x, train: bool = False):
        z = self.encode(x)
        return self.decode(z), z

    def latent(self, x):
        return self.encode(x)


AE_CLASSES = {
    "vae": VariationalAutoencoder,
    "dae": DenoisingAutoencoder,
    "cae": ContrastiveAutoencoder,
}


def build_autoencoder(ae_type: str, cfg) -> nn.Module:
    """Instantiate from an ``AutoencoderConfig`` (utils.config)."""
    cls = AE_CLASSES[ae_type]
    return cls(
        input_dim=cfg.input_dim,
        latent_dim=cfg.latent_dim,
        hidden_dim=cfg.hidden_dim,
    )


def init_autoencoder(model: nn.Module, rng: jax.Array, input_dim: int):
    """Initialise params with a dummy batch; returns the params pytree."""
    dummy = jnp.zeros((1, input_dim), jnp.float32)
    init_rngs = {"params": rng, "reparam": rng}
    return model.init(init_rngs, dummy, train=False)["params"]


def encode_latents(model: nn.Module, params, x: jax.Array) -> jax.Array:
    """Deterministic retrieval-time latent for any AE type (VAE → mu)."""
    return model.apply({"params": params}, x, method="latent")
