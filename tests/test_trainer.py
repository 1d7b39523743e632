"""End-to-end trainer tests on tiny synthetic data (the reference pattern of
exercising full loops cheaply, ``test/test_train_scripts.py``), plus
checkpoint round-trip and data-parallel equivalence on the CPU mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latentrag_tpu.models import build_autoencoder, encode_latents
from latentrag_tpu.parallel import make_mesh
from latentrag_tpu.training import Trainer, load_checkpoint
from latentrag_tpu.utils.config import AutoencoderConfig, TrainingConfig

ACFG = AutoencoderConfig(input_dim=32, latent_dim=8, hidden_dim=16)


def _vae_data(rng, n=64):
    x = rng.standard_normal((n, 32)).astype(np.float32)
    return {"x": x, "y": x}


def _triplet_data(rng, n=64):
    return {
        "q": rng.standard_normal((n, 32)).astype(np.float32),
        "p": rng.standard_normal((n, 32)).astype(np.float32),
        "n": rng.standard_normal((n, 32)).astype(np.float32),
    }


@pytest.mark.parametrize("ae_type", ["vae", "dae", "cae"])
def test_training_reduces_loss(rng, ae_type):
    cfg = TrainingConfig(batch_size=16, epochs=8, learning_rate=1e-2,
                         early_stop_patience=100)
    model = build_autoencoder(ae_type, ACFG)
    data = _triplet_data(rng) if ae_type == "cae" else _vae_data(rng)
    val = _triplet_data(rng, 32) if ae_type == "cae" else _vae_data(rng, 32)
    tr = Trainer(model, ae_type, cfg)
    res = tr.fit(data, val)
    assert res.epochs_ran >= 1
    first_train = res.history[0][1]
    last_train = res.history[-1][1]
    assert last_train <= first_train  # learning happened


def test_early_stopping_fires(rng):
    cfg = TrainingConfig(batch_size=16, epochs=50, learning_rate=0.0,
                         early_stop_patience=2, early_stop_min_delta=1e-4)
    model = build_autoencoder("dae", ACFG)
    tr = Trainer(model, "dae", cfg)
    res = tr.fit(_vae_data(rng), _vae_data(rng, 32))
    assert res.stopped_early
    assert res.epochs_ran <= 5


def test_checkpoint_roundtrip(rng, tmp_path):
    cfg = TrainingConfig(batch_size=16, epochs=2, learning_rate=1e-3,
                         early_stop_patience=100)
    model = build_autoencoder("dae", ACFG)
    tr = Trainer(model, "dae", cfg)
    ckpt = str(tmp_path / "ckpt")
    res = tr.fit(_vae_data(rng), _vae_data(rng, 32), checkpoint_dir=ckpt)
    restored = load_checkpoint(ckpt)
    x = jnp.asarray(rng.standard_normal((3, 32)).astype(np.float32))
    z1 = encode_latents(model, res.params, x)
    z2 = encode_latents(model, restored["params"], x)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=1e-6)
    assert "opt_state" in restored  # resumable, unlike the reference


def test_grad_clip_and_weight_decay_path(rng):
    cfg = TrainingConfig(batch_size=16, epochs=2, learning_rate=1e-3,
                         weight_decay=1e-4, grad_clip_norm=1.0,
                         early_stop_patience=100, lr_plateau_factor=0.5,
                         lr_plateau_patience=1)
    model = build_autoencoder("cae", ACFG)
    tr = Trainer(model, "cae", cfg)
    res = tr.fit(_triplet_data(rng), _triplet_data(rng, 32))
    assert res.epochs_ran == 2


def test_data_parallel_matches_single_device(rng, eight_devices):
    cfg = TrainingConfig(batch_size=32, epochs=3, learning_rate=1e-2,
                         early_stop_patience=100, seed=7)
    data, val = _vae_data(rng, 128), _vae_data(rng, 32)
    model = build_autoencoder("dae", ACFG)

    res_single = Trainer(model, "dae", cfg).fit(data, val)
    mesh = make_mesh(8)
    res_dp = Trainer(model, "dae", cfg, mesh=mesh).fit(data, val)

    x = jnp.asarray(rng.standard_normal((4, 32)).astype(np.float32))
    z1 = encode_latents(model, res_single.params, x)
    z2 = encode_latents(model, res_dp.params, x)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), rtol=2e-3, atol=2e-4)
