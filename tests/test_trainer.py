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


def test_scale_lr_plain_adam(rng):
    # ADVICE r1: InjectHyperparamsState is a NamedTuple, so the old walk
    # recursed past the un-chained plain-Adam state and the plateau schedule
    # silently did nothing
    from latentrag_tpu.training.trainer import _scale_lr

    cfg = TrainingConfig(batch_size=16, epochs=1, learning_rate=1e-3,
                         weight_decay=0.0, grad_clip_norm=0.0)
    model = build_autoencoder("dae", ACFG)
    tr = Trainer(model, "dae", cfg)
    data = _vae_data(rng, 32)
    params = jax.jit(
        lambda r: model.init({"params": r, "reparam": r},
                             jnp.zeros((1, 32)), train=False)
    )(jax.random.PRNGKey(0))["params"]
    opt_state = tr.tx.init(params)

    def find_lr(state):
        if hasattr(state, "hyperparams") and "learning_rate" in state.hyperparams:
            return float(state.hyperparams["learning_rate"])
        if isinstance(state, tuple):
            for item in state:
                lr = find_lr(item)
                if lr is not None:
                    return lr
        return None

    before = find_lr(opt_state)
    opt_state = _scale_lr(opt_state, 0.5)
    after = find_lr(opt_state)
    assert before is not None and after == pytest.approx(before * 0.5)


def test_ragged_val_batch_on_mesh(rng, eight_devices):
    # ADVICE r1: a 21-row val set on an 8-device mesh crashed device_put
    # with NamedSharding(P('data')); ragged tail batches now replicate
    cfg = TrainingConfig(batch_size=16, epochs=2, learning_rate=1e-3)
    model = build_autoencoder("dae", ACFG)
    tr = Trainer(model, "dae", cfg, mesh=make_mesh(8))
    res = tr.fit(_vae_data(rng, 64), _vae_data(rng, 21))
    assert res.epochs_ran == 2
    assert np.isfinite(res.best_val_loss)


def test_small_dataset_still_trains(rng):
    # batch_size > dataset used to yield zero train batches (train loss
    # logged as nan, params never updated)
    cfg = TrainingConfig(batch_size=128, epochs=3, learning_rate=1e-2,
                         early_stop_patience=100)
    model = build_autoencoder("dae", ACFG)
    tr = Trainer(model, "dae", cfg)
    res = tr.fit(_vae_data(rng, 40), _vae_data(rng, 8))
    assert all(np.isfinite(t) for _, t, _ in res.history)
    assert res.history[-1][1] < res.history[0][1]


def test_cae_trains_without_negative_arrays(rng):
    # with in-batch mining the {q, p} arrays suffice; dataset negatives are
    # neither required nor encoded
    cfg = TrainingConfig(batch_size=16, epochs=2, learning_rate=1e-3,
                         mine_hard_negatives=True)
    model = build_autoencoder("cae", ACFG)
    tr = Trainer(model, "cae", cfg)
    data = {k: v for k, v in _triplet_data(rng).items() if k != "n"}
    val = {k: v for k, v in _triplet_data(rng, 16).items() if k != "n"}
    res = tr.fit(data, val)
    assert np.isfinite(res.best_val_loss)


def test_ae_trainer_resumes_with_optimizer_state(tmp_path, rng):
    """r4: --resume continues a preempted AE run from the last saved
    improvement — params AND the optax state (rebuilt into its namedtuple
    structure from the Orbax dict restore) plus the epoch counter."""
    from latentrag_tpu.models import build_autoencoder
    from latentrag_tpu.training import Trainer
    from latentrag_tpu.utils.config import AutoencoderConfig, TrainingConfig

    x = rng.standard_normal((64, 16)).astype(np.float32)
    data = {"x": x, "y": x}
    val = {"x": x[:8], "y": x[:8]}
    model = build_autoencoder("dae", AutoencoderConfig(
        input_dim=16, latent_dim=4, hidden_dim=8))
    ckpt = str(tmp_path / "dae")

    t1 = Trainer(model, "dae", TrainingConfig(
        batch_size=16, epochs=2, learning_rate=1e-3,
        early_stop_patience=100))
    r1 = t1.fit(data, val, checkpoint_dir=ckpt)
    assert len(r1.history) == 2

    t2 = Trainer(model, "dae", TrainingConfig(
        batch_size=16, epochs=5, learning_rate=1e-3,
        early_stop_patience=100))
    r2 = t2.fit(data, val, checkpoint_dir=ckpt, resume=True)
    assert r2.history[0][0] >= 1  # continued (from last improvement)
    assert r2.best_val_loss <= r1.best_val_loss + 1e-7
