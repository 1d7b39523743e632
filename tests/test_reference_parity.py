"""Differential parity against the reference's checked-in trained artifacts.

The strongest offline parity proof available: convert the reference's trained
torch checkpoints (``/root/reference/models/checkpoints/*.pth``) into the
Flax modules and assert encode/decode/forward agree with the reference torch
modules to float tolerance on random inputs (VERDICT r1 item 2). The torch
modules are loaded from the read-only reference tree purely as a numerical
oracle.
"""

import os
import sys

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")

REF = "/root/reference"
CKPTS = {
    "vae": f"{REF}/models/checkpoints/vae_text.pth",
    "dae": f"{REF}/models/checkpoints/dae_text.pth",
    "cae": f"{REF}/models/checkpoints/contrastive_ae.pth",
}

pytestmark = pytest.mark.skipif(
    not os.path.isdir(f"{REF}/models"), reason="reference tree not present"
)


def _torch_module(ae_type):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if ae_type == "vae":
        from models.variational_autoencoder import VariationalAutoencoder

        return VariationalAutoencoder(384, 64, 512)
    if ae_type == "dae":
        from models.denoising_autoencoder import DenoisingAutoencoder

        return DenoisingAutoencoder(384, 64, 512)
    from models.contrastive_autoencoder import ContrastiveAutoencoder

    return ContrastiveAutoencoder(384, 64, 512)


@pytest.fixture(scope="module")
def x():
    rng = np.random.default_rng(7)
    # SBERT-like inputs: unit-norm rows with realistic scale
    v = rng.standard_normal((64, 384)).astype(np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


@pytest.mark.parametrize("ae_type", ["vae", "dae", "cae"])
def test_converted_weights_match_torch_oracle(ae_type, x):
    from latentrag_tpu.models import build_autoencoder
    from latentrag_tpu.models.convert_torch import load_reference_checkpoint
    from latentrag_tpu.utils.config import AutoencoderConfig

    params = load_reference_checkpoint(CKPTS[ae_type], ae_type)

    tm = _torch_module(ae_type)
    tm.load_state_dict(
        torch.load(CKPTS[ae_type], map_location="cpu", weights_only=True)
    )
    tm.eval()

    model = build_autoencoder(
        ae_type, AutoencoderConfig(input_dim=384, latent_dim=64,
                                   hidden_dim=512)
    )
    xt = torch.from_numpy(x)

    with torch.no_grad():
        if ae_type == "vae":
            t_recon, t_mu, t_logvar = tm(xt)
            j_recon, j_mu, j_logvar = model.apply(
                {"params": params}, x, train=False
            )
            np.testing.assert_allclose(j_mu, t_mu.numpy(), atol=1e-5)
            np.testing.assert_allclose(j_logvar, t_logvar.numpy(), atol=1e-5)
            np.testing.assert_allclose(j_recon, t_recon.numpy(), atol=1e-5)
        elif ae_type == "dae":
            t_recon = tm(xt)
            j_recon = model.apply({"params": params}, x, train=False)
            np.testing.assert_allclose(j_recon, t_recon.numpy(), atol=1e-5)
        else:
            t_recon, t_z = tm(xt)
            j_recon, j_z = model.apply({"params": params}, x, train=False)
            np.testing.assert_allclose(j_z, t_z.numpy(), atol=1e-5)
            np.testing.assert_allclose(j_recon, t_recon.numpy(), atol=1e-5)

        # retrieval-time latent path (what the pipeline actually serves)
        t_latent = (
            tm.encode(xt)[0] if ae_type == "vae" else tm.encode(xt)
        ).numpy()
    j_latent = np.asarray(
        model.apply({"params": params}, x, method="latent")
    )
    np.testing.assert_allclose(j_latent, t_latent, atol=1e-5)


def test_convert_rejects_wrong_variant():
    from latentrag_tpu.models.convert_torch import load_reference_checkpoint

    with pytest.raises(KeyError):
        # vae checkpoint under dae key map: mu_layer/logvar_layer keys
        # must be reported, not silently dropped
        load_reference_checkpoint(CKPTS["vae"], "dae")


def test_canonical_names_accepted(x):
    from latentrag_tpu.models.convert_torch import load_reference_checkpoint

    p1 = load_reference_checkpoint(CKPTS["cae"], "contrastive")
    p2 = load_reference_checkpoint(CKPTS["cae"], "cae")
    jax.tree.map(np.testing.assert_array_equal, p1, p2)


def test_pipeline_loads_pth_checkpoint(tmp_path):
    # migration path: models.<ae>.checkpoint pointing at a reference .pth
    # loads converted weights without an Orbax store
    from latentrag_tpu.pipeline import load_autoencoder
    from latentrag_tpu.models.convert_torch import load_reference_checkpoint
    from latentrag_tpu.utils import apply_overrides, load_config

    cfg = apply_overrides(load_config(None), [
        "models.dae.input_dim=384", "models.dae.latent_dim=64",
        "models.dae.hidden_dim=512",
        f"models.dae.checkpoint={CKPTS['dae']}",
        f"paths.checkpoints_dir={tmp_path}",
    ])
    model, params = load_autoencoder(cfg, "dae")
    expect = load_reference_checkpoint(CKPTS["dae"], "dae")
    jax.tree.map(np.testing.assert_array_equal, params, expect)
    x = np.zeros((2, 384), np.float32)
    out = model.apply({"params": params}, x, train=False)
    assert out.shape == (2, 384)
