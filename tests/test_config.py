import pytest

from latentrag_tpu.utils import (
    Config,
    apply_overrides,
    canonical_ae_type,
    load_config,
)


def test_defaults():
    cfg = Config()
    assert cfg.encoder.hidden_dim == 384
    assert cfg.models.vae.latent_dim == 64
    assert cfg.retrieval.top_k == 10


def test_canonical_ae_names():
    assert canonical_ae_type("contrastive") == "cae"
    assert canonical_ae_type("COE") == "cae"
    assert canonical_ae_type("vae") == "vae"
    assert canonical_ae_type("none") == "none"
    with pytest.raises(ValueError):
        canonical_ae_type("gan")


def test_yaml_roundtrip(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(
        """
project: {name: test, version: "9"}
embedding_model: {name: mini, max_length: 128}
models:
  contrastive: {latent_dim: 32}
training: {epochs: 3, learning_rate: 0.01}
retrieval: {backend: bruteforce, top_k: 7}
unknown_section: {foo: 1}
"""
    )
    cfg = load_config(p)
    assert cfg.project.name == "test"
    assert cfg.encoder.name == "mini" and cfg.encoder.max_length == 128
    assert cfg.models.cae.latent_dim == 32
    assert cfg.training.epochs == 3
    assert cfg.retrieval.top_k == 7


def test_overrides():
    cfg = apply_overrides(Config(), ["training.epochs=2", "retrieval.metric=euclidean"])
    assert cfg.training.epochs == 2
    assert cfg.retrieval.metric == "euclidean"
    with pytest.raises(ValueError):
        apply_overrides(Config(), ["nope.x=1"])


def test_models_for_type():
    cfg = Config()
    assert cfg.models.for_type("contrastive") is cfg.models.cae
    with pytest.raises(ValueError):
        cfg.models.for_type("none")


def test_load_dotenv(tmp_path, monkeypatch):
    from latentrag_tpu.utils import load_dotenv

    p = tmp_path / ".env"
    p.write_text("# comment\nFOO_KEY='abc'\nBAR_KEY=  xyz \nbad line\n")
    monkeypatch.delenv("FOO_KEY", raising=False)
    monkeypatch.setenv("BAR_KEY", "keepme")
    loaded = load_dotenv(str(p))
    import os

    assert os.environ["FOO_KEY"] == "abc"
    assert os.environ["BAR_KEY"] == "keepme"  # existing wins
    assert loaded["BAR_KEY"] == "xyz"
    assert load_dotenv(str(tmp_path / "missing")) == {}
