"""Differential test of the HF→Flax weight conversion.

Constructs a small random-weight HF BertModel locally (no hub access
needed), converts it with ``models.encoder.convert``, and checks the Flax
encoder reproduces HF's mean-pooled sentence embeddings — the fidelity
guarantee behind loading real all-MiniLM-L6-v2 checkpoints (the analogue of
the reference's stored-vs-recomputed alignment test,
``test/test_alignment_squad_embeddings.py``).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from latentrag_tpu.models.encoder.convert import convert_hf_bert_to_params
from latentrag_tpu.models.encoder.minilm import MiniLMEncoder


@pytest.fixture(scope="module")
def hf_model_and_params(tmp_path_factory):
    cfg = transformers.BertConfig(
        vocab_size=120,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=64,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    model = transformers.BertModel(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("hfmodel")
    model.save_pretrained(str(path))
    params, _ = convert_hf_bert_to_params(str(path))
    return model, params, cfg


def test_converted_weights_match_hf_forward(hf_model_and_params, rng):
    model, params, cfg = hf_model_and_params
    enc = MiniLMEncoder(
        vocab_size=cfg.vocab_size,
        hidden_dim=cfg.hidden_size,
        num_layers=cfg.num_hidden_layers,
        num_heads=cfg.num_attention_heads,
        mlp_dim=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        normalize=True,
        dtype=jnp.float32,
    )

    ids = rng.integers(0, cfg.vocab_size, size=(3, 10)).astype(np.int32)
    mask = np.ones((3, 10), np.int32)
    mask[1, 6:] = 0
    mask[2, 4:] = 0

    ours = np.asarray(
        enc.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    )

    with torch.no_grad():
        out = model(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).last_hidden_state
        m = torch.tensor(mask.astype(np.float32)).unsqueeze(-1)
        pooled = (out * m).sum(1) / m.sum(1)
        pooled = torch.nn.functional.normalize(pooled, dim=-1)

    np.testing.assert_allclose(ours, pooled.numpy(), atol=2e-5)


def test_conversion_covers_all_layers(hf_model_and_params):
    _, params, cfg = hf_model_and_params
    for i in range(cfg.num_hidden_layers):
        assert f"layer_{i}" in params
        layer = params[f"layer_{i}"]
        assert set(layer) == {
            "q", "k", "v", "attn_out", "attn_ln", "mlp_in", "mlp_out",
            "mlp_ln",
        }
    assert params["word_embeddings"]["embedding"].shape == (
        cfg.vocab_size, cfg.hidden_size,
    )


def test_cross_encoder_conversion_matches_hf_logits(tmp_path, rng):
    """HF BertForSequenceClassification (1 label) -> CrossEncoderModel:
    converted pair-classification logits must match torch to ~2e-5 in
    fp32 — the fidelity guarantee behind loading real ms-marco
    cross-encoder checkpoints."""
    from latentrag_tpu.models.encoder.convert import (
        convert_hf_cross_encoder_to_params,
    )
    from latentrag_tpu.models.encoder.cross import CrossEncoderModel

    cfg = transformers.BertConfig(
        vocab_size=120,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=64,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        num_labels=1,
        classifier_dropout=0.0,
    )
    torch.manual_seed(1)
    model = transformers.BertForSequenceClassification(cfg)
    model.eval()
    model.save_pretrained(str(tmp_path / "xenc"))
    params, _ = convert_hf_cross_encoder_to_params(str(tmp_path / "xenc"))

    ours_mod = CrossEncoderModel(
        vocab_size=cfg.vocab_size,
        hidden_dim=cfg.hidden_size,
        num_layers=cfg.num_hidden_layers,
        num_heads=cfg.num_attention_heads,
        mlp_dim=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        dtype=jnp.float32,
    )
    ids = rng.integers(0, cfg.vocab_size, size=(3, 12)).astype(np.int32)
    mask = np.ones((3, 12), np.int32)
    mask[1, 8:] = 0
    tt = np.zeros((3, 12), np.int32)
    tt[:, 5:] = 1
    tt[1, 8:] = 0  # padding is type 0

    ours = np.asarray(ours_mod.apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(mask),
        jnp.asarray(tt),
    ))
    with torch.no_grad():
        theirs = model(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
            token_type_ids=torch.tensor(tt.astype(np.int64)),
        ).logits[:, 0].numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_cross_encoder_conversion_rejects_multilabel(tmp_path):
    from latentrag_tpu.models.encoder.convert import (
        convert_hf_cross_encoder_to_params,
    )

    cfg = transformers.BertConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, num_labels=3,
    )
    model = transformers.BertForSequenceClassification(cfg)
    model.save_pretrained(str(tmp_path / "multi"))
    with pytest.raises(ValueError, match="1-label"):
        convert_hf_cross_encoder_to_params(str(tmp_path / "multi"))
