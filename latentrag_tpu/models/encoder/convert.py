"""HF → Flax weight conversion for the MiniLM sentence encoder.

Ports sentence-transformers/all-MiniLM-L6-v2 (a standard HF BERT checkpoint)
into the ``MiniLMEncoder`` parameter tree. Runs only where the checkpoint is
reachable (hub or local path) — the framework itself never requires it
(SURVEY §7 step 3's "weights converted from HF" with an offline fallback).

Fidelity notes (cf. the reference's alignment test,
``test/test_alignment_squad_embeddings.py:51-72``): the mapping preserves
per-tensor values exactly; parity to ~1e-5 then depends only on tokenizer
equality (use ``WordPieceTokenizer.from_vocab_file`` on the checkpoint's
vocab.txt) and fp32 activation mode (set ``encoder.dtype="float32"``).
"""

from __future__ import annotations

import os


def convert_hf_bert_to_params(model_name_or_path: str):
    """Returns (params_pytree, vocab_file_path).

    Requires ``transformers`` + ``torch`` and a resolvable checkpoint.
    """
    from transformers import AutoModel

    model = AutoModel.from_pretrained(model_name_or_path)
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}

    vocab_file = None
    cand = os.path.join(str(model_name_or_path), "vocab.txt")
    if os.path.exists(cand):
        vocab_file = cand
    else:
        try:  # checkpoints without a local vocab.txt: ask the tokenizer
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(model_name_or_path)
            cand = getattr(tok, "vocab_file", None)
            if cand and os.path.exists(cand):
                vocab_file = cand
        except Exception:
            pass

    def dense(prefix):
        return {
            "kernel": sd[f"{prefix}.weight"].T.copy(),
            "bias": sd[f"{prefix}.bias"].copy(),
        }

    def ln(prefix):
        return {
            "scale": sd[f"{prefix}.weight"].copy(),
            "bias": sd[f"{prefix}.bias"].copy(),
        }

    params = {
        "word_embeddings": {
            "embedding": sd["embeddings.word_embeddings.weight"].copy()
        },
        "position_embeddings": {
            "embedding": sd["embeddings.position_embeddings.weight"].copy()
        },
        # single-segment: token_type row 0
        "token_type_embedding": sd[
            "embeddings.token_type_embeddings.weight"
        ][0].copy(),
        "embed_ln": ln("embeddings.LayerNorm"),
    }
    n_layers = len(
        {k.split(".")[2] for k in sd if k.startswith("encoder.layer.")}
    )
    for i in range(n_layers):
        p = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "q": dense(f"{p}.attention.self.query"),
            "k": dense(f"{p}.attention.self.key"),
            "v": dense(f"{p}.attention.self.value"),
            "attn_out": dense(f"{p}.attention.output.dense"),
            "attn_ln": ln(f"{p}.attention.output.LayerNorm"),
            "mlp_in": dense(f"{p}.intermediate.dense"),
            "mlp_out": dense(f"{p}.output.dense"),
            "mlp_ln": ln(f"{p}.output.LayerNorm"),
        }
    return params, vocab_file


def convert_hf_cross_encoder_to_params(model_name_or_path: str):
    """HF ``BertForSequenceClassification`` (1 label — the
    sentence-transformers ms-marco cross-encoder family) -> the
    ``CrossEncoderModel`` parameter tree. Returns (params, vocab_file).

    The trunk mapping is shared with ``convert_hf_bert_to_params``; this
    adds the 2-row token-type table (pair inputs), the tanh pooler, and
    the scalar classifier head.
    """
    from transformers import AutoModelForSequenceClassification

    model = AutoModelForSequenceClassification.from_pretrained(
        model_name_or_path
    )
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    # HF prefixes the trunk with "bert."
    sd = {k[5:] if k.startswith("bert.") else k: v for k, v in sd.items()}

    vocab_file = None
    cand = os.path.join(str(model_name_or_path), "vocab.txt")
    if os.path.exists(cand):
        vocab_file = cand

    def dense(prefix):
        return {
            "kernel": sd[f"{prefix}.weight"].T.copy(),
            "bias": sd[f"{prefix}.bias"].copy(),
        }

    def ln(prefix):
        return {
            "scale": sd[f"{prefix}.weight"].copy(),
            "bias": sd[f"{prefix}.bias"].copy(),
        }

    params = {
        "word_embeddings": {
            "embedding": sd["embeddings.word_embeddings.weight"].copy()
        },
        "position_embeddings": {
            "embedding": sd["embeddings.position_embeddings.weight"].copy()
        },
        "token_type_embeddings": {
            "embedding": sd["embeddings.token_type_embeddings.weight"].copy()
        },
        "embed_ln": ln("embeddings.LayerNorm"),
        "pooler": dense("pooler.dense"),
        "classifier": dense("classifier"),
    }
    if params["classifier"]["bias"].shape != (1,):
        raise ValueError(
            "expected a 1-label cross-encoder head, got "
            f"{params['classifier']['bias'].shape[0]} labels"
        )
    n_layers = len(
        {k.split(".")[2] for k in sd if k.startswith("encoder.layer.")}
    )
    for i in range(n_layers):
        p = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "q": dense(f"{p}.attention.self.query"),
            "k": dense(f"{p}.attention.self.key"),
            "v": dense(f"{p}.attention.self.value"),
            "attn_out": dense(f"{p}.attention.output.dense"),
            "attn_ln": ln(f"{p}.attention.output.LayerNorm"),
            "mlp_in": dense(f"{p}.intermediate.dense"),
            "mlp_out": dense(f"{p}.output.dense"),
            "mlp_ln": ln(f"{p}.output.LayerNorm"),
        }
    return params, vocab_file


def save_params(params, path: str) -> None:
    """Serialize a params pytree to msgpack (flax.serialization)."""
    from flax import serialization

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_params(path: str, template):
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())
