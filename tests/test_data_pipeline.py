"""Data pipeline tests: processing, triples, caches, training arrays, splits
(mirrors ``test/test_data_processing.py`` patterns with a fake encoder)."""

import numpy as np
import pytest

from latentrag_tpu.data import (
    WordPieceTokenizer,
    add_noise,
    build_contrastive_triples,
    build_dae_dataset,
    clean_text,
    ensure_embedding_cache,
    jaccard_similarity,
    load_evaluation_data,
    prepare_training_arrays,
    split_dataset,
    synthetic_examples,
    texts_fingerprint,
)


class FakeEncoder:
    """Deterministic hash-based text encoder standing in for MiniLM."""

    dim = 16

    def __init__(self):
        self.calls = 0

    def encode_text(self, texts):
        self.calls += 1
        out = np.zeros((len(texts), self.dim), np.float32)
        for i, t in enumerate(texts):
            rng = np.random.default_rng(abs(hash(t)) % (2**32))
            v = rng.standard_normal(self.dim)
            out[i] = v / np.linalg.norm(v)
        return out


def test_clean_text():
    assert clean_text("  a \n\t b  ") == "a b"


def test_add_noise_drops_and_swaps(rng):
    text = " ".join(f"w{i}" for i in range(50))
    noisy = add_noise(text, rng, drop_prob=0.3, swap_prob=0.3)
    assert noisy != text
    assert set(noisy.split()) <= set(text.split())


def test_dae_pairs_clean_target(rng):
    pairs = build_dae_dataset(["hello  world  foo", "bar baz"], rng)
    for noisy, clean in pairs:
        assert clean == clean_text(clean)


def test_jaccard():
    assert jaccard_similarity("a b c", "a b c") == 1.0
    assert jaccard_similarity("a b", "c d") == 0.0


def test_contrastive_triples_negatives_dissimilar(rng):
    qs = [f"question{i}" for i in range(20)]
    ps = [f"passage{i} topicword{i} detail{i}" for i in range(20)]
    triples = build_contrastive_triples(qs, ps, rng, max_jaccard=0.5)
    assert len(triples) == 20
    for q, p, n in triples:
        assert n != p
        assert jaccard_similarity(p, n) < 0.5


def test_embedding_cache_hit(tmp_path):
    enc = FakeEncoder()
    texts = ["alpha", "beta"]
    e1 = ensure_embedding_cache(texts, enc.encode_text, str(tmp_path), "m")
    e2 = ensure_embedding_cache(texts, enc.encode_text, str(tmp_path), "m")
    assert enc.calls == 1  # second call served from cache
    np.testing.assert_array_equal(e1, e2)
    # different model name -> different key
    ensure_embedding_cache(texts, enc.encode_text, str(tmp_path), "other")
    assert enc.calls == 2
    assert texts_fingerprint(texts, "m") != texts_fingerprint(texts, "other")


def test_evaluation_data_dedups_contexts():
    examples = synthetic_examples(40)
    # force duplicate contexts
    examples[1]["context"] = examples[0]["context"]
    queries, corpus, relevant = load_evaluation_data(examples)
    assert len(queries) == 40
    assert len(corpus) == len(set(corpus)) == 39
    assert relevant[1] == relevant[0]
    for q, r in zip(queries, relevant):
        assert 0 <= r < len(corpus)


@pytest.mark.parametrize("variant", ["vae", "dae", "cae"])
def test_prepare_training_arrays(tmp_path, variant):
    examples = synthetic_examples(30)
    tok = WordPieceTokenizer.train_from_corpus(
        [e["context"] for e in examples], vocab_size=600, min_freq=1
    )
    enc = FakeEncoder()
    data = prepare_training_arrays(
        examples, enc, tok, variant, str(tmp_path), seed=0
    )
    if variant == "cae":
        assert set(data) == {"q", "p", "n"}
        assert data["q"].shape == data["p"].shape == data["n"].shape
    else:
        assert set(data) == {"x", "y"}
        if variant == "dae":
            assert not np.allclose(data["x"], data["y"])  # noise applied
        else:
            np.testing.assert_array_equal(data["x"], data["y"])
    assert data[next(iter(data))].shape[1] == enc.dim


def test_split_dataset_deterministic():
    data = {"x": np.arange(100)[:, None].astype(np.float32)}
    tr1, va1 = split_dataset(data, val_split=0.2, seed=3)
    tr2, va2 = split_dataset(data, val_split=0.2, seed=3)
    np.testing.assert_array_equal(va1["x"], va2["x"])
    assert len(va1["x"]) == 20 and len(tr1["x"]) == 80
    assert len(np.intersect1d(tr1["x"], va1["x"])) == 0


def test_jsonl_loader(tmp_path):
    import json

    from latentrag_tpu.data.squad import load_jsonl_examples
    from latentrag_tpu.data import get_examples
    from latentrag_tpu.utils import Config, apply_overrides

    p = tmp_path / "c.jsonl"
    rows = [
        {"question": "q1?", "context": "ctx one", "answer_text": "one",
         "answer_start": 4},
        {"question": "q2?", "context": "ctx two"},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n\n")
    exs = load_jsonl_examples(str(p))
    assert len(exs) == 2
    assert exs[0]["answer_start"] == 4
    assert exs[1]["doc_id"] == 1
    cfg = apply_overrides(Config(), [f"data.dataset=jsonl:{p}",
                                     "data.max_samples=1"])
    assert len(get_examples(cfg)) == 1


def test_cloze_examples(tmp_path):
    from latentrag_tpu.data.squad import cloze_examples, load_text_corpus

    texts = [
        " ".join(f"doc{i}word{j}" for j in range(30)) for i in range(5)
    ] + ["too short"]
    exs = cloze_examples(texts, snippet_words=6, seed=0)
    assert len(exs) == 5  # short doc skipped
    for ex in exs:
        assert ex["question"] in ex["context"]
        assert ex["context"] == texts[ex["doc_id"]]
    # loader formats
    p = tmp_path / "c.txt"
    p.write_text("\n".join(texts))
    assert load_text_corpus(str(p)) == texts
    import json as _json

    pj = tmp_path / "c.json"
    pj.write_text(_json.dumps(texts))
    assert load_text_corpus(str(pj)) == texts


def test_prepare_training_arrays_mined_negatives_skip(tmp_path):
    # with in-batch mining the negative third of the embedding work is
    # skipped entirely (ADVICE r1)
    examples = synthetic_examples(30)
    tok = WordPieceTokenizer.train_from_corpus(
        [e["context"] for e in examples], vocab_size=600, min_freq=1
    )
    enc = FakeEncoder()
    data = prepare_training_arrays(
        examples, enc, tok, "cae", str(tmp_path), seed=0,
        mine_hard_negatives=True,
    )
    assert set(data) == {"q", "p"}
    assert data["q"].shape == data["p"].shape


def _msmarco_fixture(path, n=12):
    import json

    with open(path, "w") as f:
        for i in range(n):
            rec = {
                "query": f"what is topic {i}",
                "passages": {
                    "passage_text": [
                        f"passage about topic {i} with the answer",
                        f"unrelated filler passage {i} alpha",
                        f"unrelated filler passage {i} beta",
                    ],
                    "is_selected": [1, 0, 0],
                },
            }
            # one query with no selected passage must be skipped
            if i == 5:
                rec["passages"]["is_selected"] = [0, 0, 0]
            f.write(json.dumps(rec) + "\n")
    return str(path)


def test_msmarco_local_fixture(tmp_path):
    # VERDICT r1 item 9: the scale config's data path, exercised offline
    from latentrag_tpu.data.msmarco import (
        load_msmarco_corpus, load_msmarco_eval,
    )

    src = _msmarco_fixture(tmp_path / "marco.jsonl")
    queries, corpus, relevant = load_msmarco_eval(source=src)
    assert len(queries) == 11  # the unselected-query record is skipped
    assert len(corpus) == 33  # passages of answerable queries, deduped
    for q, r in zip(queries, relevant):
        assert "answer" in corpus[r]
        assert q.split()[-1] == corpus[r].split("topic ")[1].split()[0]

    passages = list(load_msmarco_corpus(max_passages=7, source=src))
    assert len(passages) == 7

    qs2, _, _ = load_msmarco_eval(max_queries=3, source=src)
    assert len(qs2) == 3


def test_msmarco_cli_dispatch(tmp_path):
    from main import main

    src = _msmarco_fixture(tmp_path / "marco.jsonl")
    rc = main([
        "--ae_type", "none", "--tag", "marco", "--set",
        f"data.dataset=msmarco:{src}",
        "encoder.vocab_size=600", "encoder.dtype=float32",
        "encoder.hidden_dim=32", "encoder.num_layers=1",
        "encoder.num_heads=4", "encoder.mlp_dim=64",
        "retrieval.kernel=xla_exact",
        f"retrieval.index_path={tmp_path}/index",
        f"paths.data_dir={tmp_path}/data",
        f"paths.checkpoints_dir={tmp_path}/ckpt",
        f"paths.logs_dir={tmp_path}/logs",
        f"logging.log_file={tmp_path}/logs/run.log",
    ])
    assert rc == 0
    import csv

    rows = list(csv.DictReader(
        open(tmp_path / "logs" / "benchmarks" / "experiments.csv")
    ))
    assert rows[0]["dataset"].startswith("msmarco:")
    assert int(rows[0]["n_corpus"]) == 33


def test_get_examples_msmarco_dispatch(tmp_path):
    # every entry point (train/train_dpr/viz), not just main.py, must route
    # msmarco[:path] correctly (code-review r2 finding)
    from latentrag_tpu.data import get_examples
    from latentrag_tpu.utils import apply_overrides, load_config

    src = _msmarco_fixture(tmp_path / "m.jsonl")
    cfg = apply_overrides(load_config(None), [
        f"data.dataset=msmarco:{src}", "data.max_samples=8",
    ])
    examples = get_examples(cfg)
    assert len(examples) == 8
    for ex in examples:
        assert ex["question"].startswith("what is topic")
        assert "answer" in ex["context"]
