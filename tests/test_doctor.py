"""python -m latentrag_tpu.doctor — deployment readiness checks.

The doctor must mirror the warm-boot validation rules (generation tags,
texts/doc_ids/n cross-checks, sidecar row counts) WITHOUT loading heavy
state, keep stdout pure JSON, and exit 1 exactly when a check fails.
"""

import json
import os

import numpy as np
import pytest

from latentrag_tpu import doctor
from latentrag_tpu.retrieval.dense import DenseRetriever
from latentrag_tpu.retrieval.textstore import save_texts


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _normed(rng, n, d):
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _run(capsys, argv):
    rc = doctor.main(argv)
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1  # stdout purity: exactly one JSON line
    return rc, json.loads(out[0])["doctor"]


def test_doctor_healthy_store(rng, tmp_path, capsys):
    path = str(tmp_path / "idx")
    r = DenseRetriever(backend="xla_exact", store_dtype="float32",
                       index_path=path,
                       fingerprint={"embedding_model": "m", "ae": "none"})
    r.build(_normed(rng, 12, 8), [f"doc {i}" for i in range(12)])
    rc, rep = _run(capsys, ["--index", path,
                            "--checkpoints", str(tmp_path / "ckpt")])
    assert rc == 0 and rep["ok"]
    assert rep["checks"]["store:dense"]["status"] == "pass"
    assert "n=12" in rep["checks"]["store:dense"]["detail"]


def test_doctor_flags_mixed_generation_store(rng, tmp_path, capsys):
    path = str(tmp_path / "idx")
    r = DenseRetriever(backend="xla_exact", store_dtype="float32",
                       index_path=path)
    texts = [f"doc {i}" for i in range(12)]
    r.build(_normed(rng, 12, 8), texts)
    # shrink the text store under the index (crash between saves)
    save_texts(os.path.join(path, "texts"), texts[:5], list(range(5)))
    rc, rep = _run(capsys, ["--index", path,
                            "--checkpoints", str(tmp_path / "ckpt")])
    assert rc == 1 and not rep["ok"]
    assert rep["checks"]["store:dense"]["status"] == "fail"
    assert "mixed-generation" in rep["checks"]["store:dense"]["detail"]


def test_doctor_flags_stale_binary_sidecar(rng, tmp_path, capsys):
    path = str(tmp_path / "idx")
    r = DenseRetriever(backend="xla_exact", store_dtype="float32",
                       index_path=path)
    r.build(_normed(rng, 10, 8), [f"doc {i}" for i in range(10)])
    # plant a wrong-rows packed sidecar (what a pre-hygiene crash could
    # leave behind)
    with open(os.path.join(path, "binary_packed.npy"), "wb") as f:
        np.save(f, np.zeros((7, 1), dtype=np.uint32))
    rc, rep = _run(capsys, ["--index", path,
                            "--checkpoints", str(tmp_path / "ckpt")])
    assert rc == 1
    assert "stale sidecar" in rep["checks"]["store:dense"]["detail"]


def test_doctor_checks_ann_store(rng, tmp_path, capsys):
    from latentrag_tpu.retrieval.ann_retriever import ANNRetriever
    from latentrag_tpu.utils.config import RetrievalConfig

    apath = str(tmp_path / "ann")
    cfg = RetrievalConfig(index_path=apath, backend="hnsw")
    a = ANNRetriever(cfg, "hnsw")
    a.build(_normed(rng, 15, 8), [f"doc {i}" for i in range(15)])
    rc, rep = _run(capsys, ["--index", apath,
                            "--checkpoints", str(tmp_path / "ckpt")])
    assert rc == 0
    assert rep["checks"]["store:hnsw"]["status"] == "pass"
    assert "15 texts" in rep["checks"]["store:hnsw"]["detail"]


def test_doctor_survives_corrupt_sidecar(rng, tmp_path, capsys):
    """A truncated/garbage npy — exactly what doctor exists to diagnose —
    must become a FAIL row, never a crash that robs stdout of its JSON."""
    path = str(tmp_path / "idx")
    r = DenseRetriever(backend="xla_exact", store_dtype="float32",
                       index_path=path)
    r.build(_normed(rng, 8, 8), [f"doc {i}" for i in range(8)])
    with open(os.path.join(path, "corpus.npy"), "wb") as f:
        f.write(b"\x93NUMPY garbage")
    rc, rep = _run(capsys, ["--index", path,
                            "--checkpoints", str(tmp_path / "ckpt")])
    assert rc == 1
    assert rep["checks"]["store:dense"]["status"] == "fail"


def test_doctor_flags_same_n_corpus_swap(rng, tmp_path, capsys):
    """Same-shape corpus.npy from another generation: lengths all match,
    only the stored sampled digest catches it."""
    from latentrag_tpu.retrieval.textstore import atomic_save

    path = str(tmp_path / "idx")
    r = DenseRetriever(backend="xla_exact", store_dtype="float32",
                       index_path=path)
    r.build(_normed(rng, 10, 8), [f"doc {i}" for i in range(10)])
    atomic_save(os.path.join(path, "corpus.npy"),
                _normed(rng, 10, 8).astype(np.float32))
    rc, rep = _run(capsys, ["--index", path,
                            "--checkpoints", str(tmp_path / "ckpt")])
    assert rc == 1
    assert "contradicts" in rep["checks"]["store:dense"]["detail"]


def test_doctor_flags_ann_missing_doc_ids(rng, tmp_path, capsys):
    from latentrag_tpu.retrieval.ann_retriever import ANNRetriever
    from latentrag_tpu.utils.config import RetrievalConfig

    apath = str(tmp_path / "ann")
    a = ANNRetriever(RetrievalConfig(index_path=apath, backend="hnsw"),
                     "hnsw")
    a.build(_normed(rng, 10, 8), [f"doc {i}" for i in range(10)])
    os.remove(apath + ".hnsw.texts_doc_ids.npy")
    rc, rep = _run(capsys, ["--index", apath,
                            "--checkpoints", str(tmp_path / "ckpt")])
    assert rc == 1
    assert rep["checks"]["store:hnsw"]["status"] == "fail"
    assert "doc_ids" in rep["checks"]["store:hnsw"]["detail"]


def test_doctor_baseline_environment(tmp_path, capsys):
    """On this image every environment check passes and absent stores are
    warnings, not failures."""
    rc, rep = _run(capsys, ["--index", str(tmp_path / "none"),
                            "--checkpoints", str(tmp_path / "none")])
    assert rc == 0
    for name in ("imports", "platform", "native", "tokenizer"):
        assert rep["checks"][name]["status"] == "pass", name
    assert rep["checks"]["store"]["status"] == "warn"
