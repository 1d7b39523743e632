"""Unit tests for quantization ops, experiment CSV sink, timing/profiling."""

import csv
import os

import numpy as np
import pytest

import jax.numpy as jnp

from latentrag_tpu.ops import exact_topk, l2_normalize
from latentrag_tpu.ops.quantization import sq8_quantize, sq8_topk
from latentrag_tpu.utils import StatsTracker, percentiles
from latentrag_tpu.utils.experiment_log import append_csv_row, build_metrics_row


class TestSQ8:
    def test_quantize_roundtrip_error_bounded(self, rng):
        x = jnp.asarray(rng.standard_normal((50, 16)).astype(np.float32))
        codes, scale = sq8_quantize(x)
        assert codes.dtype == jnp.int8
        recon = np.asarray(codes, np.float32) * float(scale)
        max_abs = float(jnp.max(jnp.abs(x)))
        np.testing.assert_allclose(
            recon, np.asarray(x), atol=max_abs / 127 + 1e-6
        )

    def test_topk_matches_oracle(self, rng):
        c = l2_normalize(
            jnp.asarray(rng.standard_normal((600, 16)).astype(np.float32))
        )
        q = l2_normalize(
            jnp.asarray(rng.standard_normal((7, 16)).astype(np.float32))
        )
        _, i0 = exact_topk(q, c, k=5)
        codes, scale = sq8_quantize(c)
        _, i1 = sq8_topk(q, codes, scale, k=5)
        i0, i1 = np.asarray(i0), np.asarray(i1)
        recall = np.mean([len(set(a) & set(b)) / 5 for a, b in zip(i0, i1)])
        assert recall >= 0.8

    def test_blocked_path_masks_padding(self, rng):
        c = l2_normalize(
            jnp.asarray(rng.standard_normal((130, 8)).astype(np.float32))
        )
        q = c[:3]
        codes, scale = sq8_quantize(c)
        s, i = sq8_topk(q, codes, scale, k=4, block_size=64)
        assert int(np.asarray(i).max()) < 130
        assert (np.asarray(i)[:, 0] == np.arange(3)).all()  # self-retrieval


class TestStatsTracker:
    def test_accumulate_and_reset(self):
        t = StatsTracker()
        t.add_build(0.5)
        t.add_search_batch(0.2, n_queries=4)
        s = t.get()
        assert s["build_time_s"] == 0.5
        assert s["search_calls"] == 1
        assert len(s["per_query_ms"]) == 4
        assert s["p50"] == pytest.approx(50.0)  # 0.2s/4 = 50ms each
        s2 = t.get(reset=True)
        assert t.get()["search_calls"] == 0

    def test_percentiles_empty(self):
        assert percentiles([]) == {}


class TestExperimentLog:
    METRICS = {"Recall@10": {"mean": 0.7, "std": 0.1},
               "MRR@10": {"mean": 0.4, "std": 0.1}}

    def _row(self, tmp, ae, stats=None):
        return build_metrics_row(
            tag="t", dataset="d", embedder="e", ae_type=ae,
            dim_in=384, dim_out=64, retriever="dense", index_type="xla",
            metric_space="cosine", top_k=10, candidate_k=10, n_corpus=100,
            retrieval_metrics=self.METRICS,
            retriever_stats=stats or {"build_time_s": 1.0,
                                      "search_time_s": 0.5,
                                      "p50": 2.0, "p95": 3.0},
            logs_dir=str(tmp),
        )

    def test_row_and_csv(self, tmp_path):
        row = self._row(tmp_path, "vae")
        assert row["compression_ratio"] == pytest.approx(6.0)
        assert row["qps"] == pytest.approx(500.0)
        path = str(tmp_path / "exp.csv")
        append_csv_row(row, path)
        append_csv_row(row, path)
        rows = list(csv.DictReader(open(path)))
        assert len(rows) == 2
        assert rows[0]["recall"] == "0.7"

    def test_baseline_speedup_cycle(self, tmp_path):
        base = self._row(tmp_path, "none",
                         stats={"build_time_s": 1, "search_time_s": 1,
                                "p50": 4.0, "p95": 6.0})
        assert base["speedup_p50"] is None  # baseline writes, not reads
        comp = self._row(tmp_path, "vae")
        assert comp["speedup_p50"] == pytest.approx(2.0)  # 4.0 / 2.0
        assert comp["delta_ms_p50"] == pytest.approx(-2.0)


def test_profiling_timed_blocked():
    from latentrag_tpu.utils.profiling import timed_blocked

    store = {}
    x = jnp.ones((8, 8))
    with timed_blocked(store, "op") as outs:
        outs.append(x @ x)
    assert store["op"] > 0


def test_distributed_noop_single_process():
    from latentrag_tpu.parallel.distributed import (
        global_mesh,
        initialize_distributed,
    )

    assert initialize_distributed() is False  # no coordinator configured
    mesh = global_mesh()
    assert mesh.shape["data"] >= 1


def test_sq8_blocked_negative_scores_not_displaced(rng):
    """Regression: pad rows scored 0 and displaced negative-score candidates
    in the final partial block before the mask-order fix."""
    # vectors chosen so ALL true scores are negative
    base = -np.abs(rng.standard_normal((70, 8)).astype(np.float32)) - 0.5
    c = l2_normalize(jnp.asarray(base))
    q = -c[:3]  # queries anti-aligned: all cosine scores negative-ish
    codes, scale = sq8_quantize(c)
    s, i = sq8_topk(q, codes, scale, k=5, block_size=64)
    assert int(np.asarray(i).max()) < 70
    _, i0 = exact_topk(q, c, k=5)
    i0, i1 = np.asarray(i0), np.asarray(i)
    recall = np.mean([len(set(a) & set(b)) / 5 for a, b in zip(i0, i1)])
    assert recall >= 0.6


def test_append_csv_migrates_old_header(tmp_path):
    # a log created before the generation-metric columns must be migrated,
    # not appended to misaligned (code-review r2 finding)
    import csv as _csv

    from latentrag_tpu.utils.experiment_log import CSV_COLUMNS

    path = str(tmp_path / "experiments.csv")
    old_cols = [c for c in CSV_COLUMNS if not c.startswith(
        ("bleu", "rouge_l", "meteor"))]
    with open(path, "w", newline="") as f:
        w = _csv.DictWriter(f, fieldnames=old_cols)
        w.writeheader()
        w.writerow({"tag": "old-run", "recall": "0.9",
                    "build_time_s": "1.5", "p50_ms": "0.2"})

    append_csv_row({"tag": "new-run", "recall": 0.8, "bleu": 33.3,
                    "build_time_s": 2.5, "p50_ms": 0.1}, path)
    rows = list(_csv.DictReader(open(path)))
    assert [r["tag"] for r in rows] == ["old-run", "new-run"]
    assert rows[0]["recall"] == "0.9" and rows[0]["build_time_s"] == "1.5"
    assert rows[0]["bleu"] == ""  # migrated old row: new columns empty
    assert rows[1]["bleu"] == "33.3"
    assert rows[1]["build_time_s"] == "2.5"  # no shift into wrong columns
