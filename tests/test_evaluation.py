"""Evaluation tests: pinned metric values (the reference's exact-constant
pattern, ``test/test_evaluation.py:9-29``), bootstrap behaviour, paired test.
"""

import numpy as np
import pytest

from latentrag_tpu.evaluation import (
    bootstrap_ci,
    compression_ratio,
    evaluate_generation_bootstrap,
    evaluate_retrieval,
    paired_bootstrap_test,
    parse_metric,
)


class TestRetrievalMetrics:
    def test_perfect_retrieval(self):
        res = evaluate_retrieval(
            [["a", "b"], ["c", "d"]], ["a", "c"], ["Recall@2", "MRR@2", "nDCG@2"]
        )
        for m in res.values():
            assert m["mean"] == pytest.approx(1.0)

    def test_miss_everything(self):
        res = evaluate_retrieval(
            [["x", "y"]], ["a"], ["Recall@2", "MRR@2", "nDCG@2"]
        )
        for m in res.values():
            assert m["mean"] == 0.0

    def test_rank_two_constants(self):
        # relevant at rank 2 of 2: MRR = 1/2, nDCG = 1/log2(3) ≈ 0.6309
        res = evaluate_retrieval(
            [["x", "a"]], ["a"], ["Recall@2", "MRR@2", "nDCG@2"]
        )
        assert res["Recall@2"]["mean"] == pytest.approx(1.0)
        assert res["MRR@2"]["mean"] == pytest.approx(0.5)
        assert res["nDCG@2"]["mean"] == pytest.approx(1.0 / np.log2(3), abs=1e-6)

    def test_k_parsing_and_truncation(self):
        # hit at rank 3 doesn't count for k=2
        res = evaluate_retrieval([["x", "y", "a"]], ["a"], ["Recall@2"])
        assert res["Recall@2"]["mean"] == 0.0
        assert parse_metric(" MRR @ 20 ") == ("mrr", 20)
        with pytest.raises(ValueError):
            parse_metric("Recall")

    def test_multiple_relevant(self):
        res = evaluate_retrieval([["a", "b", "x"]], [["a", "b", "z"]], ["Recall@3"])
        assert res["Recall@3"]["mean"] == pytest.approx(2 / 3)

    def test_single_query_compat_and_std(self):
        res = evaluate_retrieval(["a", "x"], "a", ["Recall@2"])
        assert res["Recall@2"]["mean"] == 1.0
        res2, per_q = evaluate_retrieval(
            [["a"], ["x"]], ["a", "a"], ["Recall@1"], return_per_query=True
        )
        assert res2["Recall@1"]["mean"] == pytest.approx(0.5)
        assert res2["Recall@1"]["std"] == pytest.approx(np.std([1, 0], ddof=1))
        assert per_q["Recall@1"].tolist() == [1.0, 0.0]


class TestBootstrap:
    def test_ci_contains_mean_and_narrows(self):
        rng = np.random.default_rng(0)
        vals = rng.normal(50, 5, size=1000)
        mean, lo, hi = bootstrap_ci(vals, n_resamples=500)
        assert lo < mean < hi
        m2, lo2, hi2 = bootstrap_ci(vals[:50], n_resamples=500)
        assert (hi2 - lo2) > (hi - lo)  # smaller sample, wider CI

    def test_generation_bootstrap_floor(self):
        with pytest.raises(ValueError):
            evaluate_generation_bootstrap(["a"] * 30, ["a"] * 30)
        out = evaluate_generation_bootstrap(
            ["the cat sat"] * 30,
            ["the cat sat"] * 30,
            metrics=["ROUGE-L"],
            min_pairs=10,
            n_resamples=100,
        )
        assert out["ROUGE-L"]["mean"] == pytest.approx(100.0)

    def test_paired_test_detects_difference(self):
        rng = np.random.default_rng(0)
        a = rng.normal(0.8, 0.05, 500)
        b = a - 0.1
        res = paired_bootstrap_test(a, b, n_resamples=2000)
        assert res["mean_diff"] == pytest.approx(0.1, abs=0.01)
        assert res["significant_05"]

    def test_paired_test_null(self):
        rng = np.random.default_rng(0)
        a = rng.normal(0.5, 0.1, 200)
        b = rng.permutation(a)
        res = paired_bootstrap_test(a, b, n_resamples=2000)
        assert not res["significant_05"]


def test_compression_ratio_uses_true_dims():
    # regression guard for the reference defect (dim_in fell back to latent)
    assert compression_ratio(384, 64) == pytest.approx(6.0)
    with pytest.raises(ValueError):
        compression_ratio(384, 0)


class TestMeteor:
    def test_perfect_match(self):
        from latentrag_tpu.evaluation import meteor_score

        # identical: P=R=1, fmean=1, one chunk, penalty=0.5*(1/m)^3
        s = meteor_score("the cat sat on the mat", "the cat sat on the mat")
        assert s > 99.0

    def test_no_overlap_zero(self):
        from latentrag_tpu.evaluation import meteor_score

        assert meteor_score("alpha beta", "gamma delta") == 0.0

    def test_fragmentation_penalized(self):
        from latentrag_tpu.evaluation import meteor_score

        ref = "a b c d e f"
        contiguous = meteor_score("a b c", ref)
        fragmented = meteor_score("a c e", ref)
        assert contiguous > fragmented

    def test_in_bootstrap_harness(self):
        from latentrag_tpu.evaluation import evaluate_generation_bootstrap

        out = evaluate_generation_bootstrap(
            ["the cat sat"] * 20, ["the cat sat"] * 20,
            metrics=["METEOR"], min_pairs=10, n_resamples=50,
        )
        # 3-word identical pair: penalty 0.5*(1/3)^3 leaves ~98.1
        assert out["METEOR"]["mean"] > 98.0
