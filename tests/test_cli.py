"""CLI-level end-to-end tests (main.py pipeline + --benchmark, serve.py)."""

import io
import json
import sys
from unittest.mock import patch

import pytest


def _overrides(base):
    return [
        "data.dataset=synthetic", "data.max_samples=30",
        "encoder.vocab_size=600", "encoder.dtype=float32",
        "encoder.hidden_dim=32", "encoder.num_layers=1",
        "encoder.num_heads=4", "encoder.mlp_dim=64",
        "retrieval.kernel=xla_exact",
        f"retrieval.index_path={base}/index",
        f"paths.data_dir={base}/data",
        f"paths.checkpoints_dir={base}/ckpt",
        f"paths.logs_dir={base}/logs",
        f"logging.log_file={base}/logs/run.log",
    ]


def test_main_pipeline_writes_csv(tmp_path):
    import csv

    from main import main

    rc = main(["--ae_type", "none", "--tag", "clitest", "--set"]
              + _overrides(tmp_path))
    assert rc == 0
    rows = list(csv.DictReader(
        open(tmp_path / "logs" / "benchmarks" / "experiments.csv")
    ))
    assert rows[0]["tag"] == "clitest"
    assert rows[0]["ae_type"] == "none"
    assert 0.0 <= float(rows[0]["recall"]) <= 1.0


def test_main_benchmark_flag(tmp_path):
    from main import main

    rc = main(["--ae_type", "none", "--benchmark", "bm25", "--set"]
              + _overrides(tmp_path))
    assert rc == 0


def test_main_rejects_bad_ae_type(tmp_path):
    from main import parse_args

    with pytest.raises(SystemExit):
        parse_args(["--ae_type", "gan"])


def test_serve_jsonl_roundtrip(tmp_path, capsys):
    import serve

    payload = (
        json.dumps({"query": "what do telescopes observe?", "k": 3}) + "\n"
        + json.dumps({"queries": ["markets and prices"], "k": 2}) + "\n"
        + "not json\n"
    )
    with patch.object(sys, "stdin", io.StringIO(payload)):
        rc = serve.main(["--ae_type", "none", "--set"]
                        + _overrides(tmp_path) + ["retrieval.index_path="])
    assert rc == 0
    lines = [
        json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
        if line.startswith("{")
    ]
    assert len(lines) == 3
    assert len(lines[0]["results"][0]["hits"]) == 3
    assert lines[0]["latency_ms"] > 0
    assert len(lines[1]["results"][0]["hits"]) == 2
    assert "error" in lines[2]


def test_main_profile_flag_writes_trace(tmp_path):
    from main import main

    rc = main(["--ae_type", "none", "--tag", "prof",
               "--profile", str(tmp_path / "trace"), "--set"]
              + _overrides(tmp_path))
    assert rc == 0
    import glob

    files = glob.glob(str(tmp_path / "trace" / "**"), recursive=True)
    assert any("trace" in f or f.endswith(".pb") or f.endswith(".json.gz")
               for f in files), files
