"""Offline extractive generation provider."""

import numpy as np

from latentrag_tpu.generation.extractive import (
    extractive_answer,
    split_sentences,
)
from latentrag_tpu.generation.generator import (
    GeneratorSettings,
    LLMSettings,
    RAGGenerator,
)


def test_split_sentences():
    assert split_sentences("A b c. D e! F?") == ["A b c.", "D e!", "F?"]
    assert split_sentences("no terminal punctuation") == [
        "no terminal punctuation"
    ]
    assert split_sentences("") == []


def test_extractive_picks_overlapping_sentence():
    docs = [
        "The market closed early. Mitochondria produce energy inside "
        "cells. Weather was mild.",
        "Telescopes observe distant galaxies. Cells divide rapidly.",
    ]
    ans = extractive_answer(
        "what produces energy inside cells?", docs, max_sentences=1
    )
    assert ans == "Mitochondria produce energy inside cells."


def test_extractive_rare_terms_beat_common_ones():
    docs = [
        "The the the the answer. Quasar jets emit the synchrotron "
        "radiation.",
    ]
    ans = extractive_answer("the quasar radiation", docs, max_sentences=1)
    assert "Quasar" in ans


def test_extractive_handles_empty_inputs():
    assert extractive_answer("q", []) == ""
    assert extractive_answer("", ["Only sentence here."]) == (
        "Only sentence here."
    )
    # no overlap at all -> first sentence, never a crash
    assert extractive_answer("zz", ["Alpha beta. Gamma delta."]) == (
        "Alpha beta."
    )


def test_generator_extractive_provider_offline():
    gen = RAGGenerator(
        GeneratorSettings(llm=LLMSettings(provider="extractive"))
    )
    ans = gen.generate(
        "where do aqueducts come from?",
        ["Ancient rome built aqueducts. Unrelated filler text."],
    )
    assert "aqueducts" in ans
    # deterministic: same inputs -> same answer
    assert ans == gen.generate(
        "where do aqueducts come from?",
        ["Ancient rome built aqueducts. Unrelated filler text."],
    )


def test_generator_batch_async_extractive():
    import asyncio

    gen = RAGGenerator(
        GeneratorSettings(llm=LLMSettings(provider="extractive"))
    )
    out = asyncio.run(gen.generate_batch_async(
        ["galaxies?", "cells?"],
        [["Telescopes observe galaxies."], ["Cells divide rapidly."]],
    ))
    assert out == ["Telescopes observe galaxies.", "Cells divide rapidly."]


def test_serve_generate_with_extractive_provider(tmp_path, capsys):
    """{"generate": true} over serve answers offline when
    generation.provider=extractive — no key, no network, no injection."""
    import io
    import json
    import sys
    from unittest.mock import patch

    import serve

    overrides = [
        "data.dataset=synthetic", "data.max_samples=30",
        "encoder.vocab_size=600", "encoder.dtype=float32",
        "encoder.hidden_dim=32", "encoder.num_layers=1",
        "encoder.num_heads=4", "encoder.mlp_dim=64",
        "retrieval.kernel=xla_exact", "retrieval.index_path=",
        "generation.provider=extractive",
        f"paths.data_dir={tmp_path}/data",
        f"paths.checkpoints_dir={tmp_path}/ckpt",
        f"paths.logs_dir={tmp_path}/logs",
        f"logging.log_file={tmp_path}/logs/run.log",
    ]
    payload = (
        json.dumps({"query": "what do telescopes observe?", "k": 2,
                    "generate": True}) + "\n"
        + json.dumps({"queries": ["mitochondria energy", "markets"],
                      "k": 2, "generate": True}) + "\n"
    )
    with patch.object(sys, "stdin", io.StringIO(payload)):
        assert serve.main(
            ["--ae_type", "none", "--generate", "--set"] + overrides
        ) == 0
    lines = [
        json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
        if line.strip()
    ]
    for line in lines:
        for r in line["results"]:
            assert isinstance(r.get("answer"), str) and r["answer"]
    # batched requests answer per query, order preserved
    assert len(lines[1]["results"]) == 2
