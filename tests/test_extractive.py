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
