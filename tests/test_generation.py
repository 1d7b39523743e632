"""Generator tests with an injected fake client (no network / SDK)."""

import asyncio

import pytest

from latentrag_tpu.generation import (
    DEFAULT_SYSTEM_PROMPT,
    GeneratorSettings,
    LLMSettings,
    RAGGenerator,
    load_system_prompt,
)


def make_gen(**kw):
    calls = []

    def fake_client(messages, llm):
        calls.append((messages, llm))
        return f"answer#{len(calls)}"

    gen = RAGGenerator(GeneratorSettings(**kw), client_fn=fake_client)
    return gen, calls


def test_prompt_assembly_doc_numbering():
    gen, calls = make_gen()
    out = gen.generate("why?", ["first doc", "second doc"])
    assert out == "answer#1"
    messages = calls[0][0]
    assert messages[0]["role"] == "system"
    user = messages[1]["content"]
    assert "Doc 1: first doc" in user
    assert "Doc 2: second doc" in user
    assert user.rstrip().endswith("Answer:")
    assert "Question: why?" in user


def test_context_truncation_by_char_budget():
    gen, calls = make_gen(max_context_tokens=10, chars_per_token=4)  # 40 chars
    gen.generate("q", ["x" * 100, "y" * 100])
    user = calls[0][0][1]["content"]
    assert "y" not in user  # second doc dropped entirely
    assert user.count("x") == 40


def test_system_prompt_file(tmp_path):
    p = tmp_path / "sp.txt"
    p.write_text("CUSTOM PROMPT")
    assert load_system_prompt(str(p)) == "CUSTOM PROMPT"
    assert load_system_prompt(None) == DEFAULT_SYSTEM_PROMPT
    assert load_system_prompt(str(tmp_path / "missing.txt")) == (
        DEFAULT_SYSTEM_PROMPT
    )


def test_async_batch():
    gen, calls = make_gen()
    answers = asyncio.run(
        gen.generate_batch_async(["q1", "q2", "q3"], [["d"]] * 3)
    )
    assert len(answers) == 3 and len(calls) == 3


def test_missing_sdk_raises_clearly(monkeypatch):
    gen = RAGGenerator()
    with pytest.raises(RuntimeError):
        gen.generate("q", ["d"])  # no openai sdk in this environment


def test_llm_settings_passed_through():
    gen, calls = make_gen(llm=LLMSettings(model="test-model", temperature=0.9))
    gen.generate("q", ["d"])
    assert calls[0][1].model == "test-model"
    assert calls[0][1].temperature == 0.9


def test_generate_retries_transient_failures(monkeypatch):
    from latentrag_tpu.generation import RAGGenerator
    from latentrag_tpu.generation.generator import GeneratorSettings

    calls = {"n": 0}

    def flaky(messages, llm):
        calls["n"] += 1
        if calls["n"] < 3:
            raise TimeoutError("transient")
        return "recovered"

    import latentrag_tpu.generation.generator as G

    monkeypatch.setattr(G.time, "sleep", lambda s: None)  # fast test
    gen = RAGGenerator(GeneratorSettings(max_retries=3), client_fn=flaky)
    assert gen.generate("q", ["doc"]) == "recovered"
    assert calls["n"] == 3

    calls["n"] = 0
    gen2 = RAGGenerator(GeneratorSettings(max_retries=1), client_fn=flaky)
    import pytest as _pytest

    with _pytest.raises(TimeoutError):
        gen2.generate("q", ["doc"])
    assert calls["n"] == 2  # initial try + 1 retry


def test_generate_does_not_retry_permanent_failures(monkeypatch):
    from latentrag_tpu.generation import RAGGenerator
    from latentrag_tpu.generation.generator import GeneratorSettings

    calls = {"n": 0}

    class AuthenticationError(Exception):
        pass

    def dead(messages, llm):
        calls["n"] += 1
        raise AuthenticationError("bad key")

    import latentrag_tpu.generation.generator as G

    monkeypatch.setattr(G.time, "sleep", lambda s: None)
    gen = RAGGenerator(GeneratorSettings(max_retries=3), client_fn=dead)
    import pytest as _pytest

    with _pytest.raises(AuthenticationError):
        gen.generate("q", ["doc"])
    assert calls["n"] == 1  # no retries against a dead credential
