"""Chunker property tests — the reference's invariants
(``test/test_chunk_utils.py:60-232``): token budgets, stride arithmetic,
answer containment + integrity fallback, punctuation snapping, char-span
validity."""

import pytest

from latentrag_tpu.data import (
    WordPieceTokenizer,
    build_inference_corpus,
    chunk_context_with_alignment,
    load_chunk_index,
    save_chunk_index,
    semantic_window_chunker,
    sliding_window_chunker,
)

TEXT = (
    "The solar observatory recorded unusual activity. Scientists measured "
    "the flare intensity every hour. The readings exceeded all previous "
    "records by a wide margin. A new instrument was installed last year. "
    "It provides much finer spectral resolution than before. Data archives "
    "grew rapidly during the campaign. Teams around the world shared their "
    "observations daily. The final report summarized twelve months of work."
)


@pytest.fixture(scope="module")
def tok():
    return WordPieceTokenizer.train_from_corpus([TEXT] * 2, vocab_size=400,
                                                min_freq=1)


class TestSliding:
    def test_token_budget_and_stride(self, tok):
        recs = sliding_window_chunker(TEXT, tok, max_tokens=20, stride=10)
        assert len(recs) > 1
        for r in recs:
            assert r.tok_end - r.tok_start <= 20
        starts = [r.tok_start for r in recs]
        assert all(b - a == 10 for a, b in zip(starts, starts[1:]))

    def test_char_spans_valid_and_aligned(self, tok):
        recs = sliding_window_chunker(TEXT, tok, max_tokens=16, stride=8)
        for r in recs:
            assert 0 <= r.char_start < r.char_end <= len(TEXT)
            assert TEXT[r.char_start:r.char_end] == r.text

    def test_full_coverage(self, tok):
        recs = sliding_window_chunker(TEXT, tok, max_tokens=16, stride=8)
        assert recs[0].tok_start == 0
        n_tokens = max(r.tok_end for r in recs)
        assert recs[-1].tok_end == n_tokens

    def test_empty_text(self, tok):
        assert sliding_window_chunker("", tok) == []


class TestSemantic:
    def test_token_window_bounds(self, tok):
        recs = semantic_window_chunker(TEXT, tok, max_tokens=30, min_tokens=10)
        for r in recs[:-1]:
            n = r.tok_end - r.tok_start
            assert 10 <= n <= 30

    def test_snaps_to_punctuation(self, tok):
        recs = semantic_window_chunker(TEXT, tok, max_tokens=30, min_tokens=5)
        # every non-final chunk should end with sentence punctuation when
        # one was available in range
        snapped = sum(r.text.rstrip().endswith((".", "!", "?", ";", ":"))
                      for r in recs[:-1])
        assert snapped >= len(recs[:-1]) - 1  # allow at most one hard cut

    def test_contiguous_no_gaps(self, tok):
        recs = semantic_window_chunker(TEXT, tok, max_tokens=25, min_tokens=8)
        for a, b in zip(recs, recs[1:]):
            assert b.tok_start == a.tok_end

    def test_invalid_bounds_raise(self, tok):
        with pytest.raises(ValueError):
            semantic_window_chunker(TEXT, tok, max_tokens=10, min_tokens=20)


class TestAnswerAware:
    ANSWER = "finer spectral resolution"

    def test_answer_contained_in_some_chunk(self, tok):
        start = TEXT.index(self.ANSWER)
        recs = chunk_context_with_alignment(
            TEXT, self.ANSWER, start, tok, max_tokens=24, stride=12
        )
        assert any(r.contains_answer for r in recs)
        containing = [r for r in recs if r.contains_answer]
        assert any(self.ANSWER in r.text for r in containing)

    def test_short_context_single_chunk(self, tok):
        short = "Tiny context with answer."
        recs = chunk_context_with_alignment(
            short, "answer", short.index("answer"), tok, max_tokens=128
        )
        assert len(recs) == 1 and recs[0].text == short

    def test_alignment_failure_full_context(self, tok):
        recs = chunk_context_with_alignment(
            TEXT, "not-in-text", 10_000, tok, max_tokens=24, stride=12
        )
        assert recs[0].text == TEXT  # full-context fallback

    def test_windows_deduplicated(self, tok):
        start = TEXT.index(self.ANSWER)
        recs = chunk_context_with_alignment(
            TEXT, self.ANSWER, start, tok, max_tokens=24, stride=12
        )
        spans = [(r.tok_start, r.tok_end) for r in recs]
        assert len(spans) == len(set(spans))


def test_inference_corpus_carries_doc_ids(tok):
    recs = build_inference_corpus(
        [TEXT, TEXT[:100]], ["docA", "docB"], tok, mode="sliding",
        max_tokens=16, stride=8,
    )
    assert {r.doc_id for r in recs} == {"docA", "docB"}
    with pytest.raises(ValueError):
        build_inference_corpus([TEXT], None, tok, mode="nope")


def test_chunk_index_parquet_roundtrip(tok, tmp_path):
    recs = sliding_window_chunker(TEXT, tok, max_tokens=16, stride=8)
    path = str(tmp_path / "chunks.parquet")
    save_chunk_index(recs, path)
    loaded = load_chunk_index(path)
    assert loaded == recs


def test_chunker_fuzz_mixed_unicode():
    """Random mixed-unicode docs through both inference chunkers: every
    chunk's char span must slice the ORIGINAL text exactly, stay in
    bounds, and respect the token budget — exercises the interaction with
    accent-stripping offset tracking in the tokenizer."""
    import random

    from latentrag_tpu.data.chunking import (
        semantic_window_chunker, sliding_window_chunker,
    )

    alphabet = (
        "abcdefgh ij klmno 012 .,!? éüñà 漢字 \t\n ​ ́ —"
    )
    rng = random.Random(11)
    corpus = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(5, 300)))
        for _ in range(30)
    ]
    tok = WordPieceTokenizer.train_from_corpus(corpus, vocab_size=500,
                                               min_freq=1)
    for text in corpus:
        for recs in (
            sliding_window_chunker(text, tok, max_tokens=16, stride=8),
            semantic_window_chunker(text, tok, max_tokens=16,
                                    min_tokens=4),
        ):
            for r in recs:
                assert 0 <= r.char_start <= r.char_end <= len(text)
                assert r.text == text[r.char_start:r.char_end]
                assert r.tok_end - r.tok_start <= 16
