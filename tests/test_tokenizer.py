"""WordPiece tokenizer tests: offsets index original text, greedy matching,
specials, vocab training, batch padding."""

import numpy as np
import pytest

from latentrag_tpu.data import WordPieceTokenizer
from latentrag_tpu.data.tokenizer import (
    CLS, SEP, SPECIAL_TOKENS, UNK, _normalize_char,
)


@pytest.fixture(scope="module")
def tok():
    corpus = [
        "the quick brown fox jumps over the lazy dog.",
        "quick thinking solves hard problems, clearly!",
        "the dog barks at the quick fox.",
        "solving problems requires thinking clearly.",
    ] * 3
    return WordPieceTokenizer.train_from_corpus(corpus, vocab_size=500, min_freq=1)


def test_offsets_recover_original_text(tok):
    text = "The quick fox, obviously!"
    enc = tok.encode(text, add_special_tokens=False)
    for t, (s, e) in zip(enc.tokens, enc.offsets):
        if t == UNK:
            continue
        piece = t[2:] if t.startswith("##") else t
        assert text[s:e].lower() == piece


def test_special_token_framing(tok):
    enc = tok.encode("quick dog")
    assert enc.tokens[0] == CLS and enc.tokens[-1] == SEP
    assert enc.ids[0] == tok.cls_id and enc.ids[-1] == tok.sep_id


def test_unknown_words_fall_to_char_pieces_or_unk(tok):
    enc = tok.encode("zyzzyva", add_special_tokens=False)
    assert len(enc.ids) >= 1  # char fallback keeps it encodable
    text_back = "".join(
        t[2:] if t.startswith("##") else t for t in enc.tokens if t != UNK
    )
    assert text_back in ("zyzzyva", "")


def test_max_length_truncates(tok):
    text = " ".join(["quick"] * 100)
    enc = tok.encode(text, max_length=10)
    assert len(enc.ids) <= 10


def test_batch_padding_and_mask(tok):
    ids, mask = tok.encode_batch(["quick dog", "the quick brown fox jumps"])
    assert ids.shape == mask.shape
    assert mask[0].sum() < mask[1].sum()
    assert (ids[0][mask[0] == 0] == tok.pad_id).all()


def test_punctuation_is_own_token(tok):
    enc = tok.encode("dog, fox.", add_special_tokens=False)
    assert "," in enc.tokens and "." in enc.tokens


def test_save_load_roundtrip(tok, tmp_path):
    p = str(tmp_path / "tok.json")
    tok.save(p)
    tok2 = WordPieceTokenizer.load(p)
    a = tok.encode("the quick brown fox").ids
    b = tok2.encode("the quick brown fox").ids
    assert a == b


def test_unicode_and_edge_inputs(tok):
    for text in ["café “smart” — naïve", "日本語テスト", "a" * 500, "!!!", " "]:
        enc = tok.encode(text, add_special_tokens=False, max_length=64)
        # offsets must always be valid spans into the original text
        for s, e in enc.offsets:
            assert 0 <= s <= e <= len(text)
        assert len(enc.ids) == len(enc.offsets) == len(enc.tokens)


def test_empty_text(tok):
    enc = tok.encode("")
    assert enc.tokens[0] == "[CLS]" and enc.tokens[-1] == "[SEP]"


# --------------------------------------------------------------- HF parity


class TestHFDifferential:
    """Id AND offset parity with the Rust fast tokenizer the reference uses
    (``utils/chunk_utils.py:114-121``) over a locally built vocab — the gate
    to MiniLM fidelity (SURVEY §7 hard part 3, VERDICT r1 item 7)."""

    VOCAB = (
        list(SPECIAL_TOKENS)
        + [chr(c) for c in range(ord("a"), ord("z") + 1)]
        + ["##" + chr(c) for c in range(ord("a"), ord("z") + 1)]
        + [str(d) for d in range(10)]
        + ["##" + str(d) for d in range(10)]
        + ["token", "##ization", "token", "the", "quick", "brown", "fox",
           "cafe", "zurich", "naive", "don", "'", "t", "##s", "co",
           "##operation", "漢", "字", "##ación", "intern", "##ment",
           "resume", "##d", ".", ",", "!", "?", "-", "(", ")", '"']
    )

    CASES = [
        "The quick brown fox.",
        "tokenization, internment!",
        "Café Zürich — naïve résumé",          # accents + em dash
        "don't",
        "co­operation",                    # soft hyphen (Cf control)
        "num 12345 and x9",
        "漢字 tokenization",                    # CJK isolation
        "  spaced\tout\n lines ",
        "(parenthetical) \"quotes\"",
        "operación",                            # accent inside ## piece
        "x" * 120 + " ok",                      # > max_word_chars long word
        "​zero​width",                # zero-width (Cf)
        "á standalone mark ́x",      # combining acute
    ]

    @pytest.fixture(scope="class")
    def pair(self, tmp_path_factory):
        transformers = pytest.importorskip("transformers")
        vocab = {}
        for tok in self.VOCAB:
            if tok not in vocab:
                vocab[tok] = len(vocab)
        path = tmp_path_factory.mktemp("hfvocab") / "vocab.txt"
        path.write_text(
            "\n".join(sorted(vocab, key=vocab.get)) + "\n", encoding="utf-8"
        )
        hf = transformers.BertTokenizerFast(
            vocab_file=str(path), do_lower_case=True
        )
        own = WordPieceTokenizer(vocab)
        return own, hf

    @pytest.mark.parametrize("i", range(13))
    def test_ids_and_offsets_match(self, pair, i):
        own, hf = pair
        text = self.CASES[i]
        enc = own.encode(text)
        h = hf(text, return_offsets_mapping=True)
        assert enc.ids == h["input_ids"], (enc.tokens, hf.tokenize(text))
        # body offsets (HF reports (0,0) for both specials; we mark SEP at
        # text end — compare the non-special positions)
        assert enc.offsets[1:-1] == [
            tuple(o) for o in h["offset_mapping"][1:-1]
        ]

    def test_offsets_slice_back_to_source_text(self, pair):
        own, _ = pair
        text = "Café Zürich — naïve résumé"
        enc = own.encode(text)
        for tok, (s, e) in zip(enc.tokens[1:-1], enc.offsets[1:-1]):
            assert 0 <= s <= e <= len(text)
            if not tok.startswith("##") and tok not in ("[UNK]",):
                # normalized token must equal the normalized source slice
                norm = "".join(
                    _normalize_char(c, True) for c in text[s:e]
                )
                assert norm == tok


def test_hf_differential_fuzz(tmp_path):
    """200 random strings over a mixed alphabet (ascii, accents, CJK,
    punctuation, controls, zero-width) — ids AND offsets must match
    BertTokenizerFast on every one."""
    transformers = pytest.importorskip("transformers")
    import random

    vocab = {}
    for tok in TestHFDifferential.VOCAB:
        if tok not in vocab:
            vocab[tok] = len(vocab)
    path = tmp_path / "vocab.txt"
    path.write_text(
        "\n".join(sorted(vocab, key=vocab.get)) + "\n", encoding="utf-8"
    )
    hf = transformers.BertTokenizerFast(
        vocab_file=str(path), do_lower_case=True
    )
    own = WordPieceTokenizer(vocab)

    alphabet = (
        "abcdefghij XYZ 0123456789 .,!?-()\"'"
        "éüñàç ÉÜ 漢字語 \t\n ​­ ́ …—·"
    )
    rng = random.Random(7)
    for trial in range(200):
        text = "".join(
            rng.choice(alphabet) for _ in range(rng.randint(0, 40))
        )
        enc = own.encode(text)
        h = hf(text, return_offsets_mapping=True)
        assert enc.ids == h["input_ids"], (repr(text), enc.tokens,
                                           hf.tokenize(text))
        assert enc.offsets[1:-1] == [
            tuple(o) for o in h["offset_mapping"][1:-1]
        ], repr(text)


class TestNativeFastPath:
    """C++ ASCII WordPiece (native/latentrag_native.cpp wp_*): exact
    parity with the Python path on ASCII; non-ASCII rows fall back."""

    CASES = [
        "", "   ", "plain ascii words here",
        "hello,world!!and--more...punct", "MiXeD CaSe TEXT",
        "tab\tsep\nnewline\rcr", "x" * 99, "y" * 101,  # max_word_chars edge
        "word " * 500,  # truncation
        "digits 1234 and 5,678.90 mixed in",
        "[CLS] literal specials [SEP]",  # punct-split, never special
        "Café naïve résumé",  # non-ASCII -> Python fallback row
        "mixed ascii then café",
        "\x00null\x01ctrl chars\x7f",
    ]

    def test_differential_vs_python(self, tok):
        if tok._native_handle() is None:
            pytest.skip("native library unavailable")
        for ml in (8, 32, 64, 256):
            i1, m1 = tok.encode_batch(self.CASES, max_length=ml)
            i2, m2 = tok._encode_batch_py(self.CASES, ml)
            np.testing.assert_array_equal(i1, i2)
            np.testing.assert_array_equal(m1, m2)

    def test_differential_fuzz(self, tok):
        if tok._native_handle() is None:
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(7)
        alphabet = list("abcdefgh qu.ick!bro,wn ZQX 01")
        texts = [
            "".join(rng.choice(alphabet, size=rng.integers(0, 120)))
            for _ in range(300)
        ]
        i1, m1 = tok.encode_batch(texts, max_length=48)
        i2, m2 = tok._encode_batch_py(texts, 48)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_array_equal(m1, m2)

    def test_vocab_file_parity(self, tmp_path):
        # from_vocab_file path (BERT vocab.txt layout) drives C++ too
        chars = "abcdefghijklmnopqrstuvwxyz"
        vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
        vocab += list(chars) + [f"##{c}" for c in chars] + ["hello", "##llo"]
        p = tmp_path / "vocab.txt"
        p.write_text("\n".join(vocab) + "\n")
        t = WordPieceTokenizer.from_vocab_file(str(p))
        if t._native_handle() is None:
            pytest.skip("native library unavailable")
        texts = ["hello fellow", "abc xyz hello"]
        i1, m1 = t.encode_batch(texts, max_length=16)
        i2, m2 = t._encode_batch_py(texts, 16)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_array_equal(m1, m2)

    def test_offsets_differential_vs_python(self, tok):
        """encode() (the chunkers' offset-mapped contract) through the C++
        path: ids, tokens AND offsets equal the Python reference."""
        h = tok._native_handle()
        if h is None:
            pytest.skip("native library unavailable")
        cases = [
            "", "   ", "a,b!c mixed", "x" * 99, "y" * 101, "word " * 300,
            "tab\tsep\nnl", "CTRL\x01chars\x7fhere", "ab\x01cd",
            "The quick brown fox; jumps, over!? the lazy dog.",
        ]
        for text in cases:
            for sp in (True, False):
                for ml in (None, 8, 48):
                    tok._wp_handle = False  # force the Python reference
                    ref = tok.encode(text, add_special_tokens=sp,
                                     max_length=ml)
                    tok._wp_handle = h
                    got = tok.encode(text, add_special_tokens=sp,
                                     max_length=ml)
                    assert got.ids == ref.ids
                    assert got.tokens == ref.tokens
                    assert got.offsets == ref.offsets
