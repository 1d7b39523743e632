"""WordPiece tokenizer tests: offsets index original text, greedy matching,
specials, vocab training, batch padding."""

import numpy as np
import pytest

from latentrag_tpu.data import WordPieceTokenizer
from latentrag_tpu.data.tokenizer import CLS, SEP, UNK


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
