"""WordPiece tokenizer tests: training, round-trip, batch shapes, vocab IO."""

import numpy as np
import pytest

from instacart_next_order_recommendation_tpu.tokenizer import (
    WordPieceTokenizer,
    bucket_length,
)
from instacart_next_order_recommendation_tpu.tokenizer.wordpiece import basic_tokenize

CORPUS = [
    "Product: Organic Milk. Aisle: milk. Department: dairy eggs.",
    "Product: Whole Wheat Bread. Aisle: bread. Department: bakery.",
    "[+7d w4h14] Organic Milk, Whole Wheat Bread. Next: +3d w1h9",
    "Product: Banana. Aisle: fresh fruits. Department: produce.",
]


@pytest.fixture(scope="module")
def tok() -> WordPieceTokenizer:
    return WordPieceTokenizer.train(CORPUS, vocab_size=500, min_frequency=1)


def test_basic_tokenize_splits_punct_and_lowercases():
    assert basic_tokenize("Organic Milk, Bread.") == ["organic", "milk", ",", "bread", "."]


def test_encode_has_cls_sep(tok):
    ids = tok.encode("organic milk")
    assert ids[0] == tok.cls_id
    assert ids[-1] == tok.sep_id
    assert len(ids) > 2


def test_known_words_roundtrip(tok):
    text = "organic milk whole wheat bread"
    assert tok.decode(tok.encode(text)) == text


def test_unseen_word_segments_without_unk(tok):
    # chars are always in the trained vocab, so any ASCII word segments
    ids = tok.encode("zzqx")
    assert tok.unk_id not in ids


def test_encode_batch_shapes_and_mask(tok):
    texts = ["organic milk", "whole wheat bread and banana and fruits"]
    input_ids, mask = tok.encode_batch(texts, max_seq_length=64)
    assert input_ids.shape == mask.shape
    assert input_ids.shape[1] in (16, 32, 64)
    assert input_ids.dtype == np.int32
    # mask covers exactly the non-pad tokens
    for row_ids, row_mask in zip(input_ids, mask):
        n = int(row_mask.sum())
        assert (row_ids[:n] != tok.pad_id).all()
        assert (row_ids[n:] == tok.pad_id).all()


def test_encode_batch_pad_batch_rows(tok):
    input_ids, mask = tok.encode_batch(["milk"], pad_batch_to=8, pad_to=16)
    assert input_ids.shape == (8, 16)
    assert mask[1:].sum() == 0


def test_truncation(tok):
    long_text = " ".join(["milk"] * 500)
    ids = tok.encode(long_text, max_seq_length=32)
    assert len(ids) == 32
    assert ids[-1] == tok.sep_id


def test_bucket_length():
    assert bucket_length(10) == 16
    assert bucket_length(17) == 32
    assert bucket_length(300, max_seq_length=256) == 256


def test_vocab_save_load_roundtrip(tok, tmp_path):
    tok.save(tmp_path)
    tok2 = WordPieceTokenizer.load(tmp_path)
    assert tok2.vocab == tok.vocab
    text = "organic milk bread"
    assert tok2.encode(text) == tok.encode(text)


def test_special_token_ids_bert_convention(tok):
    assert tok.pad_id == 0
    assert tok.vocab["[UNK]"] == 1
    assert tok.vocab["[CLS]"] == 2
    assert tok.vocab["[SEP]"] == 3


def test_pad_batch_to_smaller_than_batch_raises():
    """pad_batch_to < len(texts) must fail loudly on BOTH paths — the C++
    fast path would otherwise write past its output buffers."""
    import pytest

    from instacart_next_order_recommendation_tpu.tokenizer import WordPieceTokenizer

    tok = WordPieceTokenizer.train(["organic milk bread"], vocab_size=100, min_frequency=1)
    with pytest.raises(ValueError, match="pad_batch_to"):
        tok.encode_batch(["a", "b", "c"], pad_batch_to=2)
