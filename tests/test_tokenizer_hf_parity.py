"""Tokenizer parity against the HF slow BertTokenizer as oracle.

The reference tokenizes via HF tokenizers inside sentence-transformers
(SURVEY.md §2.2); warm-start parity with all-MiniLM-L6-v2 requires our
WordPiece to match BERT tokenization exactly. ``BertTokenizer`` works
offline from a vocab file, so it serves as the oracle here.
"""

import os
import random
import tempfile

import pytest

from instacart_next_order_recommendation_tpu.tokenizer import WordPieceTokenizer

transformers = pytest.importorskip("transformers")

CORPUS = [
    "Product: Organic Milk. Aisle: milk. Department: dairy eggs.",
    "café naïve Zürich crème brûlée",
    "中文分词测试 with english words",
    "ß ŉ İstanbul ΣΙΓΜΑ ΤΕΛΟΣ",
    "русский Текст numbers 123",
]

BATTERY = CORPUS + [
    "MiXeD CaSe 42x",
    "  spaces\tand\nnewlines ",
    "ctrl\x07char here",
    "piñata jalapeño façade",
    "日本語のテキスト",
    "한국어 텍스트",
    "…ellipsis—dash·dot",
    "ANGSTROM Å sign Ω",
    "ΣΙΓΜΑΣ τέλος",  # per-char lowercase: no final-sigma context
    "punct!!!$$$[brackets]{braces}",
    "ﬀﬁﬂ ligatures",
    "ＦＵＬＬＷＩＤＴＨ ｔｅｘｔ！",
    "العربية نص",
    "emoji 🛒 cart 🥦",
    "nbsp space",
    "line separator paragraph",
]


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    from transformers.models.bert.tokenization_bert import BertTokenizer

    tok = WordPieceTokenizer.train(CORPUS, vocab_size=3000, min_frequency=1)
    d = tmp_path_factory.mktemp("vocab")
    tok.save(d)
    hf = BertTokenizer(vocab_file=os.path.join(d, "vocab.txt"), do_lower_case=True)
    return tok, hf


def test_battery_matches_hf(pair):
    tok, hf = pair
    for text in BATTERY:
        ours = tok.encode(text, max_seq_length=512)
        theirs = hf.encode(text, add_special_tokens=True)
        assert ours == theirs, repr(text)


def test_batch_path_matches_hf(pair):
    tok, hf = pair
    ids, mask = tok.encode_batch(BATTERY, max_seq_length=512)
    for r, text in enumerate(BATTERY):
        ours = [int(x) for x in ids[r][: mask[r].sum()]]
        assert ours == hf.encode(text, add_special_tokens=True), repr(text)


def test_random_unicode_matches_hf(pair):
    tok, hf = pair
    rng = random.Random(3)
    pool = (
        list(range(0x20, 0x2F0))
        + list(range(0x370, 0x480))
        + [0x4E00 + i for i in range(60)]
        + [0xFF00 + i for i in range(0x50)]
        + [0x2000 + i for i in range(0x40)]
        + [0xFB00 + i for i in range(10)]
    )
    for _ in range(150):
        text = "".join(chr(rng.choice(pool)) for _ in range(rng.randint(1, 50)))
        ours = tok.encode(text, max_seq_length=512)
        assert ours == hf.encode(text, add_special_tokens=True), repr(text)
