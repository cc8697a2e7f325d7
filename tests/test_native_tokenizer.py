"""Native (C++) tokenizer parity vs the pure-Python implementation."""

import numpy as np
import pytest

from instacart_next_order_recommendation_tpu.tokenizer import WordPieceTokenizer

CORPUS = [
    "Product: Organic Milk. Aisle: milk. Department: dairy eggs.",
    "Product: Whole Wheat Bread 2% extra-fine (sliced)! Aisle: bread.",
    "[+7d w4h14] Organic Milk, Whole Wheat Bread. Next: +3d w1h9",
    "numbers 123 456 mixed42tokens UPPER lower MiXeD",
]


@pytest.fixture(scope="module")
def tok():
    t = WordPieceTokenizer.train(CORPUS, vocab_size=800, min_frequency=1)
    native = t._get_native()
    if native is None:
        pytest.skip("native tokenizer unavailable (no g++)")
    return t


def _python_batch(tok, texts, **kw):
    saved = tok._native
    tok._native = False
    try:
        return tok.encode_batch(texts, **kw)
    finally:
        tok._native = saved


@pytest.mark.parametrize("pad_to", [None, 64])
def test_batch_parity(tok, pad_to):
    texts = CORPUS + ["unseen zzqx words!", "a b c . , ; '"]
    ids_n, mask_n = tok.encode_batch(texts, max_seq_length=64, pad_to=pad_to)
    ids_p, mask_p = _python_batch(tok, texts, max_seq_length=64, pad_to=pad_to)
    np.testing.assert_array_equal(ids_n, ids_p)
    np.testing.assert_array_equal(mask_n, mask_p)


def test_truncation_parity(tok):
    long_text = " ".join(["organic milk"] * 200)
    ids_n, mask_n = tok.encode_batch([long_text], max_seq_length=32, pad_to=32)
    ids_p, mask_p = _python_batch(tok, [long_text], max_seq_length=32, pad_to=32)
    np.testing.assert_array_equal(ids_n, ids_p)
    assert ids_n[0, -1] == tok.sep_id


def test_batch_row_padding(tok):
    ids, mask = tok.encode_batch(["milk"], pad_batch_to=4, pad_to=16)
    assert ids.shape == (4, 16)
    assert mask[1:].sum() == 0
    assert (ids[1:] == tok.pad_id).all()


def test_unicode_handled_natively(tok):
    # Accented/CJK/fullwidth/emoji text runs through the native path (no
    # bail) and matches Python exactly.
    texts = ["café au lait", "中文分词", "ＦＵＬＬ ｗｉｄｔｈ！", "emoji 🛒 cart", "ß İstanbul"]
    native = tok._get_native()
    _, _, _, bailed = native.encode_batch(texts, 32, len(texts), tok.pad_id)
    assert bailed.sum() == 0
    ids, mask = tok.encode_batch(texts, max_seq_length=32)
    ids_p, mask_p = _python_batch(tok, texts, max_seq_length=32)
    np.testing.assert_array_equal(ids, ids_p)
    np.testing.assert_array_equal(mask, mask_p)


def test_context_sensitive_rows_bail_to_python(tok):
    # Decomposed combining marks are context-sensitive under NFC: the native
    # path must bail those rows and the wrapper must re-encode them so the
    # final batch still matches pure Python.
    texts = ["café decomposed", "milk", "marḱs"]
    native = tok._get_native()
    _, _, _, bailed = native.encode_batch(texts, 32, len(texts), tok.pad_id)
    assert bailed[0] == 1 and bailed[1] == 0 and bailed[2] == 1
    ids, mask = tok.encode_batch(texts, max_seq_length=32)
    ids_p, mask_p = _python_batch(tok, texts, max_seq_length=32)
    np.testing.assert_array_equal(ids, ids_p)
    np.testing.assert_array_equal(mask, mask_p)


def test_nul_and_control_chars(tok):
    texts = ["ctrl\x07milk\x00shake", "a\x00b"]
    ids, mask = tok.encode_batch(texts, max_seq_length=32)
    ids_p, mask_p = _python_batch(tok, texts, max_seq_length=32)
    np.testing.assert_array_equal(ids, ids_p)


def test_unicode_fuzz_parity(tok):
    import random

    rng = random.Random(7)
    pool = (
        list(range(0x20, 0x250))
        + list(range(0x370, 0x450))
        + [0x4E00 + i for i in range(40)]
        + [0x1F600 + i for i in range(20)]
        + [0x2000 + i for i in range(0x30)]
        + [0xFF00 + i for i in range(0x40)]
        + [0x0301, 0x2028, 0xFE0F, 0x10400]
    )
    texts = [
        "".join(chr(rng.choice(pool)) for _ in range(rng.randint(1, 40)))
        for _ in range(120)
    ]
    ids, mask = tok.encode_batch(texts, max_seq_length=48)
    ids_p, mask_p = _python_batch(tok, texts, max_seq_length=48)
    np.testing.assert_array_equal(ids, ids_p)
    np.testing.assert_array_equal(mask, mask_p)


def test_native_faster_than_python(tok):
    import time

    texts = [f"Product: Organic Milk {i}. Aisle: milk. Department: dairy." for i in range(2000)]
    tok.encode_batch(texts[:10], pad_to=64)  # warm native caches
    t0 = time.time()
    tok.encode_batch(texts, pad_to=64)
    native_t = time.time() - t0
    t0 = time.time()
    _python_batch(tok, texts, pad_to=64)
    python_t = time.time() - t0
    assert native_t < python_t, (native_t, python_t)


def test_concurrent_encode_batch_shared_handle(tok):
    """One native handle hammered from many threads stays correct.

    ctypes releases the GIL during wp_encode_batch, and serving shares a
    single handle across request threads (plus the precompile pool) — the
    word-piece memo inside the handle is the shared mutable state. Every
    thread must get results identical to a serial encode of the same rows.
    """
    from concurrent.futures import ThreadPoolExecutor

    import numpy as np

    rng = np.random.default_rng(7)
    words = [
        "organic", "milk", "bread", "wheat", "aisle", "department", "dairy",
        "unseenzzqx", "mixed42tokens", "upper", "lower", "banana", "yogurt",
    ]
    texts = [
        " ".join(rng.choice(words, size=rng.integers(2, 12)).tolist())
        + f" {int(rng.integers(0, 99999))}"
        for _ in range(400)
    ]
    expected_ids, expected_mask = tok.encode_batch(texts, max_seq_length=48, pad_to=48)

    def worker(seed: int):
        order = np.random.default_rng(seed).permutation(len(texts))
        shuffled = [texts[i] for i in order]
        ids, mask = tok.encode_batch(shuffled, max_seq_length=48, pad_to=48)
        return order, ids, mask

    with ThreadPoolExecutor(8) as ex:
        for order, ids, mask in ex.map(worker, range(16)):
            np.testing.assert_array_equal(ids, expected_ids[order])
            np.testing.assert_array_equal(mask, expected_mask[order])
