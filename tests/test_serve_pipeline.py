"""FusedServePipeline tests: single-dispatch parity with the two-call path."""

import numpy as np
import pytest

from instacart_next_order_recommendation_tpu.index import ShardedCatalogIndex
from instacart_next_order_recommendation_tpu.models.text_encoder import TextEncoder
from instacart_next_order_recommendation_tpu.serve.pipeline import FusedServePipeline

from tests.helpers import make_corpus, make_tiny_model_dir


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    base = tmp_path_factory.mktemp("fused")
    corpus = make_corpus(60)
    model_dir = make_tiny_model_dir(base, corpus)
    enc = TextEncoder.load(model_dir)
    texts = list(corpus.values())
    catalog = enc.encode(texts, batch_size=16)
    index = ShardedCatalogIndex(catalog, mesh=None)
    fused = FusedServePipeline(enc.params, enc.config, index._catalog, len(texts))
    return enc, texts, catalog, index, fused


def test_fused_matches_two_call_path(setup):
    enc, texts, catalog, index, fused = setup
    queries = ["organic milk", "cheese and rice", "coffee"]
    ids, mask = enc.tokenizer.encode_batch(queries, max_seq_length=enc.max_seq_length)
    s_fused, i_fused = fused.topk(ids, mask, 7)

    emb = enc.encode(queries, batch_size=4)
    s_two, i_two = index.topk(emb, 7)
    np.testing.assert_array_equal(i_fused, i_two)
    np.testing.assert_allclose(s_fused, s_two, atol=1e-5)


def test_packed_unpack_roundtrip(setup):
    enc, texts, catalog, index, fused = setup
    ids, mask = enc.tokenizer.encode_batch(["milk"], max_seq_length=enc.max_seq_length)
    packed, k = fused.topk_device(ids, mask, 5)
    scores, indices = FusedServePipeline.unpack(np.asarray(packed), k)
    assert scores.shape == (1, 5)
    assert indices.dtype == np.int32
    assert (indices >= 0).all() and (indices < len(texts)).all()
    assert (np.diff(scores[0]) <= 1e-6).all()  # descending


def test_k_capped_at_catalog(setup):
    enc, texts, catalog, index, fused = setup
    ids, mask = enc.tokenizer.encode_batch(["milk"], max_seq_length=enc.max_seq_length)
    s, i = fused.topk(ids, mask, 1000)
    assert s.shape[1] == len(texts)
    assert sorted(i[0]) == list(range(len(texts)))


def test_packed_transfer_is_integer_space(setup):
    """Regression: indices must never ride the wire as f32 bit patterns —
    small int32 indices bitcast to f32 are denormals, which real TPUs flush
    to zero (observed: every served product id collapsed to index 0). The
    packed array must be int32 (scores bitcast in, indices native)."""
    enc, texts, catalog, index, fused = setup
    ids, mask = enc.tokenizer.encode_batch(["milk"], max_seq_length=enc.max_seq_length)
    packed, k = fused.topk_device(ids, mask, 5)
    assert np.asarray(packed).dtype == np.int32
