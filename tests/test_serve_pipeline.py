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


def test_score_bitcast_survives_denormal_edge():
    """Adversarial: the packed wire format bitcasts f32 scores to int32 on
    device. Bitcast is a bit-level reinterpret, not arithmetic — so even
    scores that are themselves denormal f32 values (plus 0.0/-0.0/inf/nan
    edges) must round-trip bit-exactly through device -> int32 wire ->
    host view(float32). If a backend's bitcast lowered through a float
    path, flush-to-zero would corrupt exactly these values."""
    import jax
    import jax.numpy as jnp

    edge = np.array(
        [
            0.0, -0.0,
            1e-39, -1e-39,            # f32 denormals
            np.finfo(np.float32).tiny,            # smallest normal
            np.finfo(np.float32).tiny / 2,        # denormal
            1.0, -1.0,
            np.finfo(np.float32).max,
            np.inf, -np.inf, np.nan,
        ],
        dtype=np.float32,
    )
    f = jax.jit(lambda s: jax.lax.bitcast_convert_type(s, jnp.int32))
    wire = np.asarray(f(jnp.asarray(edge)))
    assert wire.dtype == np.int32
    back = wire.view(np.float32)
    np.testing.assert_array_equal(back.view(np.int32), edge.view(np.int32))


def test_unpack_is_exact_for_arbitrary_scores():
    """unpack() must reproduce score bit patterns exactly for any packed
    row, including denormals — it is a view, not a conversion."""
    rng = np.random.default_rng(0)
    scores = rng.standard_normal((3, 4)).astype(np.float32)
    scores[0, 0] = 1e-39  # denormal
    scores[1, 1] = -0.0
    indices = rng.integers(0, 100, size=(3, 4)).astype(np.int32)
    packed = np.concatenate([scores.view(np.int32), indices], axis=1)
    s, i = FusedServePipeline.unpack(packed, 4)
    np.testing.assert_array_equal(s.view(np.int32), scores.view(np.int32))
    np.testing.assert_array_equal(i, indices)
