"""TextEncoder tests: batch-size invariance, device/host paths, profiling hook."""

import numpy as np
import pytest

from instacart_next_order_recommendation_tpu.models.text_encoder import TextEncoder
from instacart_next_order_recommendation_tpu.utils.profiling import maybe_trace

from tests.helpers import make_corpus, make_tiny_model_dir


@pytest.fixture(scope="module")
def encoder(tmp_path_factory):
    base = tmp_path_factory.mktemp("textenc")
    corpus = make_corpus(20)
    model_dir = make_tiny_model_dir(base, corpus)
    return TextEncoder.load(model_dir), list(corpus.values())


def test_batch_size_invariance(encoder):
    enc, texts = encoder
    full = enc.encode(texts, batch_size=16)
    small = enc.encode(texts, batch_size=3)
    np.testing.assert_allclose(full, small, atol=1e-5)


def test_encode_device_matches_host_path(encoder):
    enc, texts = encoder
    host = enc.encode(texts[:4], batch_size=4)
    dev = np.asarray(enc.encode_device(texts[:4]))
    np.testing.assert_allclose(host, dev, atol=1e-6)


def test_unit_norm_output(encoder):
    enc, texts = encoder
    out = enc.encode(texts[:5], batch_size=5)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)


def test_with_params_shares_jit(encoder):
    enc, texts = encoder
    view = enc.with_params(enc.params)
    assert view._jitted is enc._jitted
    np.testing.assert_array_equal(
        enc.encode(texts[:2], batch_size=2), view.encode(texts[:2], batch_size=2)
    )


def test_maybe_trace_noop_without_env(monkeypatch):
    monkeypatch.delenv("ITOR_PROFILE_DIR", raising=False)
    with maybe_trace("x"):
        pass  # must be free and not raise


def test_mesh_sharded_encode_matches_single_device(encoder):
    import jax

    from instacart_next_order_recommendation_tpu.parallel import MeshConfig, build_mesh

    enc, texts = encoder
    mesh = build_mesh(MeshConfig())
    from instacart_next_order_recommendation_tpu.models.text_encoder import TextEncoder

    sharded = TextEncoder(enc.params, enc.config, enc.tokenizer, enc.max_seq_length, mesh=mesh)
    a = enc.encode(texts, batch_size=8)
    b = sharded.encode(texts, batch_size=8)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_sort_by_length_output_order_and_values(encoder):
    """Length-sorted batching must return embeddings in input order, equal to
    the unsorted path (padding is masked, so batchmates don't matter)."""
    enc, texts = encoder
    varied = [t * (1 + i % 5) for i, t in enumerate(texts)]  # widely varying lengths
    ref = enc.encode(varied, batch_size=4, sort_by_length=False)
    out = enc.encode(varied, batch_size=4, sort_by_length=True)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_wire_carries_ids_only_int16(encoder):
    """Small vocabs ride the wire as int16 and no mask is transferred; the
    device-side pad mask must reproduce the tokenizer's mask exactly."""
    import jax.numpy as jnp

    enc, texts = encoder
    assert enc.tokenizer.vocab_size <= np.iinfo(np.int16).max
    assert enc.wire_dtype == np.int16
    ids, mask = enc.tokenizer.encode_batch(texts[:3], max_seq_length=enc.max_seq_length)
    np.testing.assert_array_equal((ids != enc.tokenizer.pad_id).astype(np.int32), mask)
    emb = enc._run_encode(jnp.asarray(ids.astype(np.int16)))
    np.testing.assert_allclose(
        np.asarray(emb), enc.encode(texts[:3], batch_size=4), atol=1e-5
    )


def test_encode_resident_matches_host_encode(encoder):
    """Device-resident encode must equal the host path, in input order."""
    enc, texts = encoder
    varied = [t * (1 + i % 4) for i, t in enumerate(texts)]
    ref = enc.encode(varied, batch_size=4)
    out = np.asarray(enc.encode_resident(varied, batch_size=4))
    np.testing.assert_allclose(out, ref, atol=1e-5)
    # single-batch path (no concat, no permute)
    out1 = np.asarray(enc.encode_resident(varied[:3], batch_size=8))
    np.testing.assert_allclose(out1, ref[:3], atol=1e-5)


def test_encode_resident_mesh_batch_not_dp_multiple(encoder):
    """encode_resident must round the batch bucket up to a data-axis multiple
    (a raw batch_size like 5 on a dp mesh would fail the sharded device_put)."""
    from instacart_next_order_recommendation_tpu.models.text_encoder import TextEncoder
    from instacart_next_order_recommendation_tpu.parallel import MeshConfig, build_mesh

    enc, texts = encoder
    mesh = build_mesh(MeshConfig())
    sharded = TextEncoder(enc.params, enc.config, enc.tokenizer, enc.max_seq_length, mesh=mesh)
    ref = enc.encode(texts, batch_size=8)
    out = np.asarray(sharded.encode_resident(texts, batch_size=5))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_encode_resident_empty(encoder):
    enc, _ = encoder
    out = np.asarray(enc.encode_resident([], batch_size=4))
    assert out.shape == (0, enc.config.hidden_size)
