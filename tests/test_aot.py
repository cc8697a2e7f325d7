"""AOT executable store tests: export, zero-compile reload, miss fallback."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instacart_next_order_recommendation_tpu.serve.aot import AotStore

from tests.helpers import make_corpus, make_tiny_model_dir


def test_store_roundtrip(tmp_path):
    jitted = jax.jit(lambda x: x * 2.0 + 1.0)
    x = jnp.arange(8, dtype=jnp.float32)

    exporter = AotStore(tmp_path, export=True)
    out = exporter.run("double", jitted, (x,))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2 + 1)
    files = list(exporter.root.glob("*.jaxexec"))
    assert len(files) == 1

    # Fresh store (serve mode): loads the serialized executable.
    loader = AotStore(tmp_path, export=False)
    out2 = loader.run("double", jitted, (x,))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out))
    assert "double" in loader._mem  # second call comes from memory
    out3 = loader.run("double", jitted, (x,))
    np.testing.assert_allclose(np.asarray(out3), np.asarray(out))


def test_store_miss_falls_back_to_jit(tmp_path):
    jitted = jax.jit(lambda x: x - 3.0)
    x = jnp.ones((4,), jnp.float32)
    store = AotStore(tmp_path, export=False)
    out = store.run("absent", jitted, (x,))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) - 3)
    assert "absent" in store._miss
    # Stays on the fallback without re-statting the file.
    out = store.run("absent", jitted, (x,))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) - 3)


def test_corrupt_artifact_is_clean_miss(tmp_path):
    store = AotStore(tmp_path, export=True)
    (store.root / "bad.jaxexec").write_bytes(b"not a pickle")
    jitted = jax.jit(lambda x: x + 1)
    out = store.run("bad", jitted, (jnp.zeros(2),))
    np.testing.assert_allclose(np.asarray(out), [1, 1])


def test_fingerprint_shape():
    fp = AotStore.fingerprint()
    assert "cpu" in fp and "jax" in fp
    assert "/" not in fp and " " not in fp


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    base = tmp_path_factory.mktemp("aotmodel")
    return make_tiny_model_dir(base, make_corpus(12)), make_corpus(12)


def test_text_encoder_aot_end_to_end(model_dir, tmp_path, monkeypatch):
    from instacart_next_order_recommendation_tpu.models.text_encoder import TextEncoder

    mdir, corpus = model_dir
    texts = list(corpus.values())[:4]

    ref = TextEncoder.load(mdir).encode(texts, batch_size=4)

    # Export pass.
    monkeypatch.setenv("ITOR_AOT_DIR", str(tmp_path))
    monkeypatch.setenv("ITOR_AOT_EXPORT", "1")
    enc = TextEncoder.load(mdir)
    assert enc._aot is not None and enc._aot.export
    out = enc.encode(texts, batch_size=4)
    np.testing.assert_allclose(out, ref, atol=1e-6)
    assert list(enc._aot.root.glob("encode_*.jaxexec"))

    # Serve pass: loads the executable (export off).
    monkeypatch.setenv("ITOR_AOT_EXPORT", "0")
    enc2 = TextEncoder.load(mdir)
    out2 = enc2.encode(texts, batch_size=4)
    np.testing.assert_allclose(out2, ref, atol=1e-6)
    assert enc2._aot._mem  # executable actually loaded from disk


def test_recommender_serve_with_aot(model_dir, tmp_path, monkeypatch):
    """Full Recommender path: export the serve lattice, reload, same ranking."""
    import json

    from instacart_next_order_recommendation_tpu.serve.recommender import Recommender

    mdir, corpus = model_dir
    corpus_path = tmp_path / "corpus.json"
    corpus_path.write_text(json.dumps(corpus))

    rec_ref = Recommender(model_dir=mdir, corpus_path=corpus_path, use_index=False)
    ref = rec_ref.recommend("Organic Milk", top_k=5)

    monkeypatch.setenv("ITOR_AOT_DIR", str(tmp_path / "aot"))
    monkeypatch.setenv("ITOR_AOT_EXPORT", "1")
    rec_exp = Recommender(model_dir=mdir, corpus_path=corpus_path, use_index=False)
    assert rec_exp.recommend("Organic Milk", top_k=5) == ref

    monkeypatch.setenv("ITOR_AOT_EXPORT", "0")
    rec_aot = Recommender(model_dir=mdir, corpus_path=corpus_path, use_index=False)
    assert rec_aot.recommend("Organic Milk", top_k=5) == ref


def test_run_falls_back_when_stored_executable_rejects_args(tmp_path):
    """A deserialized executable whose input avals mismatch the runtime args
    (stale or colliding store) must degrade to the jitted callable, not raise
    on every request."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from instacart_next_order_recommendation_tpu.serve.aot import AotStore

    store = AotStore(tmp_path, export=True)
    f = jax.jit(lambda x: x * 2)
    a = jnp.ones((4,), jnp.float32)
    np.testing.assert_allclose(np.asarray(store.run("k", f, (a,))), 2.0)

    fresh = AotStore(tmp_path)  # loads the serialized executable from disk
    b = jnp.ones((8,), jnp.float32)  # shape the stored executable rejects
    out = fresh.run("k", f, (b,))
    assert out.shape == (8,)
    np.testing.assert_allclose(np.asarray(out), 2.0)
    # And the miss is remembered: subsequent calls go straight to jit.
    out2 = fresh.run("k", f, (b,))
    assert out2.shape == (8,)
