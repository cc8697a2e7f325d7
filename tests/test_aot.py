"""AOT executable store tests: export, zero-compile reload, miss fallback."""

from pathlib import Path

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


def test_server_first_request_zero_compile(tmp_path):
    """A server started against a populated AOT store answers its FIRST
    request without a single compiler invocation.

    Export and serve each run in their own subprocess on a single CPU
    device (the AOT store's target is the single-chip serving image) with
    DIFFERENT XLA persistent-cache directories, so neither this process's
    jit caches nor a shared compilation cache can mask a miss: every
    program the first request needs must come from the serialized-executable
    store, or the serve-side compile spy trips.
    """
    import json
    import os
    import subprocess
    import sys

    from tests.helpers import make_corpus, make_tiny_model_dir

    corpus = make_corpus(12)
    mdir = make_tiny_model_dir(tmp_path, corpus)
    corpus_path = tmp_path / "eval_corpus.json"
    corpus_path.write_text(json.dumps(corpus))
    aot_dir = tmp_path / "aot"
    repo = str(Path(__file__).resolve().parents[1])

    preamble = f"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 1)
import sys
sys.path.insert(0, {repo!r})
"""
    export_script = preamble + f"""
from instacart_next_order_recommendation_tpu.serve.recommender import MonitoredRecommender
from instacart_next_order_recommendation_tpu.serve.precompile import warm_serve_shapes
rec = MonitoredRecommender(model_dir={str(mdir)!r}, corpus_path={str(corpus_path)!r})
n = warm_serve_shapes(rec)
rec.recommend("Organic Milk", top_k=5)  # the exact first-request flow
print("exported", n)
"""
    serve_script = preamble + f"""
import json
import jax._src.compiler as jcompiler
compiled = []
real = jcompiler.compile_or_get_cached
def spy(*args, **kwargs):
    module = kwargs.get("computation", args[1] if len(args) > 1 else None)
    try:
        name = str(module.operation.attributes["sym_name"])
    except Exception:
        name = str(type(module))
    compiled.append(name)
    return real(*args, **kwargs)
jcompiler.compile_or_get_cached = spy

from instacart_next_order_recommendation_tpu.api.app import create_app
from instacart_next_order_recommendation_tpu.api.http import TestClient
app = create_app(model_dir={str(mdir)!r}, corpus_path={str(corpus_path)!r})
with TestClient(app) as c:
    r = c.post("/recommend", json={{"user_context": "Organic Milk", "top_k": 5}})
print("RESULT " + json.dumps({{
    "status": r.status_code,
    "n": len(r.json().get("recommendations", [])),
    "compiled": compiled,
}}))
"""

    def run(script: str, cache_sub: str, export: bool):
        env = dict(os.environ)
        env["ITOR_AOT_DIR"] = str(aot_dir)
        env["ITOR_AOT_EXPORT"] = "1" if export else "0"
        env["ITOR_COMPILATION_CACHE"] = str(tmp_path / cache_sub)
        env["FEEDBACK_DB_PATH"] = str(tmp_path / "fb.db")
        proc = subprocess.run(
            [sys.executable, "-c", script], env=env,
            capture_output=True, text=True, timeout=300,
        )
        assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
        return proc.stdout

    run(export_script, "export_cache", export=True)
    assert list(aot_dir.rglob("*.jaxexec")), "export produced no executables"

    out = run(serve_script, "serve_cache", export=False)
    result = json.loads(out.split("RESULT ", 1)[1])
    assert result["status"] == 200
    assert result["n"] == 5
    assert result["compiled"] == [], (
        f"first request invoked the compiler for: {result['compiled']}"
    )


def test_store_report_and_prune_stale(tmp_path):
    """Lifecycle: report() sizes every fingerprint dir; prune_stale() removes
    only OTHER fingerprints' dirs, never the current one's executables."""
    store = AotStore(tmp_path, export=True)
    fn = jax.jit(lambda x: x * 2)
    x = jnp.ones((4,), jnp.float32)
    store.run("lifecycle_test", fn, (x,))
    assert (store.root / "lifecycle_test.jaxexec").exists()

    # Two stale dirs from imaginary older device/JAX builds.
    for stale in ("v1-tpu_TPU-v4_1dev_jax0.8.0", "v2-tpu_TPU-v4_1dev_jax0.8.5"):
        d = tmp_path / stale
        d.mkdir()
        (d / "old.jaxexec").write_bytes(b"x" * 128)

    rep = store.report()
    assert rep["current"] == store.root.name
    assert len(rep["dirs"]) == 3
    assert rep["dirs"][store.root.name]["current"]
    assert rep["dirs"][store.root.name]["executables"] == 1
    assert rep["dirs"]["v1-tpu_TPU-v4_1dev_jax0.8.0"]["bytes"] == 128

    # Dry run deletes nothing.
    candidates = store.prune_stale(dry_run=True)
    assert sorted(candidates) == [
        "v1-tpu_TPU-v4_1dev_jax0.8.0", "v2-tpu_TPU-v4_1dev_jax0.8.5"
    ]
    assert (tmp_path / "v1-tpu_TPU-v4_1dev_jax0.8.0").exists()

    pruned = store.prune_stale()
    assert sorted(pruned) == sorted(candidates)
    assert not (tmp_path / "v1-tpu_TPU-v4_1dev_jax0.8.0").exists()
    assert not (tmp_path / "v2-tpu_TPU-v4_1dev_jax0.8.5").exists()
    # Current store untouched and still serving.
    assert (store.root / "lifecycle_test.jaxexec").exists()
    fresh = AotStore(tmp_path)
    np.testing.assert_array_equal(
        np.asarray(fresh.run("lifecycle_test", fn, (x,))), np.asarray(x) * 2
    )
