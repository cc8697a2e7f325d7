"""Operator plumbing for the top-k kernel knobs.

Round-3 contract: packed extraction and the blocked-vs-dense dispatch are
flippable from serving config (inference.yaml ``topk_extraction``) or env
(ITOR_TOPK_EXTRACTION / ITOR_TOPK_DISPATCH) — no source edits. These tests
build real servers from that config and assert the knobs reach the kernel.
"""

from __future__ import annotations

from unittest import mock

import jax.numpy as jnp
import numpy as np
import pytest

from instacart_next_order_recommendation_tpu import ops
from instacart_next_order_recommendation_tpu.ops import topk as topk_mod
from tests.helpers import make_corpus, make_tiny_model_dir, write_corpus_json


@pytest.fixture
def served(tmp_path):
    corpus = make_corpus(40)
    model_dir = make_tiny_model_dir(tmp_path, corpus)
    corpus_path = write_corpus_json(tmp_path, corpus)
    return model_dir, corpus_path


def _build(model_dir, corpus_path, **kw):
    """Server pinned to ONE device so the fused single-device serve path
    (what a 1-chip deployment runs) is what these tests exercise — the test
    env's 8-device CPU mesh would otherwise shard the index and skip it."""
    import jax
    from jax.sharding import Mesh

    from instacart_next_order_recommendation_tpu.serve import Recommender

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("data",))
    return Recommender(model_dir=model_dir, corpus_path=corpus_path, mesh=mesh, **kw)


def test_env_plumbs_packed_extraction(served, monkeypatch):
    """A server built from paths only (the API constructor) honors
    ITOR_TOPK_EXTRACTION=packed end to end."""
    monkeypatch.setenv("ITOR_TOPK_EXTRACTION", "packed")
    rec = _build(*served)
    assert rec.index.packed
    assert rec._fused is not None and rec._fused.packed
    out = rec.recommend("organic milk", top_k=5)
    assert len(out) == 5


def test_config_arg_overrides_env(served, monkeypatch):
    monkeypatch.setenv("ITOR_TOPK_EXTRACTION", "packed")
    rec = _build(*served, topk_extraction="exact")
    assert not rec.index.packed
    assert rec._fused is not None and not rec._fused.packed


def test_invalid_extraction_raises(served):
    with pytest.raises(ValueError, match="extraction"):
        _build(*served, topk_extraction="bogus")


def test_packed_kernel_hit_from_config(served, monkeypatch):
    """With Pallas forced (interpret mode on CPU), a config-built server's
    recommend() actually reaches the packed kernel — not just a flag."""
    import jax

    monkeypatch.setattr(ops, "use_pallas", lambda: True)
    # A 1-chip deployment has device_count()==1; the test env's 8 virtual
    # CPU devices would otherwise veto the Pallas path for non-local calls.
    monkeypatch.setattr(jax, "device_count", lambda *a, **k: 1)
    calls: list[bool] = []
    real = topk_mod.cosine_topk_pallas

    def spy(*args, **kwargs):
        calls.append(bool(kwargs.get("packed", False)))
        return real(*args, **kwargs)

    monkeypatch.setattr(topk_mod, "cosine_topk_pallas", spy)
    rec = _build(*served, topk_extraction="packed")
    exact = _build(*served, topk_extraction="exact")
    out = rec.recommend("organic milk", top_k=5)
    assert calls and all(calls), "packed flag did not reach the Pallas kernel"
    # Results agree with the exact path up to the packed 20-bit score
    # quantization (ids may swap only between near-ties; tiny corpus has none).
    ref = exact.recommend("organic milk", top_k=5)
    assert [p for p, _ in out] == [p for p, _ in ref]
    np.testing.assert_allclose(
        [s for _, s in out], [s for _, s in ref], atol=2e-3
    )


@pytest.fixture
def qc(scope="module"):
    rng = np.random.default_rng(0)
    c = rng.standard_normal((512, 64), dtype=np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    q = c[:8] + 0.01 * rng.standard_normal((8, 64), dtype=np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return jnp.asarray(q), jnp.asarray(c)


def test_dispatch_env_forces_dense(qc, monkeypatch):
    """ITOR_TOPK_DISPATCH=dense keeps even a Pallas-capable call on the
    dense scores+lax.top_k path."""
    q, c = qc
    monkeypatch.setattr(ops, "use_pallas", lambda: True)
    monkeypatch.setenv("ITOR_TOPK_DISPATCH", "dense")
    with mock.patch.object(
        topk_mod, "cosine_topk_pallas", wraps=topk_mod.cosine_topk_pallas
    ) as spy:
        s, i = ops.cosine_topk(q, c, 5, local=True)
    assert spy.call_count == 0
    expect = np.argsort(-np.asarray(q @ c.T), axis=1)[:, :5]
    np.testing.assert_array_equal(np.asarray(i), expect)


def test_dispatch_env_forces_blocked_beyond_crossover(qc, monkeypatch):
    """ITOR_TOPK_DISPATCH=blocked pins the Pallas kernel at k>32 where the
    auto crossover would pick dense."""
    q, c = qc
    monkeypatch.setattr(ops, "use_pallas", lambda: True)
    monkeypatch.setenv("ITOR_TOPK_DISPATCH", "blocked")
    with mock.patch.object(
        topk_mod, "cosine_topk_pallas", wraps=topk_mod.cosine_topk_pallas
    ) as spy:
        s, i = ops.cosine_topk(q, c, 48, local=True)
    assert spy.call_count == 1
    expect = np.argsort(-np.asarray(q @ c.T), axis=1)[:, :48]
    np.testing.assert_array_equal(np.asarray(i), expect)


def test_dispatch_auto_crossover_unchanged(qc, monkeypatch):
    """auto (and unset) keep the measured k~32 crossover: dense at k=48 when
    the score matrix fits."""
    q, c = qc
    monkeypatch.setattr(ops, "use_pallas", lambda: True)
    monkeypatch.delenv("ITOR_TOPK_DISPATCH", raising=False)
    with mock.patch.object(
        topk_mod, "cosine_topk_pallas", wraps=topk_mod.cosine_topk_pallas
    ) as spy:
        ops.cosine_topk(q, c, 48, local=True)
        assert spy.call_count == 0  # dense beyond the crossover
        ops.cosine_topk(q, c, 8, local=True)
        assert spy.call_count == 1  # blocked at small k


def test_aot_key_suffix_pins_knobs(monkeypatch):
    """AOT-store keys must change when the knobs do, or a stored executable
    compiled for the other path would shadow the override."""
    monkeypatch.delenv("ITOR_TOPK_DISPATCH", raising=False)
    assert topk_mod.topk_cache_suffix() == ""
    assert topk_mod.topk_cache_suffix(packed=True) == "_pk1"
    monkeypatch.setenv("ITOR_TOPK_DISPATCH", "dense")
    assert topk_mod.topk_cache_suffix() == "_disp-dense"
    assert topk_mod.topk_cache_suffix(packed=True) == "_pk1_disp-dense"


def test_aot_store_keys_separate_dispatch_variants(served, monkeypatch, tmp_path):
    """Flipping ITOR_TOPK_DISPATCH against a warm AOT store must compile a
    NEW executable under a new key — never load the other path's program."""
    import jax
    from jax.sharding import Mesh

    from instacart_next_order_recommendation_tpu.index import ShardedCatalogIndex

    store = tmp_path / "aot"
    monkeypatch.setenv("ITOR_AOT_DIR", str(store))
    monkeypatch.setenv("ITOR_AOT_EXPORT", "1")
    monkeypatch.delenv("ITOR_TOPK_DISPATCH", raising=False)

    rng = np.random.default_rng(1)
    cat = rng.standard_normal((256, 32), dtype=np.float32)
    cat /= np.linalg.norm(cat, axis=1, keepdims=True)
    q = cat[:4]
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("data",))

    ShardedCatalogIndex(cat, mesh=mesh).topk(q, 5)
    auto_files = {p.name for p in store.rglob("*.jaxexec")}
    assert auto_files and not any("_disp" in n for n in auto_files)

    monkeypatch.setenv("ITOR_TOPK_DISPATCH", "dense")
    s_d, i_d = ShardedCatalogIndex(cat, mesh=mesh).topk(q, 5)
    dense_files = {p.name for p in store.rglob("*.jaxexec")} - auto_files
    assert dense_files and all("_disp-dense" in n for n in dense_files)
    expect = np.argsort(-(q @ cat.T), axis=1)[:, :5]
    np.testing.assert_array_equal(i_d, expect)
