"""Embedding index cache, sharded catalog index, and Recommender tests."""

import json
import os
import time

import jax
import numpy as np
import pytest

from instacart_next_order_recommendation_tpu.index import (
    EmbeddingIndex,
    ShardedCatalogIndex,
)
from instacart_next_order_recommendation_tpu.parallel import MeshConfig, build_mesh
from instacart_next_order_recommendation_tpu.serve import (
    MonitoredRecommender,
    Recommender,
)

from tests.helpers import make_corpus, make_tiny_model_dir, write_corpus_json


class TestEmbeddingIndexCache:
    def _make(self, tmp_path, rng):
        corpus_path = tmp_path / "eval_corpus.json"
        corpus_path.write_text(json.dumps({"1": "a", "2": "b"}))
        ids = ["1", "2"]
        emb = rng.standard_normal((2, 8)).astype(np.float32)
        return corpus_path, ids, emb

    def test_roundtrip(self, tmp_path, rng):
        corpus_path, ids, emb = self._make(tmp_path, rng)
        idx = EmbeddingIndex(corpus_path, "model_a")
        assert idx.load(ids) is None
        idx.save(ids, emb)
        loaded = idx.load(ids)
        np.testing.assert_array_equal(loaded, emb)

    def test_miss_on_corpus_change(self, tmp_path, rng):
        corpus_path, ids, emb = self._make(tmp_path, rng)
        idx = EmbeddingIndex(corpus_path, "model_a")
        idx.save(ids, emb)
        time.sleep(0.01)
        corpus_path.write_text(json.dumps({"1": "a", "2": "CHANGED"}))
        assert EmbeddingIndex(corpus_path, "model_a").load(ids) is None

    def test_miss_on_id_mismatch(self, tmp_path, rng):
        corpus_path, ids, emb = self._make(tmp_path, rng)
        idx = EmbeddingIndex(corpus_path, "model_a")
        idx.save(ids, emb)
        assert idx.load(["1", "3"]) is None

    def test_distinct_cache_per_model(self, tmp_path, rng):
        corpus_path, ids, emb = self._make(tmp_path, rng)
        EmbeddingIndex(corpus_path, "model_a").save(ids, emb)
        assert EmbeddingIndex(corpus_path, "model_b").load(ids) is None


class TestShardedCatalogIndex:
    def _data(self, rng, n, d=32, b=4):
        c = rng.standard_normal((n, d)).astype(np.float32)
        c /= np.linalg.norm(c, axis=1, keepdims=True)
        q = rng.standard_normal((b, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        return q, c

    def _expect(self, q, c, k):
        scores = q @ c.T
        idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
        return np.take_along_axis(scores, idx, axis=1), idx

    def test_single_device_exact(self, rng):
        q, c = self._data(rng, 200)
        index = ShardedCatalogIndex(c, mesh=None)
        s, i = index.topk(q, 10)
        es, ei = self._expect(q, c, 10)
        np.testing.assert_array_equal(i, ei)
        np.testing.assert_allclose(s, es, atol=1e-5)

    @pytest.mark.parametrize("n", [256, 203])  # divisible and ragged shard sizes
    def test_mesh_sharded_exact(self, rng, n):
        mesh = build_mesh(MeshConfig())
        assert mesh.shape["data"] == 8
        q, c = self._data(rng, n)
        index = ShardedCatalogIndex(c, mesh=mesh)
        s, i = index.topk(q, 12)
        es, ei = self._expect(q, c, 12)
        np.testing.assert_allclose(s, es, atol=1e-5)
        # indices may tie-swap across shards only on exact score ties (none here)
        np.testing.assert_array_equal(i, ei)

    def test_k_larger_than_shard(self, rng):
        mesh = build_mesh(MeshConfig())
        q, c = self._data(rng, 40)  # shard_rows = 5 < k
        index = ShardedCatalogIndex(c, mesh=mesh)
        s, i = index.topk(q, 20)
        es, ei = self._expect(q, c, 20)
        np.testing.assert_allclose(s, es, atol=1e-5)
        np.testing.assert_array_equal(i, ei)

    def _expect_masked(self, q, c, k, mask):
        scores = q @ c.T
        scores = np.where(mask[None, :] != 0, scores, -np.inf)
        idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
        return np.take_along_axis(scores, idx, axis=1), idx

    @pytest.mark.parametrize("mesh_on", [False, True])
    def test_candidate_mask_exact(self, rng, mesh_on):
        mesh = build_mesh(MeshConfig()) if mesh_on else None
        q, c = self._data(rng, 203)
        mask = (rng.random(203) < 0.4).astype(np.int32)
        index = ShardedCatalogIndex(c, mesh=mesh)
        s, i = index.topk(q, 10, candidate_mask=mask)
        es, ei = self._expect_masked(q, c, 10, mask)
        np.testing.assert_allclose(s, es, atol=1e-5)
        np.testing.assert_array_equal(i, ei)
        assert all(mask[j] == 1 for j in i.ravel())

    def test_mask_with_fewer_than_k_candidates(self, rng):
        q, c = self._data(rng, 100)
        mask = np.zeros(100, np.int32)
        mask[[3, 50, 97]] = 1
        index = ShardedCatalogIndex(c, mesh=None)
        s, i = index.topk(q, 10, candidate_mask=mask)
        # exactly 3 real candidates; the rest are -inf sentinel rows
        assert (s[:, :3] > -1e29).all()
        assert (s[:, 3:] <= -1e29).all()
        assert set(i[:, :3].ravel()) <= {3, 50, 97}


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    base = tmp_path_factory.mktemp("serve")
    corpus = make_corpus(40)
    model_dir = make_tiny_model_dir(base, corpus)
    corpus_path = write_corpus_json(base, corpus)
    rec = MonitoredRecommender(model_dir=model_dir, corpus_path=corpus_path)
    return base, model_dir, corpus_path, corpus, rec


class TestRecommender:
    def test_returns_sorted_topk(self, served):
        *_, rec = served
        results = rec.recommend("organic milk", top_k=5)
        assert len(results) == 5
        scores = [s for _, s in results]
        assert scores == sorted(scores, reverse=True)
        assert all(pid in rec.pid_to_text for pid, _ in results)

    def test_exclusion_after_ranking(self, served):
        *_, rec = served
        baseline = rec.recommend("organic milk", top_k=5)
        excluded = {baseline[0][0], baseline[2][0]}
        filtered = rec.recommend("organic milk", top_k=5, exclude_product_ids=excluded)
        assert all(pid not in excluded for pid, _ in filtered)
        # remaining order preserved: baseline minus excluded, plus next-ranked
        expect_prefix = [pid for pid, _ in baseline if pid not in excluded]
        assert [pid for pid, _ in filtered[: len(expect_prefix)]] == expect_prefix

    def test_monitored_metrics_populated(self, served):
        *_, rec = served
        rec.recommend("bread", top_k=3, user_id="u42")
        m = rec.last_metrics
        assert m is not None
        assert m.user_id == "u42"
        assert m.num_recommendations == 3
        assert m.total_latency_ms > 0
        assert m.query_embedding_time_ms > 0
        assert m.similarity_compute_time_ms > 0
        assert m.top_score >= m.avg_score

    def test_index_cache_reused(self, served):
        base, model_dir, corpus_path, corpus, rec = served
        # Second construction must hit the disk cache with identical embeddings.
        rec2 = Recommender(model_dir=model_dir, corpus_path=corpus_path)
        np.testing.assert_array_equal(rec2.product_embeddings, rec.product_embeddings)
        cache_dirs = list((corpus_path.parent / ".embedding_index").iterdir())
        assert len(cache_dirs) == 1

    def test_corpus_key_order_is_ranking_order(self, served):
        *_, rec = served
        assert rec.product_ids == list(make_corpus(40).keys())

    def test_category_parsing(self, served):
        *_, rec = served
        assert rec.aisles == [f"a{i}" for i in range(5)]
        assert rec.departments == [f"d{i}" for i in range(3)]

    def test_aisle_filter_restricts_candidates(self, served):
        *_, corpus, rec = served
        results = rec.recommend("organic milk", top_k=8, filter_aisles=["a1"])
        assert results  # aisle a1 has 8 of 40 products
        for pid, _ in results:
            assert "Aisle: a1." in corpus[pid]
        # filtered top-k == brute-force rank restricted to the aisle
        full = rec.recommend("organic milk", top_k=40)
        expect = [pid for pid, _ in full if "Aisle: a1." in corpus[pid]][: len(results)]
        assert [pid for pid, _ in results] == expect

    def test_department_and_aisle_filters_intersect(self, served):
        *_, corpus, rec = served
        results = rec.recommend(
            "bread", top_k=10, filter_aisles=["a0", "a1"], filter_departments=["d0"]
        )
        for pid, _ in results:
            assert "Department: d0." in corpus[pid]
            assert ("Aisle: a0." in corpus[pid]) or ("Aisle: a1." in corpus[pid])

    def test_filter_fewer_candidates_than_k(self, served):
        *_, corpus, rec = served
        # a2 ∩ d2 is small; results must not be padded with masked rows
        results = rec.recommend(
            "rice", top_k=10, filter_aisles=["a2"], filter_departments=["d2"]
        )
        n_eligible = sum(
            1 for t in corpus.values() if "Aisle: a2." in t and "Department: d2." in t
        )
        assert len(results) == min(10, n_eligible)
        assert all(s > -1e29 for _, s in results)

    def test_unknown_filter_value_gives_empty(self, served):
        *_, rec = served
        assert rec.recommend("milk", top_k=5, filter_aisles=["nope"]) == []

    @pytest.fixture(scope="class")
    def served_fused(self, served):
        """A dp=1 recommender so the fused single-dispatch path is active
        (the module `served` fixture rides the 8-device test mesh, where
        the sharded index keeps encode separate)."""
        base, model_dir, corpus_path, corpus, _ = served
        mesh = build_mesh(MeshConfig(data_parallel=1, model_parallel=1))
        return MonitoredRecommender(
            model_dir=model_dir, corpus_path=corpus_path, mesh=mesh
        )

    def test_monitored_single_dispatch_matches_legacy(self, served_fused, monkeypatch):
        """The default monitored path serves through the one-dispatch fused
        program with calibrated stage stats; ITOR_MONITORED_SINGLE_DISPATCH=0
        restores the wall-clocked two-dispatch path. Results must be
        identical and both must populate the full stats contract."""
        rec = served_fused
        assert rec._fused is not None
        fused = rec.recommend("organic milk", top_k=5, user_id="u1")
        m_fused = rec.last_metrics
        assert rec._stage_cal._cache, "calibration table not populated"

        monkeypatch.setenv("ITOR_MONITORED_SINGLE_DISPATCH", "0")
        legacy = rec.recommend("organic milk", top_k=5, user_id="u1")
        m_legacy = rec.last_metrics

        assert [p for p, _ in fused] == [p for p, _ in legacy]
        np.testing.assert_allclose(
            [s for _, s in fused], [s for _, s in legacy], atol=1e-5
        )
        for m in (m_fused, m_legacy):
            assert m.query_embedding_time_ms > 0
            assert m.similarity_compute_time_ms > 0
            assert m.total_latency_ms > 0

    def test_stage_calibration_cached_and_refreshed(self, served_fused):
        """Repeat requests on the same shape bucket reuse the calibration
        entry (no re-measurement inside the TTL); an expired entry keeps
        serving the stale value while a BACKGROUND refresh re-measures."""
        import time as time_mod

        rec = served_fused
        rec.recommend("organic milk", top_k=5)
        cache = rec._stage_cal._cache
        key, entry = next(iter(cache.items()))
        rec.recommend("organic milk", top_k=5)
        assert cache[key][2] == entry[2]  # same measurement timestamp
        # Expire it: the next request serves the stale entry immediately
        # and kicks an async refresh; poll for the new measurement.
        cache[key] = (entry[0], entry[1], 0.0)
        rec.recommend("organic milk", top_k=5)
        deadline = time_mod.time() + 10
        while cache[key][2] == 0.0 and time_mod.time() < deadline:
            time_mod.sleep(0.05)
        assert cache[key][2] > 0.0, "background refresh never landed"

    def test_precompile_warms_serve_shapes(self, served):
        from instacart_next_order_recommendation_tpu.serve.precompile import (
            warm_serve_shapes,
        )

        *_, rec = served
        n = warm_serve_shapes(rec, k_buckets=(16, 32), batch_buckets=(1, 2))
        assert n > 0
        # every first-request shape is now cached: identical results, no error
        assert len(rec.recommend("organic milk", top_k=5)) == 5

    def test_precompile_serial_matches_parallel_count(self, served):
        # jobs=1 (serial) must warm the exact same program set as the
        # default thread pool — the count is the contract the startup log
        # and AOT export rely on.
        from instacart_next_order_recommendation_tpu.serve.precompile import (
            warm_serve_shapes,
        )

        *_, rec = served
        serial = warm_serve_shapes(rec, k_buckets=(16,), batch_buckets=(1,), jobs=1)
        pooled = warm_serve_shapes(rec, k_buckets=(16,), batch_buckets=(1,))
        assert serial == pooled > 0

    def test_precompile_skips_test_doubles(self):
        from types import SimpleNamespace

        from instacart_next_order_recommendation_tpu.serve.precompile import (
            warm_serve_shapes,
        )

        assert warm_serve_shapes(SimpleNamespace()) == 0

    def test_filter_with_exclusion(self, served):
        *_, corpus, rec = served
        base = rec.recommend("milk", top_k=5, filter_aisles=["a1"])
        excl = {base[0][0]}
        out = rec.recommend("milk", top_k=5, filter_aisles=["a1"], exclude_product_ids=excl)
        assert all(pid not in excl for pid, _ in out)
        assert [p for p, _ in out[: len(base) - 1]] == [p for p, _ in base[1:]]


class TestBf16Index:
    def test_bf16_rankings_match_f32_with_margin(self, rng):
        # Well-separated clusters: bf16 quantization must not change top-k.
        d = 32
        centers = rng.standard_normal((10, d)).astype(np.float32) * 5
        c = np.concatenate([centers + 0.01 * rng.standard_normal((10, d)) for _ in range(20)])
        c /= np.linalg.norm(c, axis=1, keepdims=True)
        q = centers[:4] / np.linalg.norm(centers[:4], axis=1, keepdims=True)

        f32 = ShardedCatalogIndex(c, dtype="float32")
        bf16 = ShardedCatalogIndex(c, dtype="bfloat16")
        _, i32 = f32.topk(q, 5)
        _, i16 = bf16.topk(q, 5)
        # bf16 may reorder near-tied clones WITHIN a cluster, but every
        # retrieved row must come from the query's cluster (row % 10 == qid).
        for qid in range(len(q)):
            assert all(int(r) % 10 == qid for r in i16[qid])
            assert all(int(r) % 10 == qid for r in i32[qid])

    def test_bf16_on_mesh(self, rng):
        from instacart_next_order_recommendation_tpu.parallel import MeshConfig, build_mesh

        mesh = build_mesh(MeshConfig())
        c = rng.standard_normal((100, 16)).astype(np.float32)
        c /= np.linalg.norm(c, axis=1, keepdims=True)
        q = c[:3]
        index = ShardedCatalogIndex(c, mesh=mesh, dtype="bfloat16")
        scores, idx = index.topk(q, 1)
        # each query's own row must be its top hit
        np.testing.assert_array_equal(idx[:, 0], [0, 1, 2])
