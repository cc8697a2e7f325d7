"""IVF approximate index tests: recall vs the exact scan, exactness at full
probe, candidate-mask support, and Recommender integration."""

import numpy as np
import pytest

from instacart_next_order_recommendation_tpu.index import (
    IVFCatalogIndex,
    ShardedCatalogIndex,
)


def _clustered_data(seed, n=4000, d=32, n_clusters=50, b=32):
    """Unit-norm embeddings with cluster structure (like a trained catalog)."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, n_clusters, n)
    emb = centers[assign] + 0.25 * rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    # queries near cluster centers (realistic retrieval load)
    qc = rng.integers(0, n_clusters, b)
    q = centers[qc] + 0.25 * rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return q.astype(np.float32), emb


def test_recall_vs_exact():
    q, emb = _clustered_data(0)
    exact = ShardedCatalogIndex(emb, mesh=None)
    # probing 1/4 of the clusters recovers >=90% of the exact top-10
    ivf = IVFCatalogIndex(emb, nlist=64, nprobe=16, seed=0)
    _, ei = exact.topk(q, 10)
    _, ai = ivf.topk(q, 10)
    overlap = np.mean(
        [len(set(ei[r]) & set(ai[r])) / 10.0 for r in range(len(q))]
    )
    assert overlap >= 0.9, overlap


def test_full_probe_is_exact():
    q, emb = _clustered_data(0, n=800, b=8)
    exact = ShardedCatalogIndex(emb, mesh=None)
    ivf = IVFCatalogIndex(emb, nlist=16, nprobe=16, seed=0)
    es, ei = exact.topk(q, 10)
    as_, ai = ivf.topk(q, 10)
    np.testing.assert_array_equal(ai, ei)
    np.testing.assert_allclose(as_, es, atol=1e-5)


def test_more_probes_more_recall():
    q, emb = _clustered_data(0)
    _, ei = ShardedCatalogIndex(emb, mesh=None).topk(q, 10)

    def recall(nprobe):
        ivf = IVFCatalogIndex(emb, nlist=64, nprobe=nprobe, seed=0)
        _, ai = ivf.topk(q, 10)
        return np.mean([len(set(ei[r]) & set(ai[r])) / 10.0 for r in range(len(q))])

    assert recall(32) >= recall(2)


def test_candidate_mask():
    rng = np.random.default_rng(5)
    q, emb = _clustered_data(0, n=1000, b=8)
    mask = (rng.random(1000) < 0.3).astype(np.int32)
    ivf = IVFCatalogIndex(emb, nlist=16, nprobe=16, seed=0)  # full probe: exact
    s, i = ivf.topk(q, 10, candidate_mask=mask)
    assert all(mask[j] == 1 for j in i.ravel() if s.ravel()[list(i.ravel()).index(j)] > -1e29)
    exact = ShardedCatalogIndex(emb, mesh=None)
    es, ei = exact.topk(q, 10, candidate_mask=mask)
    np.testing.assert_array_equal(i, ei)


def test_every_row_lands_in_exactly_one_bucket():
    _, emb = _clustered_data(0, n=777, b=1)
    ivf = IVFCatalogIndex(emb, nlist=20, nprobe=4, seed=1)
    ids = np.asarray(ivf._bucket_ids)
    real = ids[ids >= 0]
    assert len(real) == 777
    assert len(np.unique(real)) == 777


def test_recommender_ann_integration(tmp_path_factory):
    from instacart_next_order_recommendation_tpu.serve import Recommender
    from tests.helpers import make_corpus, make_tiny_model_dir, write_corpus_json

    base = tmp_path_factory.mktemp("ann")
    corpus = make_corpus(60)
    model_dir = make_tiny_model_dir(base, corpus)
    corpus_path = write_corpus_json(base, corpus)
    rec = Recommender(
        model_dir=model_dir, corpus_path=corpus_path, ann=True, ann_nlist=8, ann_nprobe=8
    )
    results = rec.recommend("organic milk", top_k=5)
    assert len(results) == 5
    # full probe == exact: must match the brute-force recommender
    exact = Recommender(model_dir=model_dir, corpus_path=corpus_path)
    assert [p for p, _ in results] == [p for p, _ in exact.recommend("organic milk", top_k=5)]
    # filters work through the ANN path too
    filtered = rec.recommend("organic milk", top_k=5, filter_aisles=["a1"])
    assert all("Aisle: a1." in corpus[p] for p, _ in filtered)


def test_mesh_build_invariants_and_recall():
    """Mesh-sharded build: every row in exactly one bucket, recall bar holds."""
    from instacart_next_order_recommendation_tpu.parallel.mesh import (
        MeshConfig,
        build_mesh,
    )

    q, emb = _clustered_data(0)
    mesh = build_mesh(MeshConfig(data_parallel=8, model_parallel=1))
    # small build_chunk forces the multi-chunk scan path (4000/8 = 500 rows/shard)
    ivf = IVFCatalogIndex(emb, nlist=64, nprobe=16, seed=0, mesh=mesh, build_chunk=128)
    ids = np.asarray(ivf._bucket_ids)
    real = ids[ids >= 0]
    assert len(real) == len(emb)
    assert len(np.unique(real)) == len(emb)
    _, ei = ShardedCatalogIndex(emb, mesh=None).topk(q, 10)
    _, ai = ivf.topk(q, 10)
    overlap = np.mean([len(set(ei[r]) & set(ai[r])) / 10.0 for r in range(len(q))])
    assert overlap >= 0.9, overlap


def test_mesh_build_full_probe_is_exact():
    from instacart_next_order_recommendation_tpu.parallel.mesh import (
        MeshConfig,
        build_mesh,
    )

    q, emb = _clustered_data(0, n=800, b=8)
    mesh = build_mesh(MeshConfig(data_parallel=8, model_parallel=1))
    ivf = IVFCatalogIndex(emb, nlist=16, nprobe=16, seed=0, mesh=mesh, build_chunk=64)
    exact = ShardedCatalogIndex(emb, mesh=None)
    es, ei = exact.topk(q, 10)
    as_, ai = ivf.topk(q, 10)
    np.testing.assert_array_equal(ai, ei)
    np.testing.assert_allclose(as_, es, atol=1e-5)


def test_balanced_assign_respects_capacity_and_preference_order():
    from instacart_next_order_recommendation_tpu.index.ivf import _balanced_assign

    # 6 rows all prefer cluster 0 first, cluster 1 second; cap 2, nlist 4
    pref = np.tile(np.array([[0, 1, 2, 3]], np.int32), (6, 1))
    assign = _balanced_assign(pref, nlist=4, cap=2)
    counts = np.bincount(assign, minlength=4)
    assert counts.max() <= 2
    # first two rows won cluster 0, next two spilled to 1, next two to 2
    np.testing.assert_array_equal(assign, [0, 0, 1, 1, 2, 2])


def test_balanced_assign_leftovers_land_in_free_slots():
    from instacart_next_order_recommendation_tpu.index.ivf import _balanced_assign

    # every row's whole preference list is cluster 0 only; cap 1, nlist 4
    pref = np.zeros((4, 1), np.int32)
    assign = _balanced_assign(pref, nlist=4, cap=1)
    assert len(np.unique(assign)) == 4  # all rows placed, caps respected


def test_real_geometry_embeddings_wiring(tmp_path_factory):
    """`bench_ivf.py --real-geometry` helper: catalog = tower-encoded corpus,
    queries = tower-encoded eval queries from the adjacent eval_queries.json
    (falling back to a catalog slice when absent)."""
    import json

    from scripts.bench_ivf import real_geometry_embeddings
    from tests.helpers import make_corpus, make_tiny_model_dir, write_corpus_json

    base = tmp_path_factory.mktemp("realgeom")
    corpus = make_corpus(40)
    model_dir = make_tiny_model_dir(base, corpus)
    corpus_path = write_corpus_json(base, corpus)

    # No eval_queries.json yet: queries fall back to a strided catalog slice.
    catalog, queries = real_geometry_embeddings(str(model_dir), str(corpus_path))
    assert catalog.shape == (40, 32) and len(queries) > 0
    np.testing.assert_allclose(
        np.linalg.norm(catalog, axis=1), 1.0, atol=1e-3
    )  # tower output is L2-normalized

    (corpus_path.parent / "eval_queries.json").write_text(
        json.dumps({str(i): f"bought organic milk and bread {i}" for i in range(6)})
    )
    catalog2, queries2 = real_geometry_embeddings(str(model_dir), str(corpus_path))
    assert queries2.shape == (6, 32)
    np.testing.assert_allclose(catalog2, catalog, atol=1e-5)
    # The encoded geometry drives a working IVF index end-to-end.
    ivf = IVFCatalogIndex(catalog2, nlist=4, nprobe=4, kmeans_iters=2)
    _, ids = ivf.topk(queries2, 5)
    assert ids.shape == (6, 5)


def test_memmap_build_matches_in_ram(tmp_path):
    """A disk-memmapped embedding matrix must build an identical index to the
    in-RAM build (the streaming k-means/bucket-fill path only changes WHERE
    chunks are read from, not the math)."""
    q, emb = _clustered_data(7, n=2000)
    np.save(tmp_path / "emb.npy", emb)
    mm = np.load(tmp_path / "emb.npy", mmap_mode="r")

    ram = IVFCatalogIndex(emb, nlist=32, nprobe=8, seed=0)
    mapped = IVFCatalogIndex(mm, nlist=32, nprobe=8, seed=0)
    rs, ri = ram.topk(q, 10)
    ms, mi = mapped.topk(q, 10)
    np.testing.assert_array_equal(ri, mi)
    np.testing.assert_allclose(rs, ms, atol=1e-6)


def test_embedding_index_mmap_load(tmp_path):
    from instacart_next_order_recommendation_tpu.index import EmbeddingIndex

    corpus_path = tmp_path / "corpus.json"
    corpus_path.write_text("{}")
    idx = EmbeddingIndex(corpus_path, tmp_path / "model")
    ids = [str(i) for i in range(64)]
    emb = np.random.default_rng(0).standard_normal((64, 16)).astype(np.float32)
    idx.save(ids, emb)
    loaded = idx.load(ids, mmap=True)
    assert isinstance(loaded, np.memmap)
    np.testing.assert_allclose(np.asarray(loaded), emb)
