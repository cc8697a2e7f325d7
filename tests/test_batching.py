"""Micro-batching window tests: result parity, coalescing, error paths."""

import threading
import time

import numpy as np
import pytest

from instacart_next_order_recommendation_tpu.serve import Recommender
from instacart_next_order_recommendation_tpu.serve.batching import MicroBatcher

from tests.helpers import make_corpus, make_tiny_model_dir, write_corpus_json


@pytest.fixture(scope="module")
def rec(tmp_path_factory):
    base = tmp_path_factory.mktemp("batching")
    corpus = make_corpus(40)
    model_dir = make_tiny_model_dir(base, corpus)
    corpus_path = write_corpus_json(base, corpus)
    return Recommender(model_dir=model_dir, corpus_path=corpus_path)


class _TopkSpy:
    def __init__(self, index):
        self._index = index
        self.batch_sizes = []

    def topk(self, queries, k, candidate_mask=None):
        self.batch_sizes.append(np.asarray(queries).shape[0])
        return self._index.topk(queries, k, candidate_mask=candidate_mask)

    def __getattr__(self, name):
        return getattr(self._index, name)


def test_single_request_matches_direct(rec):
    batcher = MicroBatcher(rec, window_ms=1.0)
    direct = rec.recommend("organic milk", top_k=5)
    batched = batcher.recommend("organic milk", top_k=5)
    assert batched == direct
    m = batcher.last_metrics
    assert m is not None and m.num_recommendations == 5


def test_concurrent_requests_coalesce(rec):
    spy = _TopkSpy(rec.index)
    batcher = MicroBatcher(rec, window_ms=60.0)
    batcher._rec = _RecView(rec, spy)
    # Put the batcher in its loaded regime (the adaptive fast path skips the
    # window after single-query drains; sustained concurrency re-engages it).
    batcher._last_drain = 2
    batcher._last_drain_t = time.time()  # recent: stale drains decay

    queries = [f"organic milk {i % 4}" for i in range(8)]
    results: dict[int, list] = {}

    def worker(i):
        results[i] = batcher.recommend(queries[i], top_k=3)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
        time.sleep(0.002)  # all land inside the 60 ms window
    for t in threads:
        t.join()

    for i in range(8):
        direct = rec.recommend(queries[i], top_k=3)
        assert [p for p, _ in results[i]] == [p for p, _ in direct], i
        # scores match up to batched-matmul reduction-order noise
        np.testing.assert_allclose(
            [s for _, s in results[i]], [s for _, s in direct], atol=1e-5
        )
    # at least one coalesced multi-row dispatch happened
    assert max(spy.batch_sizes) > 1


class _RecView:
    """Recommender facade with a spied index (keeps the real encoder/corpus)."""

    def __init__(self, rec, index):
        self._inner = rec
        self.index = index

    def __getattr__(self, name):
        return getattr(self._inner, name)


def test_per_request_exclusions_in_one_batch(rec):
    batcher = MicroBatcher(rec, window_ms=50.0)
    base = rec.recommend("organic milk", top_k=5)
    excl = {base[0][0]}
    out: dict[str, list] = {}

    def plain():
        out["plain"] = batcher.recommend("organic milk", top_k=5)

    def excluded():
        out["excl"] = batcher.recommend(
            "organic milk", top_k=5, exclude_product_ids=excl
        )

    t1, t2 = threading.Thread(target=plain), threading.Thread(target=excluded)
    t1.start(); time.sleep(0.002); t2.start()
    t1.join(); t2.join()
    assert [p for p, _ in out["plain"]] == [p for p, _ in base]
    assert all(pid not in excl for pid, _ in out["excl"])
    direct_excl = rec.recommend("organic milk", top_k=5, exclude_product_ids=excl)
    assert [p for p, _ in out["excl"]] == [p for p, _ in direct_excl]


def test_filtered_requests_bypass_batching(rec):
    batcher = MicroBatcher(rec, window_ms=1.0)
    direct = rec.recommend("milk", top_k=5, filter_aisles=["a1"])
    assert batcher.recommend("milk", top_k=5, filter_aisles=["a1"]) == direct


def test_error_propagates_to_all_waiters(rec):
    class BoomEncoder:
        def encode_device(self, *a, **kw):
            raise RuntimeError("boom")

    class Boom:
        product_ids = rec.product_ids
        encoder = BoomEncoder()

        def __getattr__(self, name):
            return getattr(rec, name)

    batcher = MicroBatcher(Boom(), window_ms=30.0)
    errors = []

    def worker():
        try:
            batcher.recommend("milk", top_k=3)
        except RuntimeError as exc:
            errors.append(str(exc))

    threads = [threading.Thread(target=worker) for _ in range(3)]
    for t in threads:
        t.start()
        time.sleep(0.002)
    for t in threads:
        t.join()
    assert errors == ["boom"] * 3


def test_app_wraps_when_env_set(tmp_path, monkeypatch):
    from instacart_next_order_recommendation_tpu.api.app import create_app
    from instacart_next_order_recommendation_tpu.api.http import TestClient
    from tests.test_api import make_mock_recommender

    monkeypatch.setenv("FEEDBACK_DB_PATH", str(tmp_path / "fb.db"))
    monkeypatch.setenv("BATCH_WINDOW_MS", "2")
    app = create_app(
        model_dir=tmp_path,
        corpus_path=tmp_path / "c.json",
        recommender_factory=make_mock_recommender,
    )
    with TestClient(app) as c:
        assert isinstance(app.state["recommender"], MicroBatcher)
        r = c.post("/recommend", json={"user_context": "x", "top_k": 2})
        assert r.status_code == 200
        assert len(r.json()["recommendations"]) == 2


class _ShapeSpy:
    """Index facade recording the (batch, k) shapes topk is called with."""

    def __init__(self, index):
        self._index = index
        self.calls = []

    def topk(self, queries, k, candidate_mask=None):
        self.calls.append((np.asarray(queries).shape[0], k))
        return self._index.topk(queries, k, candidate_mask=candidate_mask)

    def __getattr__(self, name):
        return getattr(self._index, name)


def test_batched_dispatch_uses_bucketed_shapes(rec):
    """The coalesced top-k must run at the PADDED batch bucket and a k from
    the serve lattice — raw sizes would compile one program per concurrency
    level / per distinct top_k+|excluded|."""
    spy = _ShapeSpy(rec.index)
    batcher = MicroBatcher(rec, window_ms=60.0)
    batcher._rec = _RecView(rec, spy)

    def worker(i):
        batcher.recommend(f"organic milk {i}", top_k=3)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
        time.sleep(0.002)
    for t in threads:
        t.join()

    from instacart_next_order_recommendation_tpu.serve.precompile import (
        BATCH_BUCKETS,
        K_BUCKETS,
    )

    assert spy.calls, "no batched dispatch happened"
    for b, k in spy.calls:
        assert b in BATCH_BUCKETS, f"unbucketed batch size {b}"
        assert k in K_BUCKETS, f"unbucketed k {k}"


def test_direct_path_metrics_not_stale(tmp_path):
    """Filtered requests bypass batching; last_metrics must reflect THAT
    request (the property shadows __getattr__ delegation, so the wrapped
    recommender's metrics have to be mirrored into thread-local state)."""
    from instacart_next_order_recommendation_tpu.serve import MonitoredRecommender

    corpus = make_corpus(40)
    model_dir = make_tiny_model_dir(tmp_path, corpus)
    corpus_path = write_corpus_json(tmp_path, corpus)
    mon = MonitoredRecommender(model_dir=model_dir, corpus_path=corpus_path)
    batcher = MicroBatcher(mon, window_ms=1.0)

    batcher.recommend("organic milk", top_k=5)
    assert batcher.last_metrics.num_recommendations == 5

    batcher.recommend("milk", top_k=2, user_id="u7", filter_aisles=["a1"])
    m = batcher.last_metrics
    assert m is not None and m.user_id == "u7"
    assert m.num_recommendations <= 2


def test_monitored_recommender_buckets_k(tmp_path):
    """MonitoredRecommender must fetch a lattice k (top_k=10 -> 16), not the
    raw top_k+|excluded| — unbucketed k compiles per request shape."""
    from instacart_next_order_recommendation_tpu.serve import MonitoredRecommender

    corpus = make_corpus(40)
    model_dir = make_tiny_model_dir(tmp_path, corpus)
    corpus_path = write_corpus_json(tmp_path, corpus)
    mon = MonitoredRecommender(model_dir=model_dir, corpus_path=corpus_path)
    spy = _ShapeSpy(mon.index)
    mon.index = spy

    out = mon.recommend("organic milk", top_k=10, exclude_product_ids={"1", "2"})
    assert len(out) == 10
    assert all(pid not in {"1", "2"} for pid, _ in out)
    (b, k), = spy.calls
    assert k == 16  # 12 -> next K_BUCKETS entry


def test_lone_query_skips_window(rec):
    """Idle traffic: a lone query must dispatch immediately, not pay the
    coalescing window (the adaptive fast path after single-query drains)."""
    batcher = MicroBatcher(rec, window_ms=400.0)
    batcher.recommend("organic milk", top_k=3)  # first drain: size 1
    t0 = time.time()
    out = batcher.recommend("organic bread", top_k=3)
    elapsed = time.time() - t0
    assert out == rec.recommend("organic bread", top_k=3)
    assert elapsed < 0.2, f"lone query paid the window: {elapsed*1e3:.0f} ms"


def test_lone_query_after_idle_gap_skips_window(rec):
    """A burst followed by idleness must not charge the next lone query a
    window: the last-drain-coalesced signal decays by time (~1 s), exactly
    like the overlap signal."""
    batcher = MicroBatcher(rec, window_ms=400.0)
    batcher._last_drain = 8  # a burst coalesced...
    batcher._last_drain_t = time.time() - 5.0  # ...but 5 s ago (idle since)
    t0 = time.time()
    out = batcher.recommend("organic bread", top_k=3)
    elapsed = time.time() - t0
    assert out == rec.recommend("organic bread", top_k=3)
    assert elapsed < 0.2, f"stale drain signal charged the window: {elapsed*1e3:.0f} ms"


def test_window_reengages_under_concurrency(rec):
    """After a coalesced drain the window stays on: bursts keep batching."""
    spy = _TopkSpy(rec.index)
    batcher = MicroBatcher(rec, window_ms=60.0)
    batcher._rec = _RecView(rec, spy)
    batcher._last_drain = 2
    batcher._last_drain_t = time.time()  # recent drain: stale ones decay (see below)

    def burst(n):
        threads = [
            threading.Thread(
                target=batcher.recommend, args=(f"milk {i}",), kwargs={"top_k": 3}
            )
            for i in range(n)
        ]
        for t in threads:
            t.start()
            time.sleep(0.002)
        for t in threads:
            t.join()

    burst(6)
    sizes_first = list(spy.batch_sizes)
    assert max(sizes_first) > 1
    burst(6)  # the re-engaged window coalesces the second burst too
    assert max(spy.batch_sizes[len(sizes_first):]) > 1


def test_batching_under_sustained_concurrency_exact(rec):
    """Adversarial: many threads, several waves, no stagger — every result
    must equal the direct path and no request may hang or error."""
    from concurrent.futures import ThreadPoolExecutor

    batcher = MicroBatcher(rec, window_ms=5.0)
    queries = [f"organic milk {i % 7}" for i in range(48)]
    direct = {q: rec.recommend(q, top_k=4) for q in set(queries)}

    with ThreadPoolExecutor(16) as ex:
        results = list(ex.map(lambda q: (q, batcher.recommend(q, top_k=4)), queries))
    for q, got in results:
        assert [p for p, _ in got] == [p for p, _ in direct[q]]
        np.testing.assert_allclose(
            [s for _, s in got], [s for _, s in direct[q]], atol=1e-5
        )


def test_steady_load_reengages_window_without_preseed(rec):
    """Regression: steady overlapping load from independent threads must
    coalesce WITHOUT pre-seeding internal state. (A drain-size-only
    heuristic latches into permanent batch-1 dispatches: each arrival finds
    an empty queue, elects itself leader, and drains alone. The overlap
    detector — an arrival while another request is in flight — must
    re-engage the window.)"""
    spy = _TopkSpy(rec.index)
    batcher = MicroBatcher(rec, window_ms=40.0)
    batcher._rec = _RecView(rec, spy)

    stop = time.time() + 3.0

    def client(i):
        while time.time() < stop:
            batcher.recommend(f"organic milk {i}", top_k=3)
            time.sleep(0.001)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert max(spy.batch_sizes) > 1, spy.batch_sizes[:20]


def test_decision_counters_account_for_every_leader(rec):
    """Observability invariant: every leader election records exactly one
    window decision and exactly one drain — windowed+immediate must equal
    the number of drains, under concurrency."""
    from concurrent.futures import ThreadPoolExecutor

    batcher = MicroBatcher(rec, window_ms=5.0)
    with ThreadPoolExecutor(8) as ex:
        list(ex.map(lambda i: batcher.recommend(f"milk {i % 3}", top_k=3), range(40)))
    decisions = batcher.decision_counts["windowed"] + batcher.decision_counts["immediate"]
    drains = sum(batcher.drain_sizes.values())
    assert decisions == drains > 0
    assert sum(size * n for size, n in batcher.drain_sizes.items()) == 40


def test_fused_drain_single_dispatch_matches_direct(rec):
    """On dp=1 (fused pipeline active) the batcher serves LONE drains
    through ONE fused dispatch with calibrated stage stats; multi-request
    drains keep the two-dispatch path (their extra RTT amortizes and the
    fused (b, s, k) program lattice is multiplicative). Both must match the
    direct monitored path."""
    from instacart_next_order_recommendation_tpu.parallel import MeshConfig, build_mesh
    from instacart_next_order_recommendation_tpu.serve import MonitoredRecommender

    mesh = build_mesh(MeshConfig(data_parallel=1, model_parallel=1))
    frec = MonitoredRecommender(
        model_dir=rec.model_dir, corpus_path=rec.corpus_path, mesh=mesh
    )
    assert frec._fused is not None
    batcher = MicroBatcher(frec, window_ms=40.0)

    # Lone drain (immediate fast path): fused single dispatch + calibration.
    lone = batcher.recommend("organic milk", top_k=3)
    m_lone = batcher.last_metrics
    assert frec._stage_cal._cache, "lone drain did not use the fused path"
    assert m_lone is not None and m_lone.query_embedding_time_ms > 0
    direct = frec.recommend("organic milk", top_k=3)
    assert [p for p, _ in lone] == [p for p, _ in direct]

    # Coalesced burst: two-dispatch path, identical results per request.
    batcher._last_drain = 2
    batcher._last_drain_t = time.time()
    queries = [f"organic milk {i % 4}" for i in range(6)]
    results: dict[int, list] = {}
    metrics: dict[int, object] = {}

    def worker(i):
        results[i] = batcher.recommend(queries[i], top_k=3)
        metrics[i] = batcher.last_metrics

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    for i, q in enumerate(queries):
        direct = frec.recommend(q, top_k=3)
        assert [p for p, _ in results[i]] == [p for p, _ in direct]
        np.testing.assert_allclose(
            [s for _, s in results[i]], [s for _, s in direct], atol=1e-5
        )
        m = metrics[i]
        assert m is not None and m.query_embedding_time_ms > 0
        assert m.similarity_compute_time_ms > 0
