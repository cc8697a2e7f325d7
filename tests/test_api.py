"""API tests — coverage mirrors the reference suite
(/root/reference/tests/test_api.py): probes, /recommend happy path and error
cases, API-key auth, /feedback single/batch, /admin/corpus, /metrics, plus
rate limiting and a real-socket smoke test of the stdlib server."""

import threading
import time
from types import SimpleNamespace

import pytest

from instacart_next_order_recommendation_tpu.api.app import create_app
from instacart_next_order_recommendation_tpu.api.http import TestClient, serve
from instacart_next_order_recommendation_tpu.serve import RecommendationMetrics


def make_mock_recommender(**kwargs):
    rec = SimpleNamespace()
    rec.corpus_path = kwargs.get("corpus_path", "/tmp/mock_corpus.json")
    rec.pid_to_text = {
        "101": "Product: Organic Milk. Aisle: milk. Department: dairy eggs.",
        "102": "Product: Whole Wheat Bread. Aisle: bread. Department: bakery.",
        "103": "Product: Banana. Aisle: fresh fruits. Department: produce.",
    }
    rec.last_metrics = RecommendationMetrics(
        user_id="anonymous",
        query_embedding_time_ms=5.0,
        similarity_compute_time_ms=1.0,
        total_latency_ms=7.0,
        num_recommendations=3,
        top_score=0.9,
        avg_score=0.8,
        timestamp=time.time(),
    )
    rec.calls = []

    def recommend(
        query,
        top_k=10,
        user_id=None,
        exclude_product_ids=None,
        filter_aisles=None,
        filter_departments=None,
    ):
        rec.calls.append(
            {
                "query": query,
                "top_k": top_k,
                "user_id": user_id,
                "exclude_product_ids": exclude_product_ids,
                "filter_aisles": filter_aisles,
                "filter_departments": filter_departments,
            }
        )
        results = [("101", 0.9), ("102", 0.8), ("103", 0.7)]
        excluded = exclude_product_ids or set()
        return [(p, s) for p, s in results if p not in excluded][:top_k]

    rec.recommend = recommend
    return rec


@pytest.fixture()
def client(tmp_path, monkeypatch):
    monkeypatch.setenv("FEEDBACK_DB_PATH", str(tmp_path / "feedback.db"))
    monkeypatch.delenv("API_KEY", raising=False)
    app = create_app(
        model_dir=tmp_path, corpus_path=tmp_path / "c.json", recommender_factory=make_mock_recommender
    )
    with TestClient(app) as c:
        yield c


class TestProbes:
    def test_health(self, client):
        r = client.get("/health")
        assert r.status_code == 200
        assert r.json() == {"status": "ok"}

    def test_ready(self, client):
        r = client.get("/ready")
        assert r.status_code == 200
        assert r.json() == {"status": "ready"}

    def test_request_id_propagation(self, client):
        r = client.get("/health", headers={"X-Request-ID": "rid-123"})
        assert r.headers["X-Request-ID"] == "rid-123"

    def test_request_id_generated(self, client):
        r = client.get("/health")
        assert len(r.headers["X-Request-ID"]) > 10


class TestRecommend:
    def test_happy_path_user_context(self, client):
        r = client.post(
            "/recommend", json={"user_context": "[+7d w4h14] Organic Milk.", "top_k": 3}
        )
        assert r.status_code == 200
        body = r.json()
        assert len(body["recommendations"]) == 3
        assert body["recommendations"][0]["product_id"] == "101"
        assert body["recommendations"][0]["product_text"].startswith("Product: Organic Milk")
        assert body["purchase_history_used"] == "[+7d w4h14] Organic Milk."
        assert body["request_id"]
        assert body["stats"]["num_recommendations"] == 3

    def test_query_prepended_to_context(self, client):
        client.post(
            "/recommend", json={"query": "milk", "user_context": "CTX", "top_k": 1}
        )
        rec = client.app.state["recommender"]
        assert rec.calls[-1]["query"] == "milk CTX"

    def test_400_without_context(self, client):
        r = client.post("/recommend", json={"top_k": 5})
        assert r.status_code == 400

    def test_422_topk_out_of_range(self, client):
        r = client.post("/recommend", json={"user_context": "x", "top_k": 101})
        assert r.status_code == 422
        r = client.post("/recommend", json={"user_context": "x", "top_k": 0})
        assert r.status_code == 422

    def test_exclude_ids_passthrough(self, client):
        r = client.post(
            "/recommend",
            json={"user_context": "x", "top_k": 5, "exclude_product_ids": ["101"]},
        )
        assert r.status_code == 200
        pids = [it["product_id"] for it in r.json()["recommendations"]]
        assert "101" not in pids
        rec = client.app.state["recommender"]
        assert rec.calls[-1]["exclude_product_ids"] == {"101"}

    def test_category_filters_passthrough(self, client):
        r = client.post(
            "/recommend",
            json={
                "user_context": "x",
                "top_k": 5,
                "filter_aisles": ["milk"],
                "filter_departments": ["dairy eggs"],
            },
        )
        assert r.status_code == 200
        rec = client.app.state["recommender"]
        assert rec.calls[-1]["filter_aisles"] == ["milk"]
        assert rec.calls[-1]["filter_departments"] == ["dairy eggs"]

    def test_no_filters_means_no_filter_kwargs(self, client):
        r = client.post("/recommend", json={"user_context": "x", "top_k": 3})
        assert r.status_code == 200
        rec = client.app.state["recommender"]
        assert rec.calls[-1]["filter_aisles"] is None
        assert rec.calls[-1]["filter_departments"] is None

    def test_user_id_lookup_from_eval_queries(self, client, tmp_path):
        import json as json_mod

        corpus_path = tmp_path / "c.json"
        corpus_path.write_text("{}")
        (tmp_path / "eval_queries.json").write_text(json_mod.dumps({"42": "stored ctx"}))
        client.app.state["corpus_path"] = corpus_path
        r = client.post("/recommend", json={"user_id": "42"})
        assert r.status_code == 200
        assert r.json()["purchase_history_used"] == "stored ctx"


class TestAuth:
    def test_401_when_key_required(self, client, monkeypatch):
        monkeypatch.setenv("API_KEY", "sekret")
        r = client.post("/recommend", json={"user_context": "x"})
        assert r.status_code == 401

    def test_200_with_x_api_key(self, client, monkeypatch):
        monkeypatch.setenv("API_KEY", "sekret")
        r = client.post(
            "/recommend", json={"user_context": "x"}, headers={"X-API-Key": "sekret"}
        )
        assert r.status_code == 200

    def test_200_with_bearer(self, client, monkeypatch):
        monkeypatch.setenv("API_KEY", "sekret")
        r = client.post(
            "/recommend",
            json={"user_context": "x"},
            headers={"Authorization": "Bearer sekret"},
        )
        assert r.status_code == 200

    def test_401_wrong_key(self, client, monkeypatch):
        monkeypatch.setenv("API_KEY", "sekret")
        r = client.post(
            "/recommend", json={"user_context": "x"}, headers={"X-API-Key": "nope"}
        )
        assert r.status_code == 401

    def test_probes_unauthenticated(self, client, monkeypatch):
        monkeypatch.setenv("API_KEY", "sekret")
        assert client.get("/health").status_code == 200
        assert client.get("/ready").status_code == 200


class TestFeedback:
    def test_single_event_202(self, client):
        r = client.post(
            "/feedback",
            json={"request_id": "r1", "event_type": "click", "product_id": "101"},
        )
        assert r.status_code == 202
        assert r.json() == {"status": "accepted", "count": 1}

    def test_batch_202(self, client):
        events = [
            {"request_id": "r1", "event_type": "impression", "product_id": str(p)}
            for p in (101, 102)
        ] + [{"request_id": "r1", "event_type": "purchase", "product_id": "101"}]
        r = client.post("/feedback", json={"events": events})
        assert r.status_code == 202
        assert r.json()["count"] == 3

    def test_empty_batch_400(self, client):
        r = client.post("/feedback", json={"events": []})
        assert r.status_code == 400

    def test_invalid_event_type_422(self, client):
        r = client.post(
            "/feedback",
            json={"request_id": "r1", "event_type": "explode", "product_id": "101"},
        )
        assert r.status_code == 422

    def test_events_persisted_to_sqlite(self, client, tmp_path):
        import sqlite3

        client.post(
            "/feedback",
            json={"request_id": "rX", "event_type": "purchase", "product_id": "9"},
        )
        conn = sqlite3.connect(tmp_path / "feedback.db")
        rows = conn.execute(
            "SELECT request_id, event_type, product_id FROM feedback_events"
        ).fetchall()
        conn.close()
        assert ("rX", "purchase", "9") in rows


class TestCorpusUpload:
    def test_upload_200_and_swap(self, client):
        r = client.post("/admin/corpus", json={"corpus": {"1": "Product: A.", "2": "Product: B."}})
        assert r.status_code == 200
        assert r.json() == {"status": "ok", "n_products": 2}
        assert str(client.app.state["corpus_path"]).endswith(".json")

    def test_empty_corpus_422(self, client):
        r = client.post("/admin/corpus", json={"corpus": {}})
        assert r.status_code == 422

    def test_oversized_corpus_400(self, client, monkeypatch):
        monkeypatch.setenv("MAX_CORPUS_UPLOAD_PRODUCTS", "1")
        r = client.post("/admin/corpus", json={"corpus": {"1": "a", "2": "b"}})
        assert r.status_code == 400

    def test_auth_required_when_enabled(self, client, monkeypatch):
        monkeypatch.setenv("API_KEY", "sekret")
        r = client.post("/admin/corpus", json={"corpus": {"1": "a"}})
        assert r.status_code == 401


class TestMetricsEndpoint:
    def test_metric_names_exported(self, client):
        client.post("/recommend", json={"user_context": "x"})
        client.post(
            "/feedback",
            json={"request_id": "r", "event_type": "click", "product_id": "1"},
        )
        r = client.get("/metrics")
        assert r.status_code == 200
        text = r.body_bytes().decode()
        assert "recommendation_requests_total" in text
        assert "feedback_events_total" in text
        assert "recommendation_latency_seconds" in text
        assert "model_loaded 1.0" in text

    def test_error_counted(self, client):
        before = client.get("/metrics").body_bytes().decode()
        client.post("/recommend", json={"top_k": 5})  # 400
        after = client.get("/metrics").body_bytes().decode()
        assert 'recommendation_requests_total{status="error"}' in after


class TestShutdownFlush:
    def test_shutdown_drains_request_context_writer(self, tmp_path, monkeypatch):
        """Graceful shutdown commits queued request contexts BEFORE teardown:
        rows enqueued by the async writer must be readable right after the
        app context exits, without the reader calling the flush barrier
        (regression: the r5 dryrun hit 'disk I/O error' when the writer
        drained after the app's DB dir was deleted)."""
        import sqlite3

        db = tmp_path / "f.db"
        monkeypatch.setenv("FEEDBACK_DB_PATH", str(db))
        app = create_app(
            model_dir=tmp_path,
            corpus_path=tmp_path / "c.json",
            recommender_factory=make_mock_recommender,
        )
        with TestClient(app) as c:
            r = c.post("/recommend", json={"user_context": "milk and bread"})
            assert r.status_code == 200
        conn = sqlite3.connect(db)
        try:
            n = conn.execute("SELECT COUNT(*) FROM request_contexts").fetchone()[0]
        finally:
            conn.close()
        assert n == 1


class TestRateLimit:
    def test_429_after_limit(self, tmp_path, monkeypatch):
        monkeypatch.setenv("FEEDBACK_DB_PATH", str(tmp_path / "f.db"))
        app = create_app(
            model_dir=tmp_path,
            corpus_path=tmp_path / "c.json",
            recommender_factory=make_mock_recommender,
            rate_limit="3/minute",
        )
        with TestClient(app) as c:
            for _ in range(3):
                assert c.post("/recommend", json={"user_context": "x"}).status_code == 200
            assert c.post("/recommend", json={"user_context": "x"}).status_code == 429
            # probes exempt
            assert c.get("/health").status_code == 200


class TestRealSocketServer:
    def test_serve_over_http(self, tmp_path, monkeypatch):
        httpx = pytest.importorskip("httpx")
        monkeypatch.setenv("FEEDBACK_DB_PATH", str(tmp_path / "f.db"))
        app = create_app(
            model_dir=tmp_path,
            corpus_path=tmp_path / "c.json",
            recommender_factory=make_mock_recommender,
        )
        port = 8765
        t = threading.Thread(target=serve, args=(app, "127.0.0.1", port), daemon=True)
        t.start()
        deadline = time.time() + 10
        last_err = None
        while time.time() < deadline:
            try:
                r = httpx.get(f"http://127.0.0.1:{port}/health", timeout=2)
                break
            except Exception as exc:  # noqa: BLE001
                last_err = exc
                time.sleep(0.1)
        else:
            raise AssertionError(f"server did not come up: {last_err}")
        assert r.status_code == 200
        r2 = httpx.post(
            f"http://127.0.0.1:{port}/recommend",
            json={"user_context": "milk", "top_k": 2},
            timeout=5,
        )
        assert r2.status_code == 200
        assert len(r2.json()["recommendations"]) == 2


class TestHttpFramework:
    def test_404_unknown_path(self, client):
        assert client.get("/nope").status_code == 404

    def test_405_wrong_method(self, client):
        assert client.get("/recommend").status_code == 405

    def test_invalid_json_422(self, client):
        from instacart_next_order_recommendation_tpu.api.http import Request

        req = Request("POST", "/feedback", {"content-type": "application/json"}, b"{not json")
        resp = client.app.handle(req)
        assert resp.status_code == 422

    def test_empty_body_422(self, client):
        from instacart_next_order_recommendation_tpu.api.http import Request

        resp = client.app.handle(Request("POST", "/recommend", {}, b""))
        assert resp.status_code == 422

    def test_unhandled_error_500(self, client):
        @client.app.post("/boom")
        def boom(request):
            raise RuntimeError("kaboom")

        resp = client.post("/boom", json={})
        assert resp.status_code == 500
        assert resp.json() == {"detail": "Internal Server Error"}


class TestConcurrency:
    def test_concurrent_requests_thread_safe(self, client):
        from concurrent.futures import ThreadPoolExecutor

        def hit(i):
            if i % 3 == 0:
                return client.post(
                    "/feedback",
                    json={"request_id": f"r{i}", "event_type": "click", "product_id": "1"},
                ).status_code
            return client.post(
                "/recommend", json={"user_context": f"ctx {i}", "top_k": 2}
            ).status_code

        with ThreadPoolExecutor(8) as ex:
            codes = list(ex.map(hit, range(60)))
        assert all(c in (200, 202) for c in codes)


class TestAdminModel:
    def test_model_swap_200(self, client, tmp_path):
        new_model = tmp_path / "run" / "final"
        new_model.mkdir(parents=True)
        (tmp_path / "run" / "best.json").write_text(
            '{"best_epoch": 2, "metric": "ndcg_at_10", "entry": {"ndcg_at_10": 0.3}}'
        )
        r = client.post("/admin/model", json={"model_dir": str(new_model)})
        assert r.status_code == 200
        body = r.json()
        assert body["status"] == "ok"
        assert body["model_dir"] == str(new_model)
        assert body["best"]["entry"]["ndcg_at_10"] == 0.3
        assert str(client.app.state["model_dir"]) == str(new_model)

    def test_model_swap_missing_dir_400(self, client, tmp_path):
        r = client.post("/admin/model", json={"model_dir": str(tmp_path / "nope")})
        assert r.status_code == 400

    def test_model_swap_empty_422(self, client):
        r = client.post("/admin/model", json={"model_dir": ""})
        assert r.status_code == 422

    def test_model_swap_requires_api_key(self, client, tmp_path, monkeypatch):
        monkeypatch.setenv("API_KEY", "sek")
        new_model = tmp_path / "m"
        new_model.mkdir()
        r = client.post("/admin/model", json={"model_dir": str(new_model)})
        assert r.status_code == 401
        r = client.post(
            "/admin/model",
            json={"model_dir": str(new_model)},
            headers={"X-API-Key": "sek"},
        )
        assert r.status_code == 200

    def test_failed_load_keeps_old_model(self, client, tmp_path):
        old = client.app.state["recommender"]

        def broken_factory(**kwargs):
            raise RuntimeError("bad checkpoint")

        client.app.state["recommender_factory"] = broken_factory
        new_model = tmp_path / "m2"
        new_model.mkdir()
        r = client.post("/admin/model", json={"model_dir": str(new_model)})
        assert r.status_code == 500
        assert client.app.state["recommender"] is old
