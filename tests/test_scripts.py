"""Ops-script tests: feedback analytics aggregation and funnel generation."""

from datetime import datetime

from instacart_next_order_recommendation_tpu.api.feedback_store import (
    FeedbackEventRecord,
    init_db,
    record_events,
)
from scripts.feedback_analytics import (
    compute_aggregate_metrics,
    compute_funnel_per_request,
    load_events,
)
from scripts.generate_sample_feedback import build_funnel_events


class TestFeedbackAnalytics:
    def test_aggregate_metrics_unique_pairs(self):
        events = [
            ("r1", "impression", "p1", None, "t"),
            ("r1", "impression", "p1", None, "t"),  # duplicate -> counted once
            ("r1", "impression", "p2", None, "t"),
            ("r1", "click", "p1", None, "t"),
            ("r1", "add_to_cart", "p1", None, "t"),
            ("r1", "purchase", "p1", None, "t"),
        ]
        m = compute_aggregate_metrics(events)
        assert m["impression_count"] == 2
        assert m["ctr"] == 0.5
        assert m["add_to_cart_rate"] == 0.5
        assert m["purchase_rate"] == 0.5

    def test_no_impressions_zero_rates(self):
        m = compute_aggregate_metrics([("r1", "click", "p1", None, "t")])
        assert m["ctr"] == 0.0

    def test_funnel_per_request(self):
        events = [
            ("r1", "impression", "p1", None, "t"),
            ("r1", "click", "p1", None, "t"),
            ("r2", "impression", "p2", None, "t"),
            (None, "impression", "p3", None, "t"),  # no request_id -> excluded
        ]
        funnel = compute_funnel_per_request(events)
        assert set(funnel.keys()) == {"r1", "r2"}
        assert funnel["r1"]["click"] == {"p1"}

    def test_load_events_roundtrip_and_since(self, tmp_path, monkeypatch):
        monkeypatch.setenv("FEEDBACK_DB_PATH", str(tmp_path / "f.db"))
        db = init_db()
        record_events(
            [
                FeedbackEventRecord(
                    "r1", "click", "p1", created_at=datetime(2026, 1, 1, 10, 0)
                ),
                FeedbackEventRecord(
                    "r2", "purchase", "p2", created_at=datetime(2026, 6, 1, 10, 0)
                ),
            ]
        )
        all_events = load_events(db)
        assert len(all_events) == 2
        recent = load_events(db, since="2026-03-01")
        assert len(recent) == 1
        assert recent[0][1] == "purchase"


class TestSampleFeedbackGenerator:
    def test_funnel_events_monotone(self):
        import random

        rng = random.Random(0)
        events = build_funnel_events(
            "rid", [str(i) for i in range(200)], rng, click_rate=0.5, atc_rate=0.5, purchase_rate=0.5
        )
        by_type = {}
        for e in events:
            by_type.setdefault(e["event_type"], set()).add(e["product_id"])
        assert len(by_type["impression"]) == 200
        # funnel containment: purchase ⊆ add_to_cart ⊆ click ⊆ impression
        assert by_type["purchase"] <= by_type["add_to_cart"]
        assert by_type["add_to_cart"] <= by_type["click"]
        assert by_type["click"] <= by_type["impression"]
