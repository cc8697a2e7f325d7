"""Feedback-weighted retrain dataset tests."""

import json

from instacart_next_order_recommendation_tpu.api.feedback_store import (
    FeedbackEventRecord,
    init_db,
    record_events,
)
from scripts.feedback_retrain import build_weighted_pairs, extract_context_events


def test_weighted_pairs_repetition():
    corpus = {"1": "Product: A.", "2": "Product: B."}
    events = [
        ("purchase", "ctx-a", "1"),
        ("click", "ctx-b", "2"),
        ("impression", "ctx-c", "1"),  # weight 0 -> dropped
        ("purchase", "ctx-d", "99"),  # unknown product -> dropped
    ]
    anchors, positives = build_weighted_pairs(events, corpus)
    assert anchors.count("ctx-a") == 3  # purchase weight
    assert anchors.count("ctx-b") == 1  # click weight
    assert "ctx-c" not in anchors
    assert "ctx-d" not in anchors
    assert len(anchors) == len(positives) == 4


def test_extract_context_events_from_db(tmp_path, monkeypatch):
    monkeypatch.setenv("FEEDBACK_DB_PATH", str(tmp_path / "f.db"))
    db = init_db()
    record_events(
        [
            FeedbackEventRecord(
                "r1", "purchase", "7", metadata={"user_context": "[+1d w0h9] Milk."}
            ),
            FeedbackEventRecord("r1", "click", "8", metadata={"other": "x"}),
            FeedbackEventRecord("r2", "purchase", "9"),  # no metadata
        ]
    )
    events = extract_context_events(db)
    assert events == [("purchase", "[+1d w0h9] Milk.", "7")]
