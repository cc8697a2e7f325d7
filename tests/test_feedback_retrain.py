"""Feedback-weighted retrain dataset + scheduled-retrain tests."""

import json
from pathlib import Path

from instacart_next_order_recommendation_tpu.api.feedback_store import (
    FeedbackEventRecord,
    init_db,
    load_context_events,
    record_events,
    record_request_context,
)
from scripts.feedback_retrain import (
    build_weighted_pairs,
    count_new_events,
    extract_context_events,
    load_scheduler_state,
    retrain_once,
)


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


def test_server_side_context_join(tmp_path, monkeypatch):
    monkeypatch.setenv("FEEDBACK_DB_PATH", str(tmp_path / "f.db"))
    db = init_db()
    record_request_context("req-1", "[+2d w3h10] Bread, Milk.", user_id="u7")
    record_events(
        [
            FeedbackEventRecord("req-1", "purchase", "5"),  # joins via request_id
            FeedbackEventRecord("req-2", "click", "6"),  # no stored context
        ]
    )
    assert load_context_events(db) == [("purchase", "[+2d w3h10] Bread, Milk.", "5")]
    # metadata fallback applies only to events without a stored context;
    # events whose request has one never double-count via echoed metadata
    record_events(
        [
            FeedbackEventRecord(
                "req-1", "add_to_cart", "5", metadata={"user_context": "echoed"}
            ),
            FeedbackEventRecord(
                "req-9", "click", "6", metadata={"user_context": "client ctx"}
            ),
        ]
    )
    events = extract_context_events(db)
    assert ("add_to_cart", "[+2d w3h10] Bread, Milk.", "5") in events  # server wins
    assert ("add_to_cart", "echoed", "5") not in events
    assert ("click", "client ctx", "6") in events  # fallback for unknown request
    assert len(events) == 3


def test_context_store_opt_out(tmp_path, monkeypatch):
    monkeypatch.setenv("FEEDBACK_DB_PATH", str(tmp_path / "f.db"))
    monkeypatch.setenv("STORE_REQUEST_CONTEXTS", "0")
    db = init_db()
    record_request_context("req-1", "ctx")
    record_events([FeedbackEventRecord("req-1", "purchase", "5")])
    assert load_context_events(db) == []


def test_recommend_route_persists_context(tmp_path, monkeypatch):
    from instacart_next_order_recommendation_tpu.api.app import create_app
    from instacart_next_order_recommendation_tpu.api.http import TestClient
    from tests.test_api import make_mock_recommender

    monkeypatch.setenv("FEEDBACK_DB_PATH", str(tmp_path / "f.db"))
    app = create_app(
        model_dir=tmp_path, corpus_path=tmp_path / "c.json",
        recommender_factory=make_mock_recommender,
    )
    with TestClient(app) as c:
        r = c.post("/recommend", json={"user_context": "milk and bread", "top_k": 2})
        assert r.status_code == 200
        request_id = r.json()["request_id"]
        # feedback against that request joins back to the stored context
        c.post(
            "/feedback",
            json={"request_id": request_id, "event_type": "purchase", "product_id": "101"},
        )
    db = init_db()
    assert load_context_events(db) == [("purchase", "milk and bread", "101")]


def test_scheduler_tick_threshold_and_state(tmp_path, monkeypatch):
    monkeypatch.setenv("FEEDBACK_DB_PATH", str(tmp_path / "f.db"))
    db = init_db()

    # minimal processed dir: corpus + train_dataset
    from datasets import Dataset

    processed = tmp_path / "processed"
    processed.mkdir()
    (processed / "eval_corpus.json").write_text(json.dumps({"5": "Product: A."}))
    Dataset.from_dict({"anchor": ["base ctx"], "positive": ["Product: A."]}).save_to_disk(
        str(processed / "train_dataset")
    )

    state_path = tmp_path / "state.json"

    # below threshold: no run
    record_request_context("r1", "ctx one")
    record_events([FeedbackEventRecord("r1", "purchase", "5")])
    assert retrain_once(processed, db, state_path, min_new_events=5, train_config=None) is False
    assert load_scheduler_state(state_path)["runs"] == 0

    # enough events: runs, writes dataset, advances the event-id watermark
    for i in range(5):
        record_events([FeedbackEventRecord("r1", "click", "5")])
    assert retrain_once(processed, db, state_path, min_new_events=5, train_config=None) is True
    state = load_scheduler_state(state_path)
    assert state["runs"] == 1
    n_new, _ = count_new_events(db, state["last_event_id"])
    assert n_new == 0  # watermark consumed everything
    out_dir = processed.parent / f"{processed.name}_fb"
    assert (out_dir / "train_dataset").exists()

    # immediately after: skipped again until new feedback arrives
    assert retrain_once(processed, db, state_path, min_new_events=5, train_config=None) is False


def test_eval_gate_logic(tmp_path):
    from scripts.feedback_retrain import check_eval_gate

    run = tmp_path / "run"
    run.mkdir()
    # no best.json -> fail closed
    assert check_eval_gate(run, {}, "ndcg_at_10", 0.0) == (False, None)

    (run / "best.json").write_text(
        json.dumps({"best_epoch": 1, "metric": "ndcg_at_10", "entry": {"ndcg_at_10": 0.25}})
    )
    # first deploy: passes
    assert check_eval_gate(run, {}, "ndcg_at_10", 0.0) == (True, 0.25)
    # regression vs deployed: fails
    assert check_eval_gate(run, {"deployed_metric": 0.30}, "ndcg_at_10", 0.0) == (False, 0.25)
    # improvement below min_improvement: fails
    assert check_eval_gate(run, {"deployed_metric": 0.249}, "ndcg_at_10", 0.01) == (False, 0.25)
    # clears the bar
    assert check_eval_gate(run, {"deployed_metric": 0.20}, "ndcg_at_10", 0.01) == (True, 0.25)
    # missing metric key -> fail closed
    assert check_eval_gate(run, {}, "recall_at_10", 0.0) == (False, None)


def test_retrain_auto_deploy_on_gate_pass(tmp_path, monkeypatch):
    """retrain_once with serve_url trains, checks the gate, and deploys."""
    import scripts.feedback_retrain as fr

    monkeypatch.setenv("FEEDBACK_DB_PATH", str(tmp_path / "f.db"))
    db = init_db()

    from datasets import Dataset

    processed = tmp_path / "processed"
    processed.mkdir()
    (processed / "eval_corpus.json").write_text(json.dumps({"5": "Product: A."}))
    Dataset.from_dict({"anchor": ["base ctx"], "positive": ["Product: A."]}).save_to_disk(
        str(processed / "train_dataset")
    )
    record_request_context("r1", "ctx one")
    record_events([FeedbackEventRecord("r1", "purchase", "5")])

    run_dir = tmp_path / "model_run"

    class FakeTrainer:
        def __init__(self, cfg):
            self.cfg = cfg

        def train(self):
            final = run_dir / "final"
            final.mkdir(parents=True, exist_ok=True)
            (run_dir / "best.json").write_text(
                json.dumps({"best_epoch": 1, "metric": "ndcg_at_10", "entry": {"ndcg_at_10": 0.4}})
            )
            return {"history": [], "best_epoch": 1, "final_dir": str(final)}

    class FakeTrainConfig:
        def __init__(self, raw):
            self.raw = raw
            self.output_dir = run_dir

    import instacart_next_order_recommendation_tpu.train.trainer as tm

    monkeypatch.setattr(tm, "TwoTowerTrainer", FakeTrainer)
    monkeypatch.setattr(tm, "TrainConfig", FakeTrainConfig)

    deploys = []
    monkeypatch.setattr(fr, "deploy_model", lambda url, md, api_key=None: deploys.append((url, md)))

    cfg_file = tmp_path / "train.yaml"
    cfg_file.write_text("epochs: 1\n")
    state_path = tmp_path / "state.json"
    assert (
        fr.retrain_once(
            processed, db, state_path, min_new_events=1,
            train_config=cfg_file, serve_url="http://localhost:9",
        )
        is True
    )
    assert deploys == [("http://localhost:9", run_dir / "final")]
    state = fr.load_scheduler_state(state_path)
    assert state["deployed_metric"] == 0.4
    assert state["deployed_model"] == str(run_dir / "final")

    # Second run with a worse model: gate blocks the deploy.
    class WorseTrainer(FakeTrainer):
        def train(self):
            out = super().train()
            (run_dir / "best.json").write_text(
                json.dumps({"best_epoch": 1, "metric": "ndcg_at_10", "entry": {"ndcg_at_10": 0.1}})
            )
            return out

    monkeypatch.setattr(tm, "TwoTowerTrainer", WorseTrainer)
    record_events([FeedbackEventRecord("r1", "click", "5")])
    assert (
        fr.retrain_once(
            processed, db, state_path, min_new_events=1,
            train_config=cfg_file, serve_url="http://localhost:9",
        )
        is True
    )
    assert len(deploys) == 1  # no new deploy
    assert fr.load_scheduler_state(state_path)["deployed_metric"] == 0.4


def test_build_dataset_uses_base_when_given_fb_dir(tmp_path, monkeypatch):
    """A _fb input (e.g. after auto-resolution on a scheduler restart) must
    merge against the ORIGINAL prep output, not compound feedback pairs."""
    from datasets import Dataset, load_from_disk

    from scripts.feedback_retrain import build_dataset

    monkeypatch.setenv("FEEDBACK_DB_PATH", str(tmp_path / "f.db"))
    db = init_db()
    record_events(
        [
            FeedbackEventRecord(
                "r1", "click", "1", metadata={"user_context": "[+1d w0h9] Milk."}
            )
        ]
    )

    base = tmp_path / "p5"
    Dataset.from_dict({"anchor": ["a"], "positive": ["p"]}).save_to_disk(
        str(base / "train_dataset")
    )
    (base / "eval_corpus.json").write_text(json.dumps({"1": "Product: Milk."}))

    out1 = build_dataset(base, db)
    assert out1 is not None and out1.name == "p5_fb"
    n1 = len(load_from_disk(str(out1 / "train_dataset")))
    assert n1 == 2  # 1 base + 1 feedback (click weight 1)

    # Second run resolving the merged dir: must NOT stack more pairs.
    out2 = build_dataset(out1, db)
    n2 = len(load_from_disk(str(out2 / "train_dataset")))
    assert out2.name == "p5_fb" and n2 == 2


def test_resolve_skips_fb_dirs(tmp_path):
    from datasets import Dataset

    from instacart_next_order_recommendation_tpu.utils import resolve_processed_dir

    base = tmp_path / "processed"
    Dataset.from_dict({"anchor": ["a"], "positive": ["p"]}).save_to_disk(
        str(base / "p5" / "train_dataset")
    )
    Dataset.from_dict({"anchor": ["a", "b"], "positive": ["p", "q"]}).save_to_disk(
        str(base / "p5_fb" / "train_dataset")
    )
    resolved, _ = resolve_processed_dir(base, base)
    assert resolved.name == "p5"


def test_async_context_writer_batches_and_flushes(tmp_path, monkeypatch):
    """record_request_context is async (r5: no per-request fsync on the
    serve path); flush_request_contexts is the read barrier. Concurrent
    writers from many threads must all land."""
    import sqlite3
    from concurrent.futures import ThreadPoolExecutor

    from instacart_next_order_recommendation_tpu.api.feedback_store import (
        flush_request_contexts,
        init_db,
        record_request_context,
    )

    monkeypatch.setenv("FEEDBACK_DB_PATH", str(tmp_path / "fb.db"))
    db = init_db()
    with ThreadPoolExecutor(8) as ex:
        list(ex.map(lambda i: record_request_context(f"r{i}", f"ctx {i}"), range(200)))
    flush_request_contexts()
    conn = sqlite3.connect(db)
    try:
        n = conn.execute("SELECT COUNT(*) FROM request_contexts").fetchone()[0]
    finally:
        conn.close()
    assert n == 200
