"""End-to-end demo: synthetic data -> prep -> train -> serve -> API smoke test.

One command that exercises the whole framework (no external data needed):

    python scripts/run_demo.py [--workdir demo_workspace] [--epochs 3]
"""

from __future__ import annotations

# Allow running as `python scripts/<name>.py` from a repo checkout.
import sys as _sys
from pathlib import Path as _Path

_repo_root = str(_Path(__file__).resolve().parents[1])
if _repo_root not in _sys.path:
    _sys.path.insert(0, _repo_root)

import argparse
import json
import threading
import time
from pathlib import Path

from instacart_next_order_recommendation_tpu.utils import setup_colored_logging
from instacart_next_order_recommendation_tpu.utils.cache import enable_compilation_cache


def main() -> None:
    parser = argparse.ArgumentParser(description="Run the end-to-end demo")
    parser.add_argument("--workdir", type=Path, default=Path("demo_workspace"))
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--users", type=int, default=500)
    parser.add_argument("--products", type=int, default=800)
    parser.add_argument("--port", type=int, default=8123)
    args = parser.parse_args()

    setup_colored_logging(quiet_loggers=["jax", "datasets"])
    enable_compilation_cache()
    base = args.workdir
    base.mkdir(parents=True, exist_ok=True)

    print("\n=== 1/5 Synthetic Instacart data ===")
    from instacart_next_order_recommendation_tpu.data.synthetic import (
        generate_instacart_csvs,
    )

    data_dir = generate_instacart_csvs(
        base / "data", n_users=args.users, n_products=args.products, seed=0
    )

    print("\n=== 2/5 Data prep ===")
    from instacart_next_order_recommendation_tpu.data import InstacartDataPrep

    prep = InstacartDataPrep(data_dir=data_dir, output_dir=base / "processed", eval_frac=0.15)
    prep.prepare()
    processed = prep.effective_output_dir()

    print("\n=== 3/5 Training ===")
    from instacart_next_order_recommendation_tpu.train import TrainConfig, TwoTowerTrainer

    cfg = TrainConfig(
        {
            "processed_dir": str(processed),
            "output_dir": str(base / "model"),
            "max_seq_length": 128,
            "epochs": args.epochs,
            "train_batch_size": 32,
            "eval_batch_size": 128,
            "learning_rate": 2e-4,
            "vocab_size": 8000,
            "logging_steps": 50,
        }
    )
    result = TwoTowerTrainer(cfg).train()
    final_dir = result["final_dir"]

    print("\n=== 4/5 CLI-style recommendation ===")
    from instacart_next_order_recommendation_tpu.serve import MonitoredRecommender

    rec = MonitoredRecommender(model_dir=final_dir, corpus_path=processed / "eval_corpus.json")
    eval_queries = json.loads((processed / "eval_queries.json").read_text())
    demo_qid, demo_query = next(iter(eval_queries.items()))
    print(f"query (order {demo_qid}): {demo_query[:120]}...")
    for i, (pid, score) in enumerate(rec.recommend(demo_query, top_k=5), 1):
        print(f"  {i}. [{score:.4f}] {rec.pid_to_text[pid]}")
    m = rec.last_metrics
    print(f"  latency: {m.total_latency_ms:.1f} ms (encode {m.query_embedding_time_ms:.1f} ms)")

    print("\n=== 5/5 API smoke test ===")
    import os

    import httpx

    os.environ["FEEDBACK_DB_PATH"] = str(base / "feedback.db")
    from instacart_next_order_recommendation_tpu.api import create_app
    from instacart_next_order_recommendation_tpu.api.http import serve

    app = create_app(model_dir=final_dir, corpus_path=processed / "eval_corpus.json")
    t = threading.Thread(target=serve, args=(app, "127.0.0.1", args.port), daemon=True)
    t.start()
    url = f"http://127.0.0.1:{args.port}"
    for _ in range(100):
        try:
            if httpx.get(f"{url}/ready", timeout=2).json().get("status") == "ready":
                break
        except Exception:  # noqa: BLE001
            pass
        time.sleep(0.2)
    r = httpx.post(
        f"{url}/recommend", json={"user_context": demo_query, "top_k": 3}, timeout=60
    )
    body = r.json()
    print(f"POST /recommend -> {r.status_code}, {len(body['recommendations'])} items")
    fb = httpx.post(
        f"{url}/feedback",
        json={
            "request_id": body["request_id"],
            "event_type": "purchase",
            "product_id": body["recommendations"][0]["product_id"],
        },
        timeout=10,
    )
    print(f"POST /feedback  -> {fb.status_code} {fb.json()}")
    metrics_text = httpx.get(f"{url}/metrics", timeout=10).text
    served = [ln for ln in metrics_text.splitlines() if ln.startswith("recommendation_requests_total")]
    print("metrics:", *served[:2], sep="\n  ")
    print("\nDemo complete.")


if __name__ == "__main__":
    main()
