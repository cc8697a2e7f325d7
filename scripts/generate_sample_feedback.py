"""Generate sample recommend + feedback traffic against a running API.

Load-test/demo client with parity to
/root/reference/scripts/generate_sample_feedback.py:59-267: health pre-check,
N POST /recommend calls (prefers real eval user_ids from eval_queries.json,
else canned sample contexts), then batched POST /feedback with a
probabilistic conversion funnel impression -> click -> add_to_cart ->
purchase.
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
import random
import sys
from pathlib import Path

import httpx

from instacart_next_order_recommendation_tpu.constants import (
    DEFAULT_CONFIG_GENERATE_SAMPLE_FEEDBACK,
    DEFAULT_PROCESSED_DIR,
    EVAL_QUERIES_FILENAME,
    SAMPLE_USER_CONTEXTS,
)
from instacart_next_order_recommendation_tpu.utils import resolve_processed_dir
from instacart_next_order_recommendation_tpu.utils.config import load_yaml_config


def load_eval_user_ids(processed_dir: Path, limit: int = 50) -> list[str]:
    queries_path = processed_dir / EVAL_QUERIES_FILENAME
    if not queries_path.exists():
        return []
    try:
        data = json.loads(queries_path.read_text())
        return [str(i) for i in list(data.keys())[:limit]]
    except (json.JSONDecodeError, OSError):
        return []


def post_recommend_request(
    client: httpx.Client,
    base_url: str,
    api_key: str | None,
    user_id: str | None,
    user_context: str | None,
    top_k: int,
) -> tuple[str | None, list[str]]:
    headers = {"X-API-Key": api_key} if api_key else None
    payload: dict = {"top_k": top_k}
    if user_id:
        payload["user_id"] = user_id
    else:
        payload["user_context"] = user_context or SAMPLE_USER_CONTEXTS[0]
    resp = client.post(f"{base_url}/recommend", json=payload, headers=headers)
    resp.raise_for_status()
    data = resp.json()
    return data.get("request_id"), [r["product_id"] for r in data.get("recommendations", [])]


def build_funnel_events(
    request_id: str,
    product_ids: list[str],
    rng: random.Random,
    click_rate: float,
    atc_rate: float,
    purchase_rate: float,
    user_context: str | None = None,
) -> list[dict]:
    """Impression for every product; then click -> add_to_cart -> purchase chains.

    When ``user_context`` is known it is stored in event metadata so
    scripts/feedback_retrain.py can mine (context, product) training pairs.
    """
    meta = {"metadata": {"user_context": user_context}} if user_context else {}
    events = []
    for pid in product_ids:
        events.append(
            {"request_id": request_id, "event_type": "impression", "product_id": pid, **meta}
        )
        if rng.random() < click_rate:
            events.append(
                {"request_id": request_id, "event_type": "click", "product_id": pid, **meta}
            )
            if rng.random() < atc_rate:
                events.append(
                    {"request_id": request_id, "event_type": "add_to_cart", "product_id": pid, **meta}
                )
                if rng.random() < purchase_rate:
                    events.append(
                        {"request_id": request_id, "event_type": "purchase", "product_id": pid, **meta}
                    )
    return events


def post_feedback(client: httpx.Client, base_url: str, api_key: str | None, events: list[dict]):
    headers = {"X-API-Key": api_key} if api_key else None
    resp = client.post(f"{base_url}/feedback", json={"events": events}, headers=headers)
    resp.raise_for_status()


def load_config(config_path: Path | None = None) -> dict:
    raw = load_yaml_config(config_path, DEFAULT_CONFIG_GENERATE_SAMPLE_FEEDBACK)
    return {
        "url": str(raw.get("url", "http://localhost:8000")),
        "num_requests": int(raw.get("num_requests", 20)),
        "api_key": raw.get("api_key"),
        "top_k": int(raw.get("top_k", 10)),
        "click_rate": float(raw.get("click_rate", 0.15)),
        "atc_rate": float(raw.get("atc_rate", 0.4)),
        "purchase_rate": float(raw.get("purchase_rate", 0.6)),
        "seed": int(raw.get("seed", 0)),
    }


def main() -> None:
    parser = argparse.ArgumentParser(description="Generate sample recommend + feedback requests")
    parser.add_argument("--config", type=Path, default=None)
    parser.add_argument("--num-requests", type=int, default=None)
    args = parser.parse_args()
    cfg = load_config(args.config)
    if args.num_requests is not None:
        cfg["num_requests"] = args.num_requests

    rng = random.Random(cfg["seed"])
    base_url = cfg["url"].rstrip("/")

    with httpx.Client(timeout=60) as client:
        try:
            health = client.get(f"{base_url}/health")
            health.raise_for_status()
        except Exception as exc:  # noqa: BLE001
            print(f"API not reachable at {base_url}: {exc}")
            sys.exit(1)

        try:
            processed_dir, _ = resolve_processed_dir(DEFAULT_PROCESSED_DIR, DEFAULT_PROCESSED_DIR)
            user_ids = load_eval_user_ids(processed_dir)
        except FileNotFoundError:
            user_ids = []

        total_events = 0
        for i in range(cfg["num_requests"]):
            user_id = rng.choice(user_ids) if user_ids else None
            context = None if user_id else rng.choice(SAMPLE_USER_CONTEXTS)
            try:
                request_id, product_ids = post_recommend_request(
                    client, base_url, cfg["api_key"], user_id, context, cfg["top_k"]
                )
            except httpx.RequestError as exc:
                print(f"  request {i}: recommend transport error ({exc}); continuing")
                continue
            except httpx.HTTPStatusError as exc:
                print(f"  request {i}: recommend failed ({exc.response.status_code})")
                continue
            if not request_id or not product_ids:
                continue
            events = build_funnel_events(
                request_id,
                product_ids,
                rng,
                cfg["click_rate"],
                cfg["atc_rate"],
                cfg["purchase_rate"],
                user_context=context,
            )
            try:
                post_feedback(client, base_url, cfg["api_key"], events)
            except httpx.HTTPError as exc:
                print(f"  request {i}: feedback failed ({exc}); continuing")
                continue
            total_events += len(events)
            print(f"  request {i + 1}/{cfg['num_requests']}: {len(events)} events")

        print(f"Done: {total_events} feedback events sent.")


if __name__ == "__main__":
    main()
