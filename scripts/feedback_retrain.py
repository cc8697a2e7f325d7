"""Feedback-weighted retraining dataset builder.

Mines the feedback DB for engagement events that carry the serving context
(``metadata.user_context``, sent by clients such as
scripts/generate_sample_feedback.py) and converts them into additional
(anchor, positive) training pairs, weighted by funnel depth (purchase >
add_to_cart > click). The output is a processed-format dataset directory that
the trainer consumes directly — closing the loop the reference captures
feedback for but never feeds back into training (BASELINE.json config 5).
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
import logging
from pathlib import Path

from instacart_next_order_recommendation_tpu.api.feedback_store import get_db_path, init_db
from instacart_next_order_recommendation_tpu.constants import (
    DEFAULT_PROCESSED_DIR,
    EVAL_CORPUS_FILENAME,
)
from instacart_next_order_recommendation_tpu.utils import (
    resolve_processed_dir,
    setup_colored_logging,
)
from scripts.feedback_analytics import load_events

logger = logging.getLogger(__name__)

DEFAULT_WEIGHTS = {"purchase": 3, "add_to_cart": 2, "click": 1}


def build_weighted_pairs(
    events_with_context: list[tuple[str, str, str]],
    corpus: dict[str, str],
    weights: dict[str, int] | None = None,
) -> tuple[list[str], list[str]]:
    """(event_type, user_context, product_id) -> weighted (anchor, positive) pairs.

    Weighting = pair repetition (MNRL has no per-sample weight input; repeating
    a pair k times is the in-batch-negatives equivalent).
    """
    weights = weights or DEFAULT_WEIGHTS
    anchors: list[str] = []
    positives: list[str] = []
    for event_type, context, product_id in events_with_context:
        w = weights.get(event_type, 0)
        text = corpus.get(product_id)
        if w <= 0 or not context or text is None:
            continue
        anchors.extend([context] * w)
        positives.extend([text] * w)
    return anchors, positives


def extract_context_events(db_path: Path, since: str | None = None) -> list[tuple[str, str, str]]:
    """Pull (event_type, user_context, product_id) rows with stored context."""
    import sqlite3

    if not db_path.exists():
        return []
    conn = sqlite3.connect(db_path)
    try:
        rows = conn.execute(
            "SELECT event_type, metadata, product_id FROM feedback_events "
            "WHERE metadata IS NOT NULL" + (" AND created_at >= ?" if since else ""),
            (since,) if since else (),
        ).fetchall()
    finally:
        conn.close()
    out = []
    for event_type, metadata, product_id in rows:
        try:
            meta = json.loads(metadata)
        except (TypeError, json.JSONDecodeError):
            continue
        context = meta.get("user_context") if isinstance(meta, dict) else None
        if context:
            out.append((event_type, str(context), str(product_id)))
    return out


def main() -> None:
    parser = argparse.ArgumentParser(description="Build a feedback-weighted retrain dataset")
    parser.add_argument("--processed-dir", type=Path, default=None)
    parser.add_argument("--output-dir", type=Path, required=False, default=None)
    parser.add_argument("--since", default=None)
    args = parser.parse_args()
    setup_colored_logging()

    init_db()
    db_path = get_db_path()
    processed_dir, _ = resolve_processed_dir(
        args.processed_dir or DEFAULT_PROCESSED_DIR, DEFAULT_PROCESSED_DIR
    )
    corpus = json.loads((processed_dir / EVAL_CORPUS_FILENAME).read_text())

    events = extract_context_events(db_path, since=args.since)
    anchors, positives = build_weighted_pairs(events, corpus)
    if not anchors:
        print("No feedback events with user_context metadata found; nothing to build.")
        return

    from datasets import Dataset, concatenate_datasets, load_from_disk

    base_train = load_from_disk(str(processed_dir / "train_dataset"))
    feedback_ds = Dataset.from_dict({"anchor": anchors, "positive": positives})
    merged = concatenate_datasets([base_train, feedback_ds])

    out_dir = args.output_dir or processed_dir.parent / f"{processed_dir.name}_fb"
    out_dir.mkdir(parents=True, exist_ok=True)
    merged.save_to_disk(str(out_dir / "train_dataset"))
    for fname in (
        "eval_queries.json",
        "eval_corpus.json",
        "eval_relevant_docs.json",
        "data_prep_params.json",
    ):
        src = processed_dir / fname
        if src.exists():
            (out_dir / fname).write_text(src.read_text())
    print(
        f"Wrote {len(merged)} train pairs ({len(feedback_ds)} from feedback) to {out_dir}"
    )


if __name__ == "__main__":
    main()
