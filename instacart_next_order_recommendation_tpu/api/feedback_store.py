"""SQLite storage for feedback events.

Schema, indices, and insert semantics (COALESCE created_at, executemany
batch transaction) match the reference
(/root/reference/src/api/feedback_store.py:49-196).
"""

from __future__ import annotations

import json
import os
import sqlite3
import threading
from dataclasses import dataclass
from datetime import datetime
from pathlib import Path
from typing import Any, Iterable, Mapping, Optional

from instacart_next_order_recommendation_tpu.constants import (
    DEFAULT_FEEDBACK_DB_PATH,
    ENV_FEEDBACK_DB_PATH,
)

_INSERT_SQL = """
INSERT INTO feedback_events (
    request_id, event_type, user_id, product_id,
    user_context_hash, metadata, created_at
)
VALUES (?, ?, ?, ?, ?, ?, COALESCE(?, CURRENT_TIMESTAMP))
"""


def get_db_path() -> Path:
    value = os.getenv(ENV_FEEDBACK_DB_PATH)
    return Path(value) if value else DEFAULT_FEEDBACK_DB_PATH


_initialized_paths: set[str] = set()
_init_lock = threading.Lock()


def init_db() -> Path:
    """Create the feedback table and indices if missing; returns the DB path.

    Idempotent and cached per resolved path: record_event/record_events call
    this on every insert, and re-running seven DDL statements per feedback
    event would dominate an ingest path whose latency histogram starts at
    1 ms buckets. (If the DB file is deleted mid-run, restart the process —
    or point ENV_FEEDBACK_DB_PATH at a new path — to re-run the DDL.)
    """
    db_path = get_db_path().resolve()
    key = str(db_path)
    if key in _initialized_paths:
        return db_path
    with _init_lock:
        if key in _initialized_paths:
            return db_path
        _create_schema(db_path)
        _initialized_paths.add(key)
    return db_path


def _create_schema(db_path: Path) -> None:
    db_path.parent.mkdir(parents=True, exist_ok=True)
    conn = sqlite3.connect(db_path)
    try:
        cur = conn.cursor()
        cur.execute(
            """
            CREATE TABLE IF NOT EXISTS feedback_events (
                id INTEGER PRIMARY KEY AUTOINCREMENT,
                request_id TEXT,
                event_type TEXT NOT NULL,
                user_id TEXT,
                product_id TEXT NOT NULL,
                user_context_hash TEXT,
                metadata TEXT,
                created_at TIMESTAMP DEFAULT CURRENT_TIMESTAMP
            )
            """
        )
        cur.execute(
            "CREATE INDEX IF NOT EXISTS idx_feedback_request ON feedback_events(request_id)"
        )
        cur.execute(
            "CREATE INDEX IF NOT EXISTS idx_feedback_event_type ON feedback_events(event_type)"
        )
        cur.execute(
            "CREATE INDEX IF NOT EXISTS idx_feedback_created ON feedback_events(created_at)"
        )
        # Server-side request-context store (TPU-native extension beyond the
        # reference): lets the retrain pipeline join feedback events to the
        # full serving context without clients echoing it back in metadata.
        cur.execute(
            """
            CREATE TABLE IF NOT EXISTS request_contexts (
                request_id TEXT PRIMARY KEY,
                user_id TEXT,
                user_context TEXT NOT NULL,
                created_at TIMESTAMP DEFAULT CURRENT_TIMESTAMP
            )
            """
        )
        cur.execute(
            "CREATE INDEX IF NOT EXISTS idx_context_created ON request_contexts(created_at)"
        )
        conn.commit()
    finally:
        conn.close()


@dataclass
class FeedbackEventRecord:
    request_id: Optional[str]
    event_type: str
    product_id: str
    user_id: Optional[str] = None
    user_context_hash: Optional[str] = None
    metadata: Optional[Mapping[str, Any]] = None
    created_at: Optional[datetime] = None

    def row(self) -> tuple:
        return (
            self.request_id,
            self.event_type,
            self.user_id,
            self.product_id,
            self.user_context_hash,
            _serialize_metadata(self.metadata),
            self.created_at.isoformat() if self.created_at else None,
        )


def _serialize_metadata(metadata: Optional[Mapping[str, Any]]) -> Optional[str]:
    if metadata is None:
        return None
    try:
        return json.dumps(metadata, ensure_ascii=False)
    except TypeError:
        return json.dumps(str(metadata), ensure_ascii=False)


def record_event(event: FeedbackEventRecord) -> None:
    db_path = init_db()
    conn = sqlite3.connect(db_path)
    try:
        conn.execute(_INSERT_SQL, event.row())
        conn.commit()
    finally:
        conn.close()


def record_events(events: Iterable[FeedbackEventRecord]) -> None:
    rows = [e.row() for e in events]
    if not rows:
        return
    db_path = init_db()
    conn = sqlite3.connect(db_path)
    try:
        conn.executemany(_INSERT_SQL, rows)
        conn.commit()
    finally:
        conn.close()


def record_request_context(
    request_id: str, user_context: str, user_id: Optional[str] = None
) -> None:
    """Persist the serving context for a request (feeds the retrain loop).

    Opt-out via STORE_REQUEST_CONTEXTS=0 (the reference stores only a
    client-provided context hash, /root/reference/src/api/feedback_store.py:90).
    """
    if os.getenv("STORE_REQUEST_CONTEXTS", "1").strip() in ("0", "false"):
        return
    db_path = init_db()
    conn = sqlite3.connect(db_path)
    try:
        conn.execute(
            "INSERT OR REPLACE INTO request_contexts (request_id, user_id, user_context)"
            " VALUES (?, ?, ?)",
            (request_id, user_id, user_context),
        )
        conn.commit()
    finally:
        conn.close()


def load_context_events(
    db_path: Path, since: str | None = None
) -> list[tuple[str, str, str]]:
    """(event_type, user_context, product_id) rows for retraining: feedback
    events joined to the server-side request-context store."""
    conn = sqlite3.connect(db_path)
    try:
        sql = (
            "SELECT e.event_type, c.user_context, e.product_id "
            "FROM feedback_events e JOIN request_contexts c USING (request_id)"
        )
        params: tuple = ()
        if since:
            sql += " WHERE e.created_at >= ?"
            params = (since,)
        return [(str(a), str(b), str(c)) for a, b, c in conn.execute(sql, params)]
    finally:
        conn.close()
