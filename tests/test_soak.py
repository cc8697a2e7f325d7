"""Scaled-down run of the HTTP tail-latency soak (scripts/bench_soak.py).

Asserts the adaptive micro-batch window's two latch invariants under real
HTTP traffic: bursts coalesce (no permanent batch-1) and lone traffic after
bursts stops paying windows (no permanent window).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_soak_no_latch(tmp_path):
    env = dict(os.environ)
    proc = subprocess.run(
        [
            sys.executable,
            str(REPO / "scripts" / "bench_soak.py"),
            "--workdir", str(tmp_path / "ws"),
            "--products", "300",
            "--phase-seconds", "2.5",
            "--burst-threads", "8",
            "--port", "8377",
            "--platform", "cpu",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["metric"] == "serve_soak"

    phases = summary["phases"]
    for name in ("lone", "burst", "mixed", "lone_after_burst"):
        assert phases[name]["n"] > 0, f"phase {name} served nothing"
        assert phases[name]["p99_ms"] > 0

    # Bursts must coalesce: at least one multi-request drain during burst.
    assert summary["no_batch1_latch"], f"burst never coalesced: {phases['burst']}"
    # Lone traffic after bursts must disengage the window.
    assert summary.get("no_window_latch", True), (
        f"window latched on after bursts: {phases['lone_after_burst']}"
    )
