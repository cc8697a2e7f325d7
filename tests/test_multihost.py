"""Multi-host harness: 2 real jax.distributed processes on localhost.

This is the closest offline stand-in for a pod slice: two OS processes, each
owning its own XLA CPU device, joined through jax.distributed into ONE
global mesh — the real trainer and the row-sharded catalog index run across
the process boundary (collectives over sockets, not shared memory).
"""

import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.mark.slow
def test_two_process_train_and_retrieval(tmp_path):
    proc = subprocess.run(
        [
            sys.executable, str(REPO / "scripts" / "launch_multihost.py"),
            "--processes", "2",
            "--local-devices", "1",
            "--users", "80",
            "--products", "120",
            "--epochs", "1",
            "--per-device-batch", "8",
            "--catalog", "2000",
            "--workspace", str(tmp_path / "ws"),
            "--port", "8491",
            "--timeout", "420",
        ],
        capture_output=True,
        text=True,
        timeout=480,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    multi = summary["multi"]
    assert multi["processes"] == 2
    assert multi["global_devices"] == 2
    assert multi["train_loss_finite"]
    assert multi["retrieval_exact_top1"]
    assert multi["train_examples_per_s"] > 0
    assert multi["retrieval_qps"] > 0
    # Only process 0 writes the output tree (multi-host file discipline).
    model_dir = tmp_path / "ws" / "model_np2"
    assert (model_dir / "final").exists()
    assert (model_dir / "eval_history.json").exists()
