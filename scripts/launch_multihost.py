"""Multi-host scaling harness: launch N jax.distributed processes and bench.

Validates the multi-host path (jax.distributed + one global mesh + the real
train step / row-sharded retrieval) WITHOUT pod hardware, and doubles as the
launch recipe when hardware exists:

- **Localhost validation** (this environment, CPU backend)::

    python scripts/launch_multihost.py --processes 2 --local-devices 2

  spawns N worker processes on 127.0.0.1, each owning ``--local-devices``
  CPU devices; the global mesh spans all N*D devices. Runs (a) the real
  ``TwoTowerTrainer`` on a tiny synthetic workspace and (b) row-sharded
  catalog retrieval (``ShardedCatalogIndex``), reports global examples/s and
  queries/s, and — with ``--baseline`` — the scaling efficiency vs a
  single-process run of the same per-process workload. Localhost numbers
  validate FUNCTION, not speed: the host's cores are oversubscribed, so the
  printed efficiency is a lower bound (real ICI doesn't share a CPU).

- **Pod slice** (real hardware; one worker per host, no launcher)::

    # on every host of the slice, via your pod runtime / mpirun / k8s:
    JAX_COORDINATOR_ADDRESS=<host0>:8476 \
        python -m instacart_next_order_recommendation_tpu.train \
        --config configs/train.yaml

  ``maybe_initialize_distributed`` (parallel/mesh.py) picks up the
  coordinator env; on TPU pods / Slurm / Open MPI the process count and id
  auto-detect, elsewhere set JAX_NUM_PROCESSES / JAX_PROCESS_ID explicitly
  (exactly what this launcher does). BASELINE.md target: >=85% scaling
  efficiency to 2 hosts.
"""

from __future__ import annotations

# Allow running as `python scripts/<name>.py` from a repo checkout.
import sys as _sys
from pathlib import Path as _Path

_REPO_ROOT = _Path(__file__).resolve().parents[1]
if str(_REPO_ROOT) not in _sys.path:
    _sys.path.insert(0, str(_REPO_ROOT))

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path


def _worker(args) -> None:
    """One jax.distributed process: init, mesh, train + retrieval bench."""
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.local_devices)
    jax.distributed.initialize(args.coordinator, args.processes, args.process_id)

    import numpy as np

    from instacart_next_order_recommendation_tpu.parallel import MeshConfig, build_mesh
    from instacart_next_order_recommendation_tpu.utils import setup_colored_logging

    setup_colored_logging(quiet_loggers=["jax", "datasets"])
    mesh = build_mesh(MeshConfig())
    is_main = jax.process_index() == 0
    result: dict = {
        "processes": jax.process_count(),
        "global_devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
    }
    if args.model_parallel > 1:
        # Record which mesh axes span processes for this topology: collectives
        # along a spanning axis cross the process boundary (sockets here, DCN
        # on a real pod). The train mesh below is built with the same config,
        # so these flags describe the collectives the TP train step emits.
        tp_mesh = build_mesh(MeshConfig(model_parallel=args.model_parallel))
        md = tp_mesh.devices
        result["tp_crosses_process"] = bool(
            any(len({d.process_index for d in md[i, :]}) > 1 for i in range(md.shape[0]))
        )
        result["dp_crosses_process"] = bool(
            any(len({d.process_index for d in md[:, j]}) > 1 for j in range(md.shape[1]))
        )

    # --- train bench: the REAL trainer over the global mesh -----------------
    from instacart_next_order_recommendation_tpu.train import TrainConfig, TwoTowerTrainer

    cfg = TrainConfig(
        {
            "processed_dir": str(args.workspace / "processed"),
            "output_dir": str(
                args.workspace
                / (
                    f"model_np{args.processes}"
                    + (f"_mp{args.model_parallel}" if args.model_parallel > 1 else "")
                )
            ),
            "model_name": str(args.workspace / "tiny_tower"),
            "max_seq_length": 32,
            "epochs": args.epochs,
            # The trainer's train_batch_size is per-data-shard (global =
            # batch x dp), so the global batch grows with the mesh — weak
            # scaling, the regime the cross-device-negatives design targets.
            "train_batch_size": args.per_device_batch,
            # mp>1 splits the model axis over the mesh; with 2 processes x
            # mp=2 and 1 device/process-half, the Megatron-TP shard_map step's
            # collectives cross a PROCESS boundary — the one parallel
            # topology a single-process dryrun cannot exercise.
            "model_parallel": args.model_parallel,
            "train_step_mode": "shard_map" if args.model_parallel > 1 else "auto",
            "run_information_retrieval_evaluator": False,
            "logging_steps": 10_000,
            "steps_per_dispatch": 1,
        }
    )
    t_res = TwoTowerTrainer(cfg).train()
    last = t_res["history"][-1]  # steady state (first epoch pays compiles)
    dp = jax.device_count() // max(1, args.model_parallel)
    result["model_parallel"] = args.model_parallel
    global_batch = args.per_device_batch * dp
    n_pairs_seen = global_batch * _steps_in_epoch(args.workspace, global_batch)
    result["train_examples_per_s"] = round(n_pairs_seen / last["epoch_seconds"], 1)
    result["train_loss_final"] = last["train_loss"]
    result["train_loss_finite"] = bool(np.isfinite(last["train_loss"]))

    # --- retrieval bench: row-sharded catalog over the mesh -----------------
    from instacart_next_order_recommendation_tpu.index import ShardedCatalogIndex

    rng = np.random.default_rng(0)
    cat = rng.standard_normal((args.catalog, 64), dtype=np.float32)
    cat /= np.linalg.norm(cat, axis=1, keepdims=True)
    queries = cat[rng.integers(0, args.catalog, size=256)]
    index = ShardedCatalogIndex(cat, mesh=mesh)
    index.topk(queries, 10)  # compile + rendezvous warm-up
    t0 = time.time()
    reps = 20
    # Per-call sync, intentionally: async-queuing 20 shard_map dispatches
    # lets the processes' collective queues drift apart, which XLA:CPU's
    # hard 40 s rendezvous window punishes (observed: wedged mp=2 groups);
    # measured on this host the pipelined variant changed efficiency by
    # <0.005 anyway. Real-serving pipelining is benched in bench.py on the
    # actual chip instead.
    for _ in range(reps):
        scores, ids = index.topk(queries, 10)
    dt = time.time() - t0
    result["retrieval_qps"] = round(reps * len(queries) / dt, 1)
    # Exactness spot check vs dense host oracle on this process.
    dense = queries @ cat.T
    expect = np.argsort(-dense, axis=1)[:, :1]
    result["retrieval_exact_top1"] = bool((ids[:, :1] == expect).all())

    if is_main:
        print("WORKER_RESULT " + json.dumps(result), flush=True)


def _steps_in_epoch(workspace: Path, global_batch: int) -> int:
    from datasets import load_from_disk

    from instacart_next_order_recommendation_tpu.data.batching import steps_per_epoch

    n = len(load_from_disk(str(workspace / "processed" / "train_dataset")))
    return steps_per_epoch(n, global_batch)


def _prepare_workspace(base: Path, n_users: int, n_products: int) -> None:
    """Synthetic workspace + tiny warm-start tower (built once, pre-launch).

    A tiny tower keeps per-step compute small enough that localhost CPU
    collectives stay inside XLA:CPU's hard 40s rendezvous window.
    """
    import dataclasses

    import jax

    jax.config.update("jax_platforms", "cpu")

    from instacart_next_order_recommendation_tpu.data import InstacartDataPrep
    from instacart_next_order_recommendation_tpu.data.synthetic import (
        generate_instacart_csvs,
    )
    from instacart_next_order_recommendation_tpu.models import (
        MINILM_L6,
        init_params,
        save_tower,
    )
    from instacart_next_order_recommendation_tpu.tokenizer import WordPieceTokenizer

    if (base / "processed" / "train_dataset").exists():
        return
    data_dir = generate_instacart_csvs(
        base / "data", n_users=n_users, n_products=n_products, seed=0
    )
    prep = InstacartDataPrep(data_dir=data_dir, output_dir=base / "p", eval_frac=0.15)
    prep.prepare()
    prep.effective_output_dir().rename(base / "processed")

    corpus = json.loads((base / "processed" / "eval_corpus.json").read_text())
    tok = WordPieceTokenizer.train(list(corpus.values()), vocab_size=4000)
    cfg = dataclasses.replace(
        MINILM_L6,
        hidden_size=64,
        num_layers=2,
        num_heads=4,
        intermediate_size=128,
        vocab_size=tok.vocab_size,
        max_position=64,
        max_seq_length=32,
    )
    save_tower(base / "tiny_tower", init_params(cfg, jax.random.key(0)), cfg, tok)


def _run_group(args, n_processes: int, port: int) -> dict:
    """Spawn n worker processes; return process 0's result JSON."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # workers pin the platform via jax.config
    procs = []
    for pid in range(n_processes):
        cmd = [
            sys.executable, __file__, "--worker",
            "--coordinator", f"127.0.0.1:{port}",
            "--processes", str(n_processes),
            "--process-id", str(pid),
            "--local-devices", str(args.local_devices),
            "--per-device-batch", str(args.per_device_batch),
            "--epochs", str(args.epochs),
            "--catalog", str(args.catalog),
            "--workspace", str(args.workspace),
            "--platform", args.platform,
            "--model-parallel", str(args.model_parallel),
        ]
        procs.append(
            subprocess.Popen(
                cmd, env=env,
                stdout=subprocess.PIPE if pid == 0 else subprocess.DEVNULL,
                stderr=subprocess.STDOUT,
            )
        )
    try:
        out, _ = procs[0].communicate(timeout=args.timeout)
        for p in procs[1:]:
            p.wait(timeout=60)
    except subprocess.TimeoutExpired:
        # A wedged worker (e.g. a collective rendezvous deadlock) must not
        # leak N jax processes holding the coordinator port — kill the whole
        # group before propagating.
        for p in procs:
            if p.poll() is None:
                p.kill()
        for p in procs:
            p.wait(timeout=30)
        raise
    text = out.decode()
    for line in text.splitlines():
        if line.startswith("WORKER_RESULT "):
            return json.loads(line[len("WORKER_RESULT "):])
    raise RuntimeError(
        f"worker group (n={n_processes}) produced no result; tail:\n"
        + "\n".join(text.splitlines()[-30:])
    )


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="Multi-host scaling harness")
    parser.add_argument("--processes", type=int, default=2)
    parser.add_argument("--local-devices", type=int, default=2)
    parser.add_argument(
        "--model-parallel", type=int, default=1,
        help="Megatron-TP degree for the train step (shard_map mode when >1);"
        " with processes=2, local-devices=2, model-parallel=2 the TP"
        " collectives cross a process boundary.",
    )
    parser.add_argument("--per-device-batch", type=int, default=16)
    parser.add_argument("--epochs", type=int, default=2)
    parser.add_argument("--catalog", type=int, default=20_000)
    parser.add_argument("--users", type=int, default=200)
    parser.add_argument("--products", type=int, default=300)
    parser.add_argument("--workspace", type=Path, default=Path("mh_workspace"))
    parser.add_argument("--port", type=int, default=8476)
    parser.add_argument("--timeout", type=int, default=1200)
    parser.add_argument(
        "--baseline", action="store_true",
        help="also run a 1-process group and report scaling efficiency",
    )
    parser.add_argument("--platform", default="cpu", choices=["cpu", "default"])
    # worker-mode internals
    parser.add_argument("--worker", action="store_true", help=argparse.SUPPRESS)
    parser.add_argument("--coordinator", default=None, help=argparse.SUPPRESS)
    parser.add_argument("--process-id", type=int, default=0, help=argparse.SUPPRESS)
    args = parser.parse_args(argv)

    if args.worker:
        _worker(args)
        return 0

    args.workspace.mkdir(parents=True, exist_ok=True)
    # Workspace prep imports jax with the cpu platform pinned — do it in a
    # subprocess so the launcher itself never initializes a backend.
    subprocess.run(
        [
            sys.executable, "-c",
            "import sys; sys.path.insert(0, %r); "
            "from scripts.launch_multihost import _prepare_workspace; "
            "from pathlib import Path; "
            "_prepare_workspace(Path(%r), %d, %d)"
            % (str(_REPO_ROOT), str(args.workspace), args.users, args.products),
        ],
        check=True,
    )

    summary: dict = {"metric": "multihost_scaling", "config": {
        "processes": args.processes, "local_devices": args.local_devices,
        "per_device_batch": args.per_device_batch, "catalog": args.catalog,
        "model_parallel": args.model_parallel,
    }}
    if args.baseline:
        print(f"=== baseline: 1 process x {args.local_devices} devices ===", flush=True)
        base = _run_group(args, 1, args.port + 1)
        summary["baseline"] = base
        print(json.dumps(base), flush=True)

    print(f"=== {args.processes} processes x {args.local_devices} devices ===", flush=True)
    multi = _run_group(args, args.processes, args.port)
    summary["multi"] = multi
    print(json.dumps(multi), flush=True)

    if args.baseline:
        n = args.processes
        summary["scaling_efficiency"] = {
            # Weak scaling: per-process workload constant, so ideal = n x base.
            "train": round(
                multi["train_examples_per_s"] / (n * base["train_examples_per_s"]), 3
            ),
            "retrieval": round(multi["retrieval_qps"] / (n * base["retrieval_qps"]), 3),
            "note": "localhost CPU shares cores across processes; this is a "
            "functional lower bound, not an ICI number",
        }
    print(json.dumps(summary), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
