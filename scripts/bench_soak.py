"""Tail-latency soak: mixed lone/bursty traffic through the FULL HTTP path.

The driver bench (bench.py) measures batch throughput; this soak drives the
actual HTTP server (api/http.py, micro-batcher enabled) with three traffic
phases and reports per-phase p50/p95/p99 plus the micro-batcher's
window-decision counters — the evidence that the adaptive window
(serve/batching.py) neither latches into permanent batch-1 dispatches under
sustained load nor charges idle traffic permanent windows. The reference
publishes only a single-request latency example
(/root/reference/README.md:433-441); tail behavior under concurrency is a
TPU-native serving concern the micro-batcher introduces.

Run: python scripts/bench_soak.py [--phase-seconds 20] [--port 8191]
Prints one JSON line per phase and a final summary JSON.
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_REPO_ROOT = _Path(__file__).resolve().parents[1]
if str(_REPO_ROOT) not in _sys.path:
    _sys.path.insert(0, str(_REPO_ROOT))

import argparse
import dataclasses
import json
import os
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np


def build_workspace(base: Path, n_products: int) -> tuple[Path, Path, list[str]]:
    """Tiny self-contained tower + corpus (no external data)."""
    import jax

    from instacart_next_order_recommendation_tpu.models import (
        MINILM_L6,
        init_params,
        save_tower,
    )
    from instacart_next_order_recommendation_tpu.tokenizer import WordPieceTokenizer

    rng = np.random.default_rng(0)
    sys_path_bench = str(_REPO_ROOT)
    if sys_path_bench not in _sys.path:
        _sys.path.insert(0, sys_path_bench)
    from bench import build_catalog_texts, build_query_texts

    catalog = build_catalog_texts(n_products, rng)
    queries = build_query_texts(512, catalog, rng)
    corpus = {str(i + 1): t for i, t in enumerate(catalog)}

    tok = WordPieceTokenizer.train(catalog, vocab_size=8000)
    cfg = dataclasses.replace(MINILM_L6, vocab_size=tok.vocab_size)
    # Keyed by catalog size: a reused workdir with a different --products
    # would otherwise serve a stale tower whose vocab mismatches the corpus.
    model_dir = base / f"model_p{n_products}"
    if not (model_dir / "params.msgpack").exists():
        save_tower(model_dir, init_params(cfg, jax.random.key(0)), cfg, tok)
    corpus_path = base / "eval_corpus.json"
    corpus_path.write_text(json.dumps(corpus))
    return model_dir, corpus_path, queries


def drive_phase(
    url: str,
    queries: list[str],
    seconds: float,
    concurrency: int,
    gap_s: float = 0.0,
    burst_every: int = 0,
) -> list[float]:
    """Fire /recommend requests for ``seconds``; returns latencies (s).

    concurrency=1 -> lone sequential client. burst_every>0 -> bursts of
    ``concurrency`` with an idle ``gap_s`` between bursts (mixed phase).
    """
    import httpx

    lat: list[float] = []
    lock = threading.Lock()
    stop = time.time() + seconds

    def one(i: int, client) -> None:
        q = queries[i % len(queries)]
        t0 = time.time()
        r = client.post(f"{url}/recommend", json={"user_context": q, "top_k": 10}, timeout=60)
        dt = time.time() - t0
        assert r.status_code == 200, r.text[:200]
        with lock:
            lat.append(dt)

    if concurrency == 1 and not burst_every:
        with httpx.Client() as client:
            i = 0
            while time.time() < stop:
                one(i, client)
                i += 1
                if gap_s:
                    time.sleep(gap_s)
        return lat

    with httpx.Client() as client, ThreadPoolExecutor(concurrency) as ex:
        i = 0
        while time.time() < stop:
            futs = [ex.submit(one, i + j, client) for j in range(concurrency)]
            for f in futs:
                f.result()
            i += concurrency
            if gap_s:
                time.sleep(gap_s)
    return lat


def drive_flood_phase(
    url: str,
    port: int,
    queries: list[str],
    seconds: float,
    flood_connections: int,
) -> dict:
    """Connection-flood phase: open ``flood_connections`` idle sockets (slow
    clients that never send a request), then keep driving legitimate traffic.

    With the bounded server (api/http.py::BoundedThreadingHTTPServer) the
    idle sockets saturate the worker slots, excess legitimate requests get a
    fast 503 instead of queuing, and the per-connection socket timeout
    reclaims the flooded slots — after which traffic must succeed again.
    Returns outcome counts + latency stats of successful requests.
    """
    import socket as socket_mod

    import httpx

    flood: list = []
    for _ in range(flood_connections):
        try:
            flood.append(socket_mod.create_connection(("127.0.0.1", port), timeout=5))
        except OSError:
            break

    ok_lat: list[float] = []
    n_503 = 0
    n_err = 0
    stop = time.time() + seconds
    with httpx.Client() as client:
        i = 0
        while time.time() < stop:
            q = queries[i % len(queries)]
            t0 = time.time()
            try:
                r = client.post(
                    f"{url}/recommend", json={"user_context": q, "top_k": 10}, timeout=10
                )
                if r.status_code == 200:
                    ok_lat.append(time.time() - t0)
                elif r.status_code == 503:
                    n_503 += 1
                else:
                    n_err += 1
            except httpx.HTTPError:
                n_err += 1
            i += 1
            time.sleep(0.05)
    for s in flood:
        try:
            s.close()
        except OSError:
            pass
    return {
        "flood_connections": len(flood),
        "n_ok": len(ok_lat),
        "n_503": n_503,
        "n_err": n_err,
        **{k: v for k, v in pct(ok_lat).items() if k != "n"},
    }


def pct(lat: list[float]) -> dict:
    if not lat:
        return {"n": 0}
    ms = np.asarray(lat) * 1e3
    return {
        "n": len(lat),
        "p50_ms": round(float(np.percentile(ms, 50)), 2),
        "p95_ms": round(float(np.percentile(ms, 95)), 2),
        "p99_ms": round(float(np.percentile(ms, 99)), 2),
    }


def main() -> None:
    parser = argparse.ArgumentParser(description="HTTP serve-path tail-latency soak")
    parser.add_argument("--workdir", type=Path, default=Path("soak_workspace"))
    parser.add_argument("--products", type=int, default=5000)
    parser.add_argument("--phase-seconds", type=float, default=20.0)
    parser.add_argument("--burst-threads", type=int, default=16)
    parser.add_argument("--window-ms", type=float, default=4.0)
    parser.add_argument("--port", type=int, default=8191)
    parser.add_argument(
        "--flood-connections", type=int, default=96,
        help="idle connections opened in the flood phase (> max-concurrency "
        "saturates the worker slots); 0 skips the phase",
    )
    parser.add_argument("--max-concurrency", type=int, default=64)
    parser.add_argument(
        "--socket-timeout", type=float, default=5.0,
        help="server-side per-connection socket timeout (s); the flood "
        "phase relies on this to reclaim slots held by idle clients",
    )
    parser.add_argument(
        "--platform", default="default", choices=["default", "cpu"],
        help="cpu = single-CPU-device backend (CI); default = this "
        "machine's default (the real chip). Must be applied via jax.config "
        "before first backend use — env vars alone don't switch backends "
        "when a site hook pins JAX_PLATFORMS.",
    )
    args = parser.parse_args()

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 1)

    from instacart_next_order_recommendation_tpu.utils import setup_colored_logging
    from instacart_next_order_recommendation_tpu.utils.cache import (
        enable_compilation_cache,
    )

    setup_colored_logging(quiet_loggers=["jax", "httpx", "recommender.metrics", "api"])
    enable_compilation_cache()
    args.workdir.mkdir(parents=True, exist_ok=True)
    model_dir, corpus_path, queries = build_workspace(args.workdir, args.products)

    os.environ["FEEDBACK_DB_PATH"] = str(args.workdir / "feedback.db")
    os.environ["BATCH_WINDOW_MS"] = str(args.window_ms)
    # Load test: the production default (100/minute) would 429 the soak
    # within the first second on real hardware.
    os.environ.setdefault("RATE_LIMIT", "10000000/minute")
    from instacart_next_order_recommendation_tpu.api import create_app
    from instacart_next_order_recommendation_tpu.api.http import serve

    app = create_app(model_dir=model_dir, corpus_path=corpus_path)
    threading.Thread(
        target=serve,
        args=(app, "127.0.0.1", args.port),
        kwargs={
            "max_concurrency": args.max_concurrency,
            "socket_timeout": args.socket_timeout,
        },
        daemon=True,
    ).start()
    url = f"http://127.0.0.1:{args.port}"

    import httpx

    for _ in range(900):
        try:
            if httpx.get(f"{url}/ready", timeout=2).json().get("status") == "ready":
                break
        except Exception:  # noqa: BLE001 - server still starting
            pass
        time.sleep(0.2)
    else:
        raise RuntimeError(
            "server did not become ready in 180s (model load / device init "
            "stalled?) — see logs above"
        )

    batcher = app.state["recommender"]  # MicroBatcher when BATCH_WINDOW_MS > 0
    have_counters = hasattr(batcher, "decision_counts")

    # Warm the serve program lattice BEFORE timing (what a production
    # deployment gets from PRECOMPILE_ON_STARTUP): on remote-compile
    # backends even a persistent-cache hit costs seconds of per-process
    # executable load per program, and the soak's early phases would
    # otherwise measure those stalls instead of steady-state latency.
    from instacart_next_order_recommendation_tpu.serve.precompile import (
        BATCH_BUCKETS,
        warm_serve_shapes,
    )

    rec = getattr(batcher, "_rec", batcher)
    t0 = time.time()
    n_warm = warm_serve_shapes(
        rec,
        k_buckets=(16,),  # the soak's top_k=10 rounds up to bucket 16
        batch_buckets=tuple(b for b in BATCH_BUCKETS if b <= max(16, args.burst_threads)),
        with_filters=False,
    )
    print(f"warmed {n_warm} serve programs in {time.time() - t0:.1f}s",
          file=_sys.stderr, flush=True)

    def snapshot() -> dict:
        if not have_counters:
            return {}
        return {
            "decisions": dict(batcher.decision_counts),
            "drains": dict(sorted(batcher.drain_sizes.items())),
        }

    # Brief traffic warm-up: the serve PROGRAMS are already warmed by
    # warm_serve_shapes above; this only primes the HTTP/batcher path
    # (client connection pool, limiter/batcher state, first-request
    # plumbing) so phase timings start from steady state.
    drive_phase(url, queries, seconds=1.0, concurrency=args.burst_threads)

    phases = [
        # (name, concurrency, gap_s, description)
        ("lone", 1, 0.05, "sequential client, 50 ms think time"),
        ("burst", args.burst_threads, 0.0, "sustained closed-loop bursts"),
        ("mixed", args.burst_threads, 1.2, "bursts separated by >1 s idle gaps"),
        ("lone_after_burst", 1, 0.05, "sequential again: window must disengage"),
    ]
    summary: dict = {
        "metric": "serve_soak",
        "window_ms": args.window_ms,
        "burst_threads": args.burst_threads,
        "phases": {},
    }
    for name, conc, gap, desc in phases:
        before = snapshot()
        lat = drive_phase(url, queries, args.phase_seconds, conc, gap_s=gap)
        after = snapshot()
        delta = {}
        if have_counters:
            delta = {
                "windowed": after["decisions"]["windowed"] - before["decisions"]["windowed"],
                "immediate": after["decisions"]["immediate"] - before["decisions"]["immediate"],
                "coalesced_drains": sum(
                    c - before["drains"].get(s, 0)
                    for s, c in after["drains"].items()
                    if s > 1
                ),
            }
        row = {"desc": desc, **pct(lat), **delta}
        summary["phases"][name] = row
        print(json.dumps({"phase": name, **row}), flush=True)

    # Latch checks (reported, and asserted by tests/test_soak.py on a scaled-
    # down run): bursts must coalesce; lone traffic after bursts must not pay
    # windows indefinitely.
    burst_row = summary["phases"]["burst"]
    lone_after = summary["phases"]["lone_after_burst"]
    summary["no_batch1_latch"] = bool(burst_row.get("coalesced_drains", 1) > 0)
    if "windowed" in lone_after and lone_after["n"] > 0:
        summary["no_window_latch"] = bool(
            lone_after["windowed"] <= max(3, 0.05 * lone_after["n"])
        )

    # Connection-flood phase (after the latch checks so the flood can't
    # perturb them): idle sockets saturate the bounded worker pool; the
    # server must shed load with fast 503s, reclaim slots via the socket
    # timeout, and then serve normally again.
    if args.flood_connections > 0:
        flood_row = drive_flood_phase(
            url, args.port, queries,
            seconds=max(args.phase_seconds, 3 * args.socket_timeout),
            flood_connections=args.flood_connections,
        )
        recover = pct(drive_phase(url, queries, seconds=min(args.phase_seconds, 10.0),
                                  concurrency=1, gap_s=0.05))
        flood_row["recovered_p50_ms"] = recover.get("p50_ms")
        summary["phases"]["flood"] = flood_row
        # Survival = some requests completed despite the flood AND the
        # post-flood sequential phase looks like the pre-burst lone phase.
        summary["flood_survived"] = bool(
            flood_row["n_ok"] > 0 and recover.get("n", 0) > 0
        )
        print(json.dumps({"phase": "flood", **flood_row}), flush=True)

    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
