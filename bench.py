"""Headline benchmark: full-catalog retrieval serve throughput on one chip.

Measures the end-to-end serve path of the TPU-native engine — host WordPiece
tokenization -> tower encode (batched) -> fused cosine top-10 over a
50k-product catalog — and reports queries/sec/chip.

Baseline: the reference serves one query in 119.9 ms end-to-end (85.0 ms
encode + 9.4 ms similarity; reference README.md:433-441, recorded in
BASELINE.md) = 8.34 queries/s. The BASELINE.json target is >=5x that.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "queries/s", "vs_baseline": N/8.34, ...}
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

# Repo-local compiled-program artifacts: the persistent XLA cache AND the
# AOT-serialized serve executables ship WITH the repo (artifacts/), so a
# bench run on a fresh machine with a matching device/JAX build answers
# without the multi-minute remote-compile wall — the serving-image recipe
# (serve/aot.py) applied to the bench itself. Explicit env always wins;
# a device/JAX mismatch is a clean miss that falls back to compiling.
# Applied only when RUN as the bench (__main__ below) — importing this
# module for its workload builders must not mutate the process env.
_ARTIFACTS = Path(__file__).resolve().parent / "artifacts"
_DEFAULTED_AOT_EXPORT = "ITOR_AOT_EXPORT" not in os.environ


def _pin_repo_artifacts() -> None:
    os.environ.setdefault("ITOR_COMPILATION_CACHE", str(_ARTIFACTS / "xla_cache"))
    os.environ.setdefault("ITOR_AOT_DIR", str(_ARTIFACTS / "aot"))
    os.environ.setdefault("ITOR_AOT_EXPORT", "1")

REFERENCE_QPS = 1000.0 / 119.9  # reference end-to-end serve latency
CATALOG_SIZE = 50_000
N_QUERIES = 8192
# Serve batch: 256 default; ITOR_BENCH_SERVE_BATCH overrides for ceiling
# experiments (512 compiles fine as of r3 — the r2 compile pathology was
# specific to Pallas-in-scan graphs, not plain fused programs).
SERVE_BATCH = int(os.getenv("ITOR_BENCH_SERVE_BATCH", "256"))
# Catalog-encode batch. r2 kept this at 256 because large fused programs
# compiled pathologically through the remote compile service; r3 re-measured
# plain (non-scan) fused programs compiling in seconds at B=512, and product
# texts are short (S<=64 buckets) where B=512 measures +8% device-side.
CATALOG_BATCH = int(os.getenv("ITOR_BENCH_CATALOG_BATCH", "256"))
TOP_K = 10


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def build_catalog_texts(n: int, rng: np.random.Generator) -> list[str]:
    adjectives = [
        "Organic", "Fresh", "Whole", "Natural", "Classic", "Golden", "Premium",
        "Sweet", "Crunchy", "Creamy", "Roasted", "Smoked", "Wild", "Baked",
    ]
    nouns = [
        "Milk", "Bread", "Banana", "Yogurt", "Cheese", "Chicken", "Broccoli",
        "Rice", "Coffee", "Granola", "Pasta", "Sauce", "Parmesan", "Apple",
    ]
    aisles = ["fresh fruits", "milk", "bread", "cereal", "coffee", "pasta sauce"]
    depts = ["produce", "dairy eggs", "bakery", "beverages", "pantry"]
    out = []
    for i in range(n):
        name = f"{rng.choice(adjectives)} {rng.choice(nouns)} {i}"
        out.append(
            f"Product: {name}. Aisle: {rng.choice(aisles)}. Department: {rng.choice(depts)}."
        )
    return out


def build_query_texts(n: int, catalog: list[str], rng: np.random.Generator) -> list[str]:
    """User-context-shaped queries: [+Nd wDhH] name, name; ... (serve-time form)."""
    names = [t.split("Product: ")[1].split(".")[0] for t in catalog]
    out = []
    for _ in range(n):
        segments = []
        for _ in range(int(rng.integers(1, 6))):
            k = int(rng.integers(2, 7))
            prods = rng.choice(len(names), size=k, replace=False)
            prefix = f"+{int(rng.integers(1, 30))}d w{int(rng.integers(0, 7))}h{int(rng.integers(0, 24))}"
            segments.append(f"[{prefix}] " + ", ".join(names[j] for j in prods))
        out.append("; ".join(segments) + ".")
    return out


def main() -> None:
    import jax
    import jax.numpy as jnp

    from instacart_next_order_recommendation_tpu.models import MINILM_L6, init_params
    from instacart_next_order_recommendation_tpu.models.text_encoder import TextEncoder
    from instacart_next_order_recommendation_tpu.index import ShardedCatalogIndex
    from instacart_next_order_recommendation_tpu.tokenizer import WordPieceTokenizer

    from instacart_next_order_recommendation_tpu.utils.cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    # Only export AOT executables by default when this device/JAX build's
    # fingerprint directory already ships in artifacts/ — a bench run on a
    # different machine must not grow the working tree with a parallel set
    # of fingerprint-namespaced executables. Explicit ITOR_AOT_EXPORT wins.
    if _DEFAULTED_AOT_EXPORT:
        from instacart_next_order_recommendation_tpu.serve.aot import AotStore

        fp_dir = AotStore(_ARTIFACTS / "aot").root
        if not fp_dir.exists():
            os.environ["ITOR_AOT_EXPORT"] = "0"
            log(f"AOT export off (no shipped store for this fingerprint: {fp_dir.name})")

    # --- build model + catalog ------------------------------------------------
    t0 = time.time()
    catalog_texts = build_catalog_texts(CATALOG_SIZE, rng)
    query_texts = build_query_texts(N_QUERIES, catalog_texts, rng)
    tokenizer = WordPieceTokenizer.train(catalog_texts, vocab_size=30_000)
    config = dataclasses.replace(MINILM_L6, vocab_size=tokenizer.vocab_size)
    params = init_params(config, jax.random.key(0))
    encoder = TextEncoder(params, config, tokenizer, max_seq_length=256)
    log(f"setup {time.time() - t0:.1f}s (vocab {tokenizer.vocab_size})")

    from concurrent.futures import ThreadPoolExecutor

    from instacart_next_order_recommendation_tpu.serve.pipeline import (
        FusedServePipeline,
    )

    # --- parallel cold-start warm-up ------------------------------------------
    # Compile every program the bench dispatches BEFORE any timed section.
    # Cold compiles go through a remote compile service on this setup and each
    # fused-tower program takes minutes; the service compiles concurrently
    # (measured: two programs in the wall time of one), so a thread pool turns
    # ~15 min of serial compiles into roughly the slowest single one. Every
    # result lands in the persistent compilation cache (utils/cache.py), so on
    # a warm machine this whole phase is a few seconds of cache hits.
    sorted_queries = sorted(query_texts, key=len)  # see serve section below
    serve_shapes = {(1, 256)}  # single-query latency section
    serve_shape_counts: dict[tuple, int] = {}  # workload mix, for device-side q/s
    for lo in range(0, N_QUERIES, SERVE_BATCH):
        wids, _ = tokenizer.encode_batch(
            sorted_queries[lo : lo + SERVE_BATCH],
            max_seq_length=256,
            pad_batch_to=SERVE_BATCH,
        )
        serve_shapes.add(wids.shape)
        serve_shape_counts[wids.shape] = serve_shape_counts.get(wids.shape, 0) + 1
    # Dummy-catalog pipeline: compiled programs depend only on shapes, and the
    # real pipeline's identical programs resolve via the persistent cache.
    warm_pipeline = FusedServePipeline(
        params,
        config,
        jnp.zeros((CATALOG_SIZE, config.hidden_size), jnp.float32),
        CATALOG_SIZE,
        pad_id=tokenizer.pad_id,
    )

    def warm_fused(shape):
        wids = np.zeros(shape, np.int16)
        wids[:, :4] = 7  # a few non-pad tokens
        packed, _ = warm_pipeline.topk_device(wids, None, TOP_K)
        np.asarray(packed)

    def warm_device_encode():
        # encode at [1, 256]: the device-side latency section (AOT-keyed).
        wids, _ = tokenizer.encode_batch(
            query_texts[:1], max_seq_length=256, pad_to=256
        )
        np.asarray(
            encoder._run_encode(jnp.asarray(wids.astype(encoder.wire_dtype)))
        )

    # Catalog-encode warm-up must cover every seq bucket the timed
    # encode_resident can hit: it length-sorts all texts into CATALOG_BATCH
    # chunks and each chunk pads to its own bucket, so enumerate the chunks'
    # actual tokenized shapes (tokenization is cheap) and warm one
    # representative chunk per distinct shape.
    sorted_catalog = sorted(catalog_texts, key=len)  # same stable order as encode_resident
    catalog_chunk_by_shape: dict[tuple, int] = {}
    for lo in range(0, CATALOG_SIZE, CATALOG_BATCH):
        cids, _ = tokenizer.encode_batch(
            sorted_catalog[lo : lo + CATALOG_BATCH],
            max_seq_length=256,
            pad_batch_to=CATALOG_BATCH,
        )
        catalog_chunk_by_shape.setdefault(cids.shape, lo)
    t0 = time.time()
    ex = ThreadPoolExecutor(len(serve_shapes) + len(catalog_chunk_by_shape) + 1)
    jobs = [
        # catalog-bucket encode programs (index build path)
        ex.submit(
            encoder.encode,
            sorted_catalog[lo : lo + CATALOG_BATCH],
            batch_size=CATALOG_BATCH,
        )
        for lo in catalog_chunk_by_shape.values()
    ] + [
        ex.submit(warm_device_encode),
    ]
    jobs += [ex.submit(warm_fused, s) for s in sorted(serve_shapes)]

    def warm_resident_chain():
        # The timed catalog encode is pipelined encode_resident: besides the
        # per-bucket encode programs (warmed above), its device-side
        # concatenate of ceil(N/CATALOG_BATCH) chunks and the un-permute
        # gather are their own XLA programs — cold they cost seconds, which
        # the r4 pipelining made the dominant term (14.6k vs ~87k
        # products/s warm). Run the full chain once here so the timed
        # section measures steady-state.
        np.asarray(
            encoder.encode_resident(catalog_texts, batch_size=CATALOG_BATCH)[0]
        )

    jobs.append(ex.submit(warm_resident_chain))
    # Bounded wait: a single wedged remote-compile RPC must not hang the
    # whole bench (observed once on a cold export run — every executable was
    # written but one future never resolved). Stragglers are logged and their
    # programs compile lazily inside the timed sections (slower, correct);
    # the wedged worker thread is abandoned (non-blocking shutdown + hard
    # exit at the end so interpreter shutdown never joins it).
    from concurrent.futures import wait as fwait

    done, not_done = fwait(jobs, timeout=1200)
    for j in done:
        j.result()  # surface real failures
    straggling_warmup = bool(not_done)
    if straggling_warmup:
        log(f"WARNING: {len(not_done)} warm-up compiles still pending after 1200s; proceeding")
    ex.shutdown(wait=False, cancel_futures=True)
    log(f"warm-up compiles: {time.time() - t0:.1f}s ({len(jobs)} programs)")

    # --- tunnel RTT floor -----------------------------------------------------
    # One trivial dispatch+readback, repeated: the floor every e2e number
    # below pays per round trip. Naive block_until_ready timing lies through
    # this environment's tunnel (returns early), but a tiny f(x)=x+1 with a
    # host readback is a true round trip. Recording it makes the headline
    # attributable: if e2e q/s moves while the device-side number (below)
    # holds, the tunnel moved, not the serve path.
    f_nop = jax.jit(lambda x: x + 1.0)
    x0 = jnp.zeros(())
    float(f_nop(x0))  # compile
    rtts = []
    for _ in range(15):
        t0 = time.time()
        float(f_nop(x0))
        rtts.append(time.time() - t0)
    rtt_s = float(np.median(rtts))
    log(f"tunnel dispatch+readback RTT floor: {rtt_s*1e3:.2f} ms")

    # --- catalog encode (index build) ----------------------------------------
    # Device-resident build: embeddings never cross the wire — the index
    # consumes them on device (encode_resident). Shape bucket warmed above.
    t0 = time.time()
    catalog_emb = encoder.encode_resident(catalog_texts, batch_size=CATALOG_BATCH)
    np.asarray(catalog_emb[0])  # force materialization (timing fence)
    catalog_encode_s = time.time() - t0
    log(f"catalog encode (device-resident): {CATALOG_SIZE / catalog_encode_s:.0f} products/s")

    index = ShardedCatalogIndex(catalog_emb, mesh=None)
    index.topk(np.asarray(catalog_emb[:SERVE_BATCH]), TOP_K)  # warm the topk jit

    # --- end-to-end serve throughput (pipelined) ------------------------------
    fused = FusedServePipeline(
        params, config, index._catalog, CATALOG_SIZE, pad_id=tokenizer.pad_id
    )

    # Length-sorted batching (sorted_queries above): group similar-length
    # queries so each batch pads to the smallest length bucket that fits it
    # (one long query no longer drags a whole batch to seq 256). Standard
    # batch-serve practice; results are identical per query (padding is
    # masked end to end).

    def serve_batch(lo: int) -> np.ndarray:
        batch = sorted_queries[lo : lo + SERVE_BATCH]
        ids, mask = tokenizer.encode_batch(batch, max_seq_length=256, pad_batch_to=SERVE_BATCH)
        packed, k = fused.topk_device(ids, mask, TOP_K)
        _, idx = fused.unpack(np.asarray(packed), k)
        return idx[: len(batch)]

    for lo in range(0, N_QUERIES, SERVE_BATCH):
        serve_batch(lo)  # pull every bucket program into this jit cache (hot)

    # Staged pipeline (r5). The r4 shape — 16 identical threads each doing
    # tokenize+dispatch+readback — left e2e at 84% of the device ceiling,
    # and the host budget explains why: tokenizing the 8192-query workload
    # costs 187 ms single-thread vs 226 ms of device time, and on this
    # 2-core host 16 threads tokenize SLOWER than 2 (212 vs 108 ms — GIL +
    # core contention), so the chip starved while threads fought over the
    # tokenizer. Dedicated stages instead: 2 tokenizer workers (the
    # measured sweet spot for 2 cores) feed a bounded queue; 1 dispatcher
    # drains it keeping batches in flight on the device (dispatch is
    # async — the int16 id upload of batch N+1 overlaps batch N's
    # execution natively); a small reader pool absorbs the ~28 ms
    # per-readback tunnel latency. Work per query is identical to
    # serve_batch above. A single slow tunnel round trip can still swing
    # one ~0.25 s pass — measure five passes, report the median.
    n_readers = int(os.getenv("ITOR_BENCH_THREADS", "6"))
    n_tok = int(os.getenv("ITOR_BENCH_TOK_THREADS", "2"))
    import queue as _queue

    batch_los = list(range(0, N_QUERIES, SERVE_BATCH))

    def run_pass() -> tuple[int, float]:
        tok_q: _queue.Queue = _queue.Queue(maxsize=8)
        disp_q: _queue.Queue = _queue.Queue()
        results: list = [None] * len(batch_los)
        t0 = time.time()

        def tok_worker(widx: int) -> None:
            for i in range(widx, len(batch_los), n_tok):
                lo = batch_los[i]
                batch = sorted_queries[lo : lo + SERVE_BATCH]
                ids, _ = tokenizer.encode_batch(
                    batch, max_seq_length=256, pad_batch_to=SERVE_BATCH
                )
                tok_q.put((i, ids, len(batch)))

        def dispatcher() -> None:
            for _ in batch_los:
                i, ids, n_valid_rows = tok_q.get()
                packed, k = fused.topk_device(ids, None, TOP_K)
                disp_q.put((i, packed, k, n_valid_rows))
            for _ in range(n_readers):
                disp_q.put(None)

        def reader() -> int:
            served = 0
            while True:
                item = disp_q.get()
                if item is None:
                    return served
                i, packed, k, n_valid_rows = item
                _, idx = fused.unpack(np.asarray(packed), k)
                results[i] = idx[:n_valid_rows]
                served += n_valid_rows
            return served

        with ThreadPoolExecutor(n_tok + 1 + n_readers) as pex:
            tok_jobs = [pex.submit(tok_worker, w) for w in range(n_tok)]
            disp_job = pex.submit(dispatcher)
            read_jobs = [pex.submit(reader) for _ in range(n_readers)]
            n_served = sum(j.result() for j in read_jobs)
            disp_job.result()
            for j in tok_jobs:
                j.result()
        assert all(r is not None for r in results)
        return n_served, time.time() - t0

    passes = []
    for p in range(5):
        n_served, elapsed = run_pass()
        passes.append(n_served / elapsed)
        log(f"pass {p + 1}: served {n_served} queries in {elapsed:.2f}s -> {passes[-1]:.0f} q/s")
    qps = float(np.median(passes))
    spread_pct = 100.0 * (max(passes) - min(passes)) / qps
    log(f"median of {len(passes)} passes: {qps:.0f} q/s (spread {spread_pct:.1f}%)")

    # --- device-side serve throughput (tunnel-invariant) ----------------------
    # The e2e number above rides the tunnel: host tokenization, upload,
    # readback, thread scheduling. This section times the chip alone on the
    # SAME workload mix — R data-dependent dispatches of the fused program
    # per seq bucket, one readback, minus the RTT floor — then weights each
    # bucket's per-batch time by its frequency in the 8192-query workload.
    # If this number is stable across rounds, any e2e drift is tunnel/host
    # state, not a serve-path regression.
    R_CHAIN = 8
    device_s_total = 0.0
    bucket_ms: dict[str, float] = {}
    for (b, s), n_batches in sorted(serve_shape_counts.items()):
        ids_np = np.zeros((b, s), np.int16)
        ids_np[:, : max(4, s // 2)] = 7
        ids0 = jnp.asarray(ids_np)
        run_fn = fused._fn(TOP_K)

        def chain_once(_run=run_fn, _ids=ids0):
            c = jnp.zeros((), jnp.int32)
            t0 = time.time()
            for _ in range(R_CHAIN):
                packed = _run(params, _ids + (jnp.abs(c) % 2).astype(_ids.dtype), fused.catalog)
                c = packed[0, 0]
            int(c)  # one readback fences the whole chain
            return time.time() - t0

        chain_once()  # warm (program already compiled in warm-up; prime caches)
        per_batch_s = max(
            1e-9, (min(chain_once() for _ in range(3)) - rtt_s) / R_CHAIN
        )
        bucket_ms[f"{b}x{s}"] = round(per_batch_s * 1e3, 3)
        device_s_total += n_batches * per_batch_s
    device_qps = N_QUERIES / device_s_total if device_s_total > 0 else 0.0
    log(
        f"device-side serve throughput: {device_qps:.0f} q/s "
        f"(per-batch ms by bucket: {bucket_ms})"
    )

    # --- single-query latency -------------------------------------------------
    # (a) end-to-end from text (includes host<->device round trips — on
    # tunneled TPU setups this is dominated by RTT, not compute).
    # Tail attribution (r3 verdict: p95/p99 were recorded but unexplained —
    # 13x p50 with no evidence for tunnel vs serve path): interleave an RTT
    # probe (the same f(x)=x+1 dispatch+readback as the floor above) between
    # e2e requests. A tunnel spike hits the adjacent probe the same way it
    # hits the request; if the probe's tail tracks the e2e tail while the
    # resident-input device tail (below) stays flat, the tail is the tunnel.
    ids1, mask1 = tokenizer.encode_batch(query_texts[:1], max_seq_length=256, pad_to=256)
    fused.topk(ids1, mask1, TOP_K)  # warm batch-1 fused program
    lat, rtt_probe = [], []
    for i in range(100):
        t0 = time.time()
        ids1, mask1 = tokenizer.encode_batch(
            query_texts[i : i + 1], max_seq_length=256, pad_to=256
        )
        fused.topk(ids1, mask1, TOP_K)
        lat.append(time.time() - t0)
        t0 = time.time()
        float(f_nop(x0))
        rtt_probe.append(time.time() - t0)
    p50_ms = float(np.median(lat) * 1000)
    p95_ms = float(np.percentile(lat, 95) * 1000)
    p99_ms = float(np.percentile(lat, 99) * 1000)
    rtt_p95_ms = float(np.percentile(rtt_probe, 95) * 1000)
    rtt_p99_ms = float(np.percentile(rtt_probe, 99) * 1000)
    # Fraction of probe samples that spiked past 3x the session RTT floor:
    # the tunnel's share of the tail, independent of the serve path.
    rtt_spike_frac = float(np.mean(np.asarray(rtt_probe) > 3 * rtt_s))
    log(
        f"single-query e2e latency: p50 {p50_ms:.2f} ms, "
        f"p95 {p95_ms:.2f} ms, p99 {p99_ms:.2f} ms"
    )
    log(
        f"interleaved RTT probe: p95 {rtt_p95_ms:.2f} ms, p99 {rtt_p99_ms:.2f} ms, "
        f"spike fraction (>3x floor): {rtt_spike_frac:.2f}"
    )

    # (b) device-side latency with resident inputs (the chip's actual cost),
    # now with enough samples for a tail. Measured BOTH ways to attribute
    # the tail (r4 verdict: device p99 40.3 ms vs p95 27.1 while e2e p99 was
    # LOWER — unexplained): the two-dispatch variant (separate encode and
    # top-k programs, as the sharded-index serve path runs) sends two RPCs
    # through the tunnel per sample, so per-dispatch jitter hits it twice;
    # the fused single-dispatch variant (the actual lone-request serve path)
    # sends one. If the 2-dispatch tail spikes while the 1-dispatch tail
    # stays at the RTT probe's tail, the spike is tunnel RPC jitter ×
    # dispatch count, not the serve path.
    ids, _ = tokenizer.encode_batch(query_texts[:1], max_seq_length=256, pad_to=256)
    ids_d = jnp.asarray(ids.astype(encoder.wire_dtype))
    ids_np1 = ids.astype(np.int16)
    fused_run = fused._fn(TOP_K)

    def device_once():
        e = encoder._run_encode(ids_d)
        return index.topk_device(e, TOP_K)

    def fused_once():
        return fused_run(params, jnp.asarray(ids_np1), fused.catalog)

    jax.block_until_ready(device_once())
    jax.block_until_ready(fused_once())
    lat, lat_fused = [], []
    for _ in range(100):
        t0 = time.time()
        jax.block_until_ready(device_once())
        lat.append(time.time() - t0)
        t0 = time.time()
        jax.block_until_ready(fused_once())
        lat_fused.append(time.time() - t0)
    device_p50_ms = float(np.median(lat) * 1000)
    device_p95_ms = float(np.percentile(lat, 95) * 1000)
    device_p99_ms = float(np.percentile(lat, 99) * 1000)
    fused_p50_ms = float(np.median(lat_fused) * 1000)
    fused_p95_ms = float(np.percentile(lat_fused, 95) * 1000)
    fused_p99_ms = float(np.percentile(lat_fused, 99) * 1000)
    log(
        f"single-query device latency (2-dispatch): p50 {device_p50_ms:.2f} ms, "
        f"p95 {device_p95_ms:.2f} ms, p99 {device_p99_ms:.2f} ms"
    )
    log(
        f"single-query device latency (fused 1-dispatch): p50 {fused_p50_ms:.2f} ms, "
        f"p95 {fused_p95_ms:.2f} ms, p99 {fused_p99_ms:.2f} ms"
    )

    result = {
        "metric": "serve_queries_per_sec_per_chip",
        "value": round(qps, 1),
        "unit": "queries/s",
        "vs_baseline": round(qps / REFERENCE_QPS, 1),
        "details": {
            "catalog_size": CATALOG_SIZE,
            "top_k": TOP_K,
            "serve_batch": SERVE_BATCH,
            "single_query_p50_ms": round(p50_ms, 2),
            "single_query_p95_ms": round(p95_ms, 2),
            "single_query_p99_ms": round(p99_ms, 2),
            "single_query_device_p50_ms": round(device_p50_ms, 2),
            # Tail attribution: device tail on resident inputs (serve-path
            # share) vs interleaved RTT-probe tail (tunnel share) — if
            # e2e p99 >> device p99 and the probe tail tracks it, the
            # single-query tail is tunnel jitter, not the serve path.
            "single_query_device_p95_ms": round(device_p95_ms, 2),
            "single_query_device_p99_ms": round(device_p99_ms, 2),
            # The serving lone-request path (fused encode+top-k, ONE
            # dispatch) — its tail vs the 2-dispatch tail above separates
            # per-dispatch tunnel jitter from serve-path cost.
            "single_query_fused_p50_ms": round(fused_p50_ms, 2),
            "single_query_fused_p95_ms": round(fused_p95_ms, 2),
            "single_query_fused_p99_ms": round(fused_p99_ms, 2),
            "rtt_probe_p95_ms": round(rtt_p95_ms, 2),
            "rtt_probe_p99_ms": round(rtt_p99_ms, 2),
            "rtt_spike_fraction": round(rtt_spike_frac, 3),
            "catalog_encode_products_per_sec": round(CATALOG_SIZE / catalog_encode_s, 1),
            # Attribution block: device_qps is tunnel-invariant (chained
            # dispatch minus RTT floor on the same workload mix). If it holds
            # while the e2e headline moves, the tunnel/host moved, not the
            # serve path.
            "device_qps": round(device_qps, 1),
            "device_ms_per_batch_by_bucket": bucket_ms,
            "tunnel_rtt_ms": round(rtt_s * 1e3, 2),
            "passes_qps": [round(p, 1) for p in passes],
            "pass_spread_pct": round(spread_pct, 1),
            "straggling_warmup": straggling_warmup,
            "baseline_qps": round(REFERENCE_QPS, 2),
            "baseline_source": "reference README.md:433-441 (119.9 ms/query)",
        },
    }
    print(json.dumps(result))
    if straggling_warmup:
        # A wedged warm-up thread would block interpreter shutdown's thread
        # join; results are already printed, so exit hard.
        sys.stdout.flush()
        sys.stderr.flush()
        import os as _os

        _os._exit(0)


if __name__ == "__main__":
    _pin_repo_artifacts()
    if "--ivf" in sys.argv:
        # IVF ANN sweep at a 1M-product catalog (recall@10-vs-exact + q/s);
        # the exact scan above stays the headline metric and default. The
        # sweep must NOT export into the shipped AOT store by default — its
        # dozens of multi-MB 1M-catalog executables are sweep-only (the
        # headline program set is what artifacts/ is for). An explicit
        # ITOR_AOT_EXPORT env still wins.
        if _DEFAULTED_AOT_EXPORT:
            os.environ["ITOR_AOT_EXPORT"] = "0"
        from scripts.bench_ivf import main as ivf_main

        ivf_main()
    else:
        main()
