"""Serve-path AOT precompilation.

First requests against a fresh serving process pay XLA compile latency
(tens of seconds through a remote compiler) once per (batch, seq, k) shape.
This tool walks the serve shape lattice ahead of traffic and compiles every
program the process can hit, populating the persistent compilation cache
(utils/cache.py) — the serving analog of the reference's model warm-up-less
cold start (/root/reference/src/api/main.py:52-86 loads the model but still
compiles nothing ahead of the first query).

Two uses:
- **Image builds / deploy hooks**: ``python -m
  instacart_next_order_recommendation_tpu.serve.precompile --config
  configs/inference.yaml`` bakes a hot compile cache into the serving image.
- **Startup**: ``PRECOMPILE_ON_STARTUP=1`` makes the API server warm the
  lattice right after the model loads, before flipping /ready.
"""

from __future__ import annotations

import argparse
import logging
import time
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

# The shape lattice the serve path can hit — the SINGLE source of truth:
# request top-k rounds up to K_BUCKETS (recommender._k_bucket, also used by
# the micro-batcher) and micro-batches round up to BATCH_BUCKETS rows
# (serve/batching imports both from here, so startup warming always covers
# every shape the serve path can dispatch).
K_BUCKETS = (16, 32, 64, 128, 256)
BATCH_BUCKETS = (1, 2, 4, 8, 16, 32, 64)


def warm_serve_shapes(
    recommender,
    k_buckets: tuple[int, ...] = K_BUCKETS,
    batch_buckets: tuple[int, ...] = (1,),
    with_filters: bool = True,
    jobs: int | None = None,
) -> int:
    """Compile every (batch, seq, k) serve program; returns the program count.

    The seq axis matters: queries pad to the tokenizer's static length
    buckets, and each bucket is its own XLA program — warming only one seq
    shape leaves real traffic paying compiles (or missing the AOT store).
    ``batch_buckets`` beyond 1 matter only when micro-batching is enabled
    (each coalesced batch size is its own program).

    The programs are independent, so they compile from a thread pool
    (``jobs`` threads, default up to 16): both local XLA and remote compile
    services overlap concurrent compiles, which warms a cold lattice in
    roughly the wall time of its slowest program instead of the sum —
    measured on a remote-compile TPU setup, 11 fused-tower programs at
    ~2 min each compiled in ~6 min total.
    """
    import functools
    from concurrent.futures import ThreadPoolExecutor

    import jax.numpy as jnp

    from instacart_next_order_recommendation_tpu.tokenizer.wordpiece import (
        LENGTH_BUCKETS,
    )

    if not all(hasattr(recommender, a) for a in ("encoder", "index", "product_ids")):
        return 0  # test doubles / custom recommenders: nothing to compile
    enc = recommender.encoder
    n = len(recommender.product_ids)
    max_seq = enc.max_seq_length
    seq_buckets = tuple(s for s in LENGTH_BUCKETS if s <= max_seq) or (max_seq,)
    dummy = "Product: warmup. Aisle: warmup. Department: warmup."
    t0 = time.time()

    # k values a request can actually dispatch (request top-k rounds up to
    # K_BUCKETS and is capped at the catalog size).
    k_effs: list[int] = []
    for k in k_buckets:
        k_effs.append(min(k, n))
        if k_effs[-1] == n:
            break

    def tokenize(b: int, s_len: int):
        return enc.tokenizer.encode_batch(
            [dummy] * b, max_seq_length=max_seq, pad_to=s_len, pad_batch_to=b
        )

    # Per-batch-size embeddings (encoded at the smallest seq bucket) for the
    # index jobs. Computed once in phase 1: with the AOT store in export mode
    # (--export-aot), AotStore.run bypasses jit's per-signature dedup via
    # lowered.compile(), so concurrent index jobs re-encoding the same
    # (b, seq) shape would each compile the SAME encode program.
    emb_by_batch: dict[int, np.ndarray] = {}

    def encode_job(b: int, s_len: int) -> int:
        ids, _ = tokenize(b, s_len)
        emb = enc._run_encode(jnp.asarray(ids.astype(enc.wire_dtype)))
        if s_len == seq_buckets[0]:
            emb_by_batch[b] = np.asarray(emb)
        return 1

    def fused_job(b: int, s_len: int, k_eff: int) -> int:
        ids, mask = tokenize(b, s_len)
        recommender._fused.topk(ids, mask, k_eff)
        return 1

    def index_job(b: int, k_eff: int, with_filter: bool) -> int:
        # The index program depends on (batch, k), not seq: reuse the
        # phase-1 embedding for this batch size (no re-encode, no redundant
        # AOT compile of the encode program).
        emb = emb_by_batch[b]
        if with_filter:
            recommender.index.topk(emb, k_eff, candidate_mask=np.ones(n, np.int32))
        else:
            recommender.index.topk(emb, k_eff)
        return 1

    encode_thunks = []
    index_thunks = []
    for b in batch_buckets:
        for s_len in seq_buckets:
            encode_thunks.append(functools.partial(encode_job, b, s_len))
        for k_eff in k_effs:
            index_thunks.append(functools.partial(index_job, b, k_eff, False))
            if with_filters and hasattr(recommender.index, "topk_device"):
                index_thunks.append(functools.partial(index_job, b, k_eff, True))
    if recommender._fused is not None and 1 in batch_buckets:
        # Single-dispatch serving (r4) dispatches fused programs only at
        # batch 1 (the monitored lone path and the micro-batcher's lone
        # drains; multi-request drains stay two-dispatch — their extra RTT
        # amortizes and the fused lattice is multiplicative in (b, s, k)).
        for s_len in seq_buckets:
            for k_eff in k_effs:
                encode_thunks.append(functools.partial(fused_job, 1, s_len, k_eff))

    n_jobs = max(1, jobs or min(16, len(encode_thunks) + len(index_thunks)))
    n_programs = 0
    with ThreadPoolExecutor(n_jobs) as ex:
        # Phase 1: every encode / fused-tower program (these dominate compile
        # wall time). Phase 2: index programs, reusing phase-1 embeddings.
        n_programs += sum(f.result() for f in [ex.submit(t) for t in encode_thunks])
        n_programs += sum(f.result() for f in [ex.submit(t) for t in index_thunks])
    logger.info(
        "precompiled %d serve programs (%d batch x %d seq x %d k shapes) in %.1fs",
        n_programs,
        len(batch_buckets),
        len(seq_buckets),
        len(k_buckets),
        time.time() - t0,
    )
    return n_programs


def main() -> None:
    from instacart_next_order_recommendation_tpu.serve.recommender import (
        InferenceConfig,
        Recommender,
        apply_inference_device_override,
    )
    from instacart_next_order_recommendation_tpu.utils import setup_colored_logging
    from instacart_next_order_recommendation_tpu.utils.cache import (
        enable_compilation_cache,
    )

    parser = argparse.ArgumentParser(description="Precompile the serve shape lattice")
    parser.add_argument("--config", type=Path, default=None, help="Inference YAML")
    parser.add_argument(
        "--batching", action="store_true",
        help="Also compile micro-batch shapes (BATCH_WINDOW_MS deployments).",
    )
    parser.add_argument(
        "--export-aot", type=Path, default=None, metavar="DIR",
        help="Serialize every compiled serve executable into DIR "
        "(serve/aot.py); a server started with ITOR_AOT_DIR=DIR then needs "
        "no compiler at all. Shorthand for ITOR_AOT_DIR=DIR ITOR_AOT_EXPORT=1.",
    )
    parser.add_argument(
        "--prune-stale", action="store_true",
        help="With --export-aot: delete store dirs for other device/JAX "
        "fingerprints after exporting, so baked images and repo-shipped "
        "artifacts don't accrete dead executables.",
    )
    args = parser.parse_args()
    if args.export_aot is not None:
        import os

        os.environ["ITOR_AOT_DIR"] = str(args.export_aot)
        os.environ["ITOR_AOT_EXPORT"] = "1"
    setup_colored_logging(quiet_loggers=["jax"])
    apply_inference_device_override()
    enable_compilation_cache()

    cfg = InferenceConfig.load(args.config)
    rec = Recommender(
        model_dir=cfg.model_dir,
        corpus_path=cfg.corpus,
        use_index=cfg.use_index,
        ann=cfg.ann,
        ann_nlist=cfg.ann_nlist,
        ann_nprobe=cfg.ann_nprobe,
        topk_extraction=cfg.topk_extraction,
    )
    batches = BATCH_BUCKETS if args.batching else (1,)
    n = warm_serve_shapes(rec, batch_buckets=batches)
    print(f"precompiled {n} serve programs; compilation cache is hot")

    if args.export_aot is not None:
        import json

        from instacart_next_order_recommendation_tpu.serve.aot import AotStore

        store = AotStore.from_env()
        if args.prune_stale:
            pruned = store.prune_stale()
            if pruned:
                print(f"pruned {len(pruned)} stale store dir(s): {', '.join(pruned)}")
        print("AOT store report: " + json.dumps(store.report()))


if __name__ == "__main__":
    main()
