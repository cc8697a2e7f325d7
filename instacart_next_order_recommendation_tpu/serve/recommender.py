"""Two-tower recommender serving core.

API and semantics mirror the reference Recommender/MonitoredRecommender
(/root/reference/src/inference/serve_recommendations.py:133-293):

- corpus JSON loaded preserving key order (key order IS ranking id order),
- catalog embeddings built once and cached on disk via EmbeddingIndex,
- ``recommend(query, top_k, exclude_product_ids)`` returns ``[(pid, score)]``
  with exclusion applied AFTER ranking (excluded ids never shrink the
  candidate pool before top-k — we fetch top-(k + |excluded|) instead of the
  reference's full argsort; exact same results),
- MonitoredRecommender adds per-stage timings and a structured metrics log.

TPU-native difference: similarity+top-k run as the fused Pallas kernel over a
row-sharded on-device catalog (multi-chip) instead of a full sort on one
device.
"""

from __future__ import annotations

import argparse
import json
import logging
import re
import threading
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

import jax
import numpy as np

from instacart_next_order_recommendation_tpu.constants import (
    DEFAULT_CONFIG_INFERENCE,
    DEFAULT_CORPUS_PATH,
    DEFAULT_MODEL_DIR,
    DEMO_QUERY,
    EVAL_QUERIES_FILENAME,
)
from instacart_next_order_recommendation_tpu.index import EmbeddingIndex, ShardedCatalogIndex
from instacart_next_order_recommendation_tpu.models.text_encoder import TextEncoder
from instacart_next_order_recommendation_tpu.parallel import MeshConfig, build_mesh
from instacart_next_order_recommendation_tpu.utils import resolve_corpus_with_hf_fallback
from instacart_next_order_recommendation_tpu.utils.config import (
    load_yaml_config,
    resolve_project_path,
)

logger = logging.getLogger(__name__)


@dataclass
class RecommendationMetrics:
    """Per-request serving metrics (reference :52-63)."""

    user_id: str
    query_embedding_time_ms: float
    similarity_compute_time_ms: float
    total_latency_ms: float
    num_recommendations: int
    top_score: float
    avg_score: float
    timestamp: float
    # "measured" = per-request wall clocks (the reference's contract);
    # "calibrated" = shape-bucketed device-side estimates from the
    # single-dispatch path (StageCalibrator) — up to TTL_S stale and not
    # guaranteed to sum to total_latency_ms. Surfaced so dashboards can
    # tell the two apart.
    stage_timing_source: str = "measured"


def _file_probe(f: Path, size: int, span: int = 65536) -> bytes:
    """First+last ``span`` bytes of a file — a content discriminator that
    stays O(1) regardless of checkpoint size."""
    with open(f, "rb") as fh:
        head = fh.read(span)
        if size > span:
            fh.seek(max(span, size - span))
            head += fh.read(span)
    return head


def model_signature(model_dir: Path | str) -> tuple:
    """Staleness signature for a checkpoint dir: (name, mtime_ns, size,
    content_probe) of its top-level files. The corpus hot-swap fast path
    reuses a live encoder only while this matches — a checkpoint retrained/
    overwritten at the same path must trigger a fresh load, not silently
    serve the stale in-memory weights. mtime+size alone can collide: a
    same-architecture retrain writes identical sizes and, on filesystems
    with coarse mtime granularity, can land in the same timestamp tick —
    so each file also contributes a hash of its first/last 64 KiB (weights
    in any real retrain differ somewhere in those spans)."""
    import hashlib

    p = Path(model_dir)
    try:
        sig = []
        for f in sorted(p.iterdir()):
            if not f.is_file():
                continue
            st = f.stat()
            probe = hashlib.sha256(_file_probe(f, st.st_size)).hexdigest()[:16]
            sig.append((f.name, st.st_mtime_ns, st.st_size, probe))
        return tuple(sig)
    except OSError:
        return ("<unreadable>",)


def _single_dispatch_on() -> bool:
    """ITOR_MONITORED_SINGLE_DISPATCH (default on): serve monitored requests
    through the one-dispatch fused program with device-calibrated stage
    stats. 0/false restores per-request wall-clocked two-dispatch serving."""
    import os

    return (os.getenv("ITOR_MONITORED_SINGLE_DISPATCH", "") or "").strip().lower() not in (
        "0", "false"
    )


class StageCalibrator:
    """Device-side per-stage timing samples for single-dispatch serving.

    The fused serve program runs encode+top-k in ONE dispatch, so the
    per-stage wall times the reference's stats contract reports
    (/root/reference/src/inference/serve_recommendations.py:244-277) cannot
    be measured per request without paying a second round trip. Instead the
    stages are measured separately per (rows, seq, k) shape bucket —
    RTT-corrected so the numbers reflect device time, not tunnel time — and
    refreshed on a TTL. Lone requests then pay a single round trip while
    ``stats`` stays populated with current per-stage figures.
    """

    TTL_S = 300.0

    def __init__(self, recommender: "Recommender"):
        self._rec = recommender
        # key (rows, seq, k) -> (encode_ms, sim_ms, measured_at)
        self._cache: dict[tuple, tuple[float, float, float]] = {}
        # keys with a measurement in flight (cold-miss coalescing + refresh
        # dedup); the lock guards only the two dicts, never a measurement —
        # requests for other buckets are never serialized behind one.
        self._inflight: dict[tuple, threading.Event] = {}
        self._lock = threading.Lock()
        self._zero = np.zeros((), np.float32)

    def _rtt_s(self) -> float:
        # Transfer-based probe (device_put + readback), NOT a jitted nop:
        # zero-compile AOT serving guarantees the first request never
        # invokes the compiler, and calibration runs on first requests.
        t0 = time.time()
        np.asarray(jax.device_put(self._zero))
        return time.time() - t0

    def _measure(self, key: tuple, queries: list[str], k_bucket: int,
                 pad_rows: int | None) -> None:
        rec = self._rec
        rtt = self._rtt_s()
        t0 = time.time()
        emb = rec.encoder.encode_device(
            queries, pad_batch_to=pad_rows, keep_padding=pad_rows is not None
        )
        jax.block_until_ready(emb)
        encode_s = time.time() - t0
        t1 = time.time()
        rec.index.topk(emb, k_bucket)
        sim_s = time.time() - t1
        self._cache[key] = (
            max(0.05, (encode_s - rtt) * 1e3),
            max(0.05, (sim_s - rtt) * 1e3),
            time.time(),
        )

    def _refresh_async(self, key, queries, k_bucket, pad_rows) -> None:
        """TTL refresh off the request path: callers keep serving the stale
        entry; one background thread re-measures (deduped per key)."""
        with self._lock:
            if key in self._inflight:
                return
            ev = threading.Event()
            self._inflight[key] = ev

        def run():
            try:
                self._measure(key, queries, k_bucket, pad_rows)
            except Exception:  # noqa: BLE001 - stale entry stays served
                logger.exception("Stage-calibration refresh failed for %s", key)
            finally:
                with self._lock:
                    self._inflight.pop(key, None)
                ev.set()

        threading.Thread(target=run, daemon=True, name="stage-cal-refresh").start()

    def stage_ms(
        self,
        queries: list[str],
        seq: int,
        k_bucket: int,
        pad_rows: int | None = None,
    ) -> tuple[float, float]:
        rows = pad_rows or len(queries)
        key = (rows, seq, k_bucket)
        hit = self._cache.get(key)
        if hit is not None:
            if time.time() - hit[2] >= self.TTL_S:
                self._refresh_async(key, list(queries), k_bucket, pad_rows)
            return hit[0], hit[1]
        # Cold miss: this bucket has never been measured, so one request
        # pays the inline measurement (the stats have to come from
        # somewhere); concurrent cold misses on the SAME key coalesce on
        # the in-flight event instead of measuring redundantly.
        with self._lock:
            ev = self._inflight.get(key)
            owner = ev is None
            if owner:
                ev = threading.Event()
                self._inflight[key] = ev
        if not owner:
            ev.wait(timeout=10.0)
            hit = self._cache.get(key)
            return (hit[0], hit[1]) if hit else (0.05, 0.05)
        try:
            self._measure(key, list(queries), k_bucket, pad_rows)
        except Exception:  # noqa: BLE001
            # A transient measurement failure (device hiccup, tokenizer
            # error) must not 500 a request whose fused dispatch already
            # produced a valid recommendation: degrade to the placeholder
            # stats exactly like waiters do. The next request on this
            # bucket retries the measurement.
            logger.exception("Stage calibration failed for %s", key)
        finally:
            with self._lock:
                self._inflight.pop(key, None)
            ev.set()
        hit = self._cache.get(key)
        return (hit[0], hit[1]) if hit else (0.05, 0.05)


class Recommender:
    """Encodes user context, retrieves top-k products by cosine similarity."""

    def __init__(
        self,
        model_dir: Path | str,
        corpus_path: Path,
        batch_size: int = 64,
        use_index: bool = True,
        mesh=None,
        ann: bool = False,
        ann_nlist: int | None = None,
        ann_nprobe: int = 8,
        topk_extraction: str | None = None,
        encoder: "TextEncoder | None" = None,
    ):
        """``ann=True`` swaps the exact brute-force index for the IVF
        approximate index (index/ivf.py) — for catalogs too large for the
        full scan. The exact scan is the default (reference contract).

        ``topk_extraction``: "exact" (default) or "packed" — the packed
        score+index extraction kernel for >=1M-row catalogs (scores
        quantized to ~3 decimal digits; near-tied candidates may swap).
        ``None`` reads the ITOR_TOPK_EXTRACTION env, so API servers (which
        construct this with paths only) are operator-flippable too.

        ``encoder``: inject an already-loaded TextEncoder for the SAME
        model_dir (the corpus hot-swap path uses this): skips the
        checkpoint reload, the param re-upload, and the per-instance jit
        re-trace — the dominant fixed costs of rebuilding a recommender
        around an unchanged tower."""
        import os as _os

        from instacart_next_order_recommendation_tpu.constants import (
            ENV_TOPK_EXTRACTION,
        )

        if topk_extraction is None:
            topk_extraction = (_os.getenv(ENV_TOPK_EXTRACTION) or "exact").strip().lower()
        self.model_dir = self._resolve_model_dir(model_dir)
        self.corpus_path = Path(corpus_path).resolve()
        self.product_ids, self.product_texts = self._load_corpus()
        self.pid_to_text = dict(zip(self.product_ids, self.product_texts))
        self._build_category_masks()
        self.encoder = encoder if encoder is not None else TextEncoder.load(self.model_dir)
        # Staleness signature of the checkpoint dir at the time these
        # weights were (re)used — the corpus hot-swap fast path compares it
        # against the dir's current signature before injecting this
        # encoder into a successor (callers that inject must verify first).
        self._model_signature = model_signature(self.model_dir)
        # Per-stage device timing samples for single-dispatch serving
        # (MonitoredRecommender + MicroBatcher read this; lazy — measures
        # only when the fused path serves a new shape bucket).
        self._stage_cal = StageCalibrator(self)
        self.product_embeddings = self._load_or_build_embeddings(batch_size, use_index)
        if mesh is None and jax.device_count() > 1:
            mesh = build_mesh(MeshConfig())
        if ann:
            from instacart_next_order_recommendation_tpu.index import IVFCatalogIndex

            # Multi-device hosts shard the k-means build over the mesh
            # (index/ivf.py); search runs on the default device either way.
            self.index = IVFCatalogIndex(
                self.product_embeddings, nlist=ann_nlist, nprobe=ann_nprobe, mesh=mesh
            )
            self._fused = None
            return
        self.index = ShardedCatalogIndex(
            self.product_embeddings, mesh, extraction=topk_extraction
        )
        # Single-device serving fuses encode+topk into one dispatch; the
        # sharded path keeps encode separate (topk runs under shard_map).
        self._fused = None
        if self.index.dp == 1:
            from instacart_next_order_recommendation_tpu.serve.pipeline import (
                FusedServePipeline,
            )

            self._fused = FusedServePipeline(
                self.encoder.params,
                self.encoder.config,
                self.index._catalog,
                len(self.product_ids),
                pad_id=self.encoder.tokenizer.pad_id,
                packed=self.index.packed,
            )

    @staticmethod
    def _resolve_model_dir(model_dir: Path | str) -> Path:
        p = Path(model_dir)
        if not p.exists():
            raise FileNotFoundError(f"model dir not found: {model_dir}")
        return p.resolve()

    def _load_corpus(self) -> tuple[list[str], list[str]]:
        with open(self.corpus_path) as f:
            corpus = json.load(f)
        ids = list(corpus.keys())
        return ids, [corpus[pid] for pid in ids]

    # --------------------------------------------------------------- categories

    _CATEGORY_RE = re.compile(r"Aisle:\s*(.+?)\.\s*Department:\s*(.+?)\.\s*$")

    def _build_category_masks(self) -> None:
        """Parse aisle/department from the product text template
        ("Product: X. Aisle: Y. Department: Z.", reference
        prepare_instacart_sbert.py:185-193) into per-value row masks for
        device-side filtered retrieval."""
        n = len(self.product_texts)
        self._aisle_rows: dict[str, list[int]] = {}
        self._department_rows: dict[str, list[int]] = {}
        for row, text in enumerate(self.product_texts):
            m = self._CATEGORY_RE.search(text)
            if not m:
                continue
            self._aisle_rows.setdefault(m.group(1).strip().lower(), []).append(row)
            self._department_rows.setdefault(m.group(2).strip().lower(), []).append(row)
        self._n_rows = n

    def _category_mask(
        self,
        filter_aisles: list[str] | None,
        filter_departments: list[str] | None,
    ) -> np.ndarray | None:
        """[N] int32 mask (1 = eligible): OR within a filter list, AND across
        the two lists. None when no filter is active."""
        if not filter_aisles and not filter_departments:
            return None
        mask = np.ones(self._n_rows, dtype=bool)
        for values, rows_by_value in (
            (filter_aisles, self._aisle_rows),
            (filter_departments, self._department_rows),
        ):
            if values:
                group = np.zeros(self._n_rows, dtype=bool)
                for v in values:
                    rows = rows_by_value.get(str(v).strip().lower())
                    if rows:
                        group[rows] = True
                mask &= group
        return mask.astype(np.int32)

    @property
    def aisles(self) -> list[str]:
        return sorted(self._aisle_rows)

    @property
    def departments(self) -> list[str]:
        return sorted(self._department_rows)

    def _load_or_build_embeddings(self, batch_size: int, use_index: bool) -> np.ndarray:
        disk_index = EmbeddingIndex(self.corpus_path, self.model_dir)
        if use_index:
            cached = disk_index.load(self.product_ids)
            if cached is not None:
                logger.info(
                    "Loaded %d product embeddings from index cache", len(self.product_ids)
                )
                return cached
        # Device-resident build: the index consumes embeddings on device, so
        # the host never sees them unless the disk cache needs a copy (then
        # it's ONE bulk transfer, not one per batch).
        emb_device = self.encoder.encode_resident(
            self.product_texts, batch_size=max(batch_size, 512)
        )
        if use_index:
            embeddings = np.asarray(emb_device, dtype=np.float32)
            disk_index.save(self.product_ids, embeddings)
            logger.info("Encoded corpus: %d products", len(self.product_ids))
            return embeddings
        logger.info("Encoded corpus: %d products (device-resident)", len(self.product_ids))
        return emb_device

    # ------------------------------------------------------------------ query

    def _k_bucket(self, fetch_k: int) -> int:
        """Round k up to the serve lattice (precompile.K_BUCKETS) so each
        distinct top_k + |excluded| doesn't compile a fresh program — callers
        slice back to fetch_k. Unbucketed k would let clients trigger a
        compile per request shape (seconds each on remote-compile setups)."""
        from instacart_next_order_recommendation_tpu.serve.precompile import K_BUCKETS

        k_bucket = next((b for b in K_BUCKETS if b >= fetch_k), fetch_k)
        return min(k_bucket, len(self.product_ids))

    def _rank(
        self, query: str, fetch_k: int, candidate_mask: np.ndarray | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        k_bucket = self._k_bucket(fetch_k)
        if self._fused is not None and candidate_mask is None:
            ids, mask = self.encoder.tokenizer.encode_batch(
                [query], max_seq_length=self.encoder.max_seq_length
            )
            scores, indices = self._fused.topk(ids, mask, k_bucket)
        else:
            query_emb = self.encoder.encode([query], batch_size=1)
            scores, indices = self.index.topk(
                query_emb, k_bucket, candidate_mask=candidate_mask
            )
        return scores[:, :fetch_k], indices[:, :fetch_k]

    def recommend(
        self,
        query: str,
        top_k: int = 10,
        exclude_product_ids: set[str] | None = None,
        filter_aisles: list[str] | None = None,
        filter_departments: list[str] | None = None,
    ) -> list[tuple[str, float]]:
        """Top-k (product_id, score); excluded ids skipped after ranking.

        ``filter_aisles``/``filter_departments`` restrict the candidate pool
        device-side (masked retrieval) — a TPU-native extension beyond the
        reference's exclude-ids-only surface.
        """
        excluded = exclude_product_ids or set()
        fetch_k = min(top_k + len(excluded), len(self.product_ids))
        mask = self._category_mask(filter_aisles, filter_departments)
        scores, indices = self._rank(query, fetch_k, candidate_mask=mask)
        return self._take_top(scores[0], indices[0], top_k, excluded)

    _MASKED_OUT = -1e29  # scores below this are masked-out sentinel rows

    def _take_top(
        self, scores: np.ndarray, indices: np.ndarray, top_k: int, excluded: set[str]
    ) -> list[tuple[str, float]]:
        results: list[tuple[str, float]] = []
        for score, idx in zip(scores, indices):
            if score <= self._MASKED_OUT:  # fewer eligible candidates than k
                break
            pid = self.product_ids[int(idx)]
            if pid in excluded:
                continue
            results.append((pid, float(score)))
            if len(results) >= top_k:
                break
        return results


class MonitoredRecommender(Recommender):
    """Recommender with per-stage timing; sets ``last_metrics`` per request."""

    def __init__(self, *args, metrics_logger: Optional[logging.Logger] = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.metrics_logger = metrics_logger or logging.getLogger("recommender.metrics")
        # Thread-local: the API serves from a threading server, and a shared
        # attribute would let concurrent requests read each other's stats
        # (request A's response reporting B's latency). Each worker thread
        # sees only the metrics of the request IT just served.
        self._metrics_tls = threading.local()

    @property
    def last_metrics(self) -> Optional[RecommendationMetrics]:
        return getattr(self._metrics_tls, "value", None)

    @last_metrics.setter
    def last_metrics(self, value: Optional[RecommendationMetrics]) -> None:
        self._metrics_tls.value = value

    def recommend(
        self,
        query: str,
        top_k: int = 10,
        user_id: Optional[str] = None,
        exclude_product_ids: set[str] | None = None,
        filter_aisles: list[str] | None = None,
        filter_departments: list[str] | None = None,
    ) -> list[tuple[str, float]]:
        start = time.time()
        excluded = exclude_product_ids or set()
        fetch_k = min(top_k + len(excluded), len(self.product_ids))
        mask = self._category_mask(filter_aisles, filter_departments)
        k_bucket = self._k_bucket(fetch_k)
        timing_source = "measured"

        if self._fused is not None and mask is None and _single_dispatch_on():
            # Single-dispatch serving (one tunnel round trip, the dominant
            # cost per lone request): encode+top-k run as the fused program;
            # the per-stage stats come from the device-side calibration
            # table instead of per-request wall clocks (StageCalibrator).
            ids, tmask = self.encoder.tokenizer.encode_batch(
                [query], max_seq_length=self.encoder.max_seq_length
            )
            scores, indices = self._fused.topk(ids, tmask, k_bucket)
            encode_ms, sim_ms = self._stage_cal.stage_ms(
                [query], seq=ids.shape[1], k_bucket=k_bucket
            )
            timing_source = "calibrated"
        else:
            encode_start = time.time()
            query_emb = self.encoder.encode([query], batch_size=1)
            encode_ms = (time.time() - encode_start) * 1000
            sim_start = time.time()
            scores, indices = self.index.topk(
                query_emb, k_bucket, candidate_mask=mask
            )
            sim_ms = (time.time() - sim_start) * 1000
        scores, indices = scores[:, :fetch_k], indices[:, :fetch_k]

        results = self._take_top(scores[0], indices[0], top_k, excluded)
        total_ms = (time.time() - start) * 1000

        self.last_metrics = RecommendationMetrics(
            user_id=user_id or "anonymous",
            query_embedding_time_ms=encode_ms,
            similarity_compute_time_ms=sim_ms,
            total_latency_ms=total_ms,
            num_recommendations=len(results),
            top_score=results[0][1] if results else 0.0,
            avg_score=sum(s for _, s in results) / len(results) if results else 0.0,
            timestamp=time.time(),
            stage_timing_source=timing_source,
        )
        self._log_metrics(self.last_metrics)
        return results

    def _log_metrics(self, m: RecommendationMetrics) -> None:
        self.metrics_logger.info(
            "recommendation_served",
            extra={
                "user_id": m.user_id,
                "latency_ms": m.total_latency_ms,
                "encode_time_ms": m.query_embedding_time_ms,
                "similarity_time_ms": m.similarity_compute_time_ms,
                "num_results": m.num_recommendations,
                "top_score": m.top_score,
                "avg_score": m.avg_score,
            },
        )


class InferenceConfig:
    """CLI inference configuration (reference :296-334)."""

    def __init__(self, raw: dict):
        self.model_dir = resolve_project_path(raw.get("model_dir"), DEFAULT_MODEL_DIR)
        corpus_path = resolve_project_path(raw.get("corpus"), DEFAULT_CORPUS_PATH)
        self.corpus = resolve_corpus_with_hf_fallback(
            corpus_path,
            hf_repo=raw.get("corpus_hf_repo"),
            hf_repo_type=raw.get("corpus_hf_repo_type"),
        )
        self.use_index = bool(raw.get("use_index", True))
        self.query = raw.get("query")
        self.eval_query_id = raw.get("eval_query_id")
        self.top_k = int(raw.get("top_k", 10))
        # ANN (IVF) option for very large catalogs; exact scan is default.
        self.ann = bool(raw.get("ann", False))
        self.ann_nlist = int(raw["ann_nlist"]) if raw.get("ann_nlist") else None
        self.ann_nprobe = int(raw.get("ann_nprobe", 8))
        # "exact" | "packed"; None defers to the ITOR_TOPK_EXTRACTION env.
        self.topk_extraction = raw.get("topk_extraction")

    @classmethod
    def load(cls, config_path: Path | None = None) -> "InferenceConfig":
        return cls(load_yaml_config(config_path, DEFAULT_CONFIG_INFERENCE))


def apply_inference_device_override() -> None:
    """Honor the INFERENCE_DEVICE env override (reference :172-181 semantics:
    explicit device choice wins over auto-detection). Values: tpu | cpu."""
    import os

    from instacart_next_order_recommendation_tpu.constants import ENV_INFERENCE_DEVICE

    value = os.getenv(ENV_INFERENCE_DEVICE)
    if value:
        try:
            jax.config.update("jax_platforms", value)
        except Exception:
            logger.warning("Could not apply INFERENCE_DEVICE=%s", value)


def main() -> None:
    parser = argparse.ArgumentParser(description="Serve product recommendations (CLI)")
    parser.add_argument("--config", type=Path, default=None, help="Path to YAML config")
    args = parser.parse_args()
    from instacart_next_order_recommendation_tpu.utils.dotenv import load_dotenv

    load_dotenv()
    logging.basicConfig(level=logging.INFO, format="%(message)s")
    apply_inference_device_override()

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

    if cfg.eval_query_id:
        queries_path = cfg.corpus.parent / EVAL_QUERIES_FILENAME
        eval_queries = json.loads(queries_path.read_text())
        if str(cfg.eval_query_id) not in eval_queries:
            raise KeyError(f"eval_query_id {cfg.eval_query_id} not in {queries_path}")
        query = eval_queries[str(cfg.eval_query_id)]
        print(f"Query (eval_id={cfg.eval_query_id}):\n  {query[:200]}...\n")
    elif cfg.query:
        query = cfg.query
        print(f"Query:\n  {query}\n")
    else:
        query = DEMO_QUERY
        print(f"No query or eval_query_id in config. Using demo query:\n\n  {query}\n")

    results = rec.recommend(query=query, top_k=cfg.top_k)
    print(f"Top-{cfg.top_k} recommendations:")
    for i, (pid, score) in enumerate(results, 1):
        print(f"  {i}. product_id={pid} (score={score:.4f}) {rec.pid_to_text[pid]}")


if __name__ == "__main__":
    main()
