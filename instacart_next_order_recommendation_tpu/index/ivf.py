"""IVF (inverted-file) approximate index for very large catalogs.

The reference's retrieval contract is exact brute-force cosine over the full
catalog (/root/reference/src/inference/serve_recommendations.py:213-215),
which this framework keeps as the default (index/sharded.py). Beyond ~10M
products the full scan stops fitting per-chip HBM/latency budgets, so this
module adds an opt-in IVF index designed for TPU execution semantics:

- **Build**: spherical k-means on device (embeddings are unit-norm, so
  cosine == dot and the assignment step is one big MXU matmul per chunk),
  then *capacity-balanced* assignment: each cluster is capped at
  ``bucket_len`` rows and overflow rows spill to their next-nearest centroid,
  giving a dense ``[nlist, bucket_len, D]`` bucket tensor — a single static
  shape, no ragged lists, no recompiles. With a ``mesh``, the k-means
  assignment + accumulation and the preference scoring run shard-local over
  the ``data`` axis (rows sharded, centroids replicated, one ``psum`` of the
  [nlist, D] partial sums per iteration — centroid traffic rides ICI, never
  the full catalog).
- **Search** (jit, static shapes): score centroids ``[B, nlist]``, take the
  top ``nprobe`` clusters per query, gather their buckets, and run one
  ``[B, nprobe*bucket_len]`` masked top-k. FLOPs drop by ~``nlist/nprobe``
  vs the exact scan; accuracy is tunable via ``nprobe`` (probing all
  clusters recovers the exact ranking).

Candidate masks (aisle/department filters) are supported by gathering the
mask through the bucket id table, so the serve surface is identical to the
exact index.
"""

from __future__ import annotations

import logging
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from instacart_next_order_recommendation_tpu.parallel.mesh import DATA_AXIS

logger = logging.getLogger(__name__)

_NEG_INF = -1e30


def _finish_centroids(sums, counts, embeddings, rng) -> np.ndarray:
    """Normalize accumulated sums into unit-norm centroids; reseed empties."""
    sums = np.asarray(sums, np.float64)
    counts = np.asarray(counts, np.float64)
    empty = counts == 0
    if empty.any():  # re-seed empty clusters from random rows
        sums[empty] = embeddings[rng.choice(len(embeddings), size=int(empty.sum()))]
        counts[empty] = 1
    centroids = (sums / counts[:, None]).astype(np.float32)
    norms = np.linalg.norm(centroids, axis=1, keepdims=True)
    return centroids / np.maximum(norms, 1e-12)


def _kmeans(
    embeddings: np.ndarray, nlist: int, iters: int, seed: int, chunk: int = 65536
) -> np.ndarray:
    """Spherical k-means: returns unit-norm centroids [nlist, D].

    Single-device build, streaming-friendly: each chunk does assignment AND
    sum/count accumulation on device (argmax + one-hot matmul, all MXU work),
    so the host only ever touches chunk-sized slices — ``embeddings`` can be
    a ``np.memmap`` larger than RAM — and the per-iteration host traffic is
    one small [nlist, D] partial per chunk, never a full-matrix pass (the
    previous ``np.add.at`` over all rows was both a full-RAM walk and the
    build's hot spot).
    """
    n, d = embeddings.shape
    rng = np.random.default_rng(seed)
    centroids = np.array(embeddings[np.sort(rng.choice(n, size=nlist, replace=False))])

    @jax.jit
    def chunk_stats(x, c):
        scores = jnp.einsum("nd,kd->nk", x, c, preferred_element_type=jnp.float32)
        onehot = jax.nn.one_hot(jnp.argmax(scores, axis=1), c.shape[0], dtype=jnp.float32)
        sums = jnp.einsum("nk,nd->kd", onehot, x, preferred_element_type=jnp.float32)
        return sums, jnp.sum(onehot, axis=0)

    pad = (-n) % chunk  # one static chunk shape -> one compile
    for it in range(iters):
        c_dev = jnp.asarray(centroids)
        sums = np.zeros((nlist, d), np.float64)
        counts = np.zeros(nlist, np.float64)
        for lo in range(0, n, chunk):
            x = np.asarray(embeddings[lo : lo + chunk], np.float32)
            if pad and lo + chunk > n:
                x = np.concatenate([x, np.zeros((pad, d), np.float32)])
            s, cts = chunk_stats(jnp.asarray(x), c_dev)
            sums += np.asarray(s, np.float64)
            counts += np.asarray(cts, np.float64)
        if pad:
            counts[0] -= pad  # zero-padding rows all argmax to index 0...
            # ...and contribute zero to sums, so only the count needs fixing.
        centroids = _finish_centroids(sums, counts, embeddings, rng)
    return centroids


class _MeshBuilder:
    """Mesh-sharded k-means + preference scoring for the IVF build.

    Rows live sharded over the ``data`` axis for the whole build; each
    iteration is ONE dispatch: a shard-local ``lax.scan`` over row chunks
    (scores matmul -> argmax -> one-hot matmul accumulation, all MXU work,
    chunked so the [chunk, nlist] intermediates never exceed VMEM-friendly
    sizes) followed by a single psum of the [nlist, D] partials.
    """

    def __init__(self, embeddings: np.ndarray, mesh: Mesh, chunk: int):
        n, d = embeddings.shape
        self.mesh = mesh
        self.n = n
        dp = mesh.shape[DATA_AXIS]
        self.chunk = min(chunk, -(-n // dp))
        pad = (-n) % (dp * self.chunk)
        x = embeddings
        if pad:
            x = np.concatenate([x, np.zeros((pad, d), np.float32)])
        w = np.ones(n + pad, np.float32)
        w[n:] = 0.0  # padded rows contribute nothing to sums/counts
        self.x = jax.device_put(
            jnp.asarray(x, jnp.float32), NamedSharding(mesh, P(DATA_AXIS, None))
        )
        self.w = jax.device_put(jnp.asarray(w), NamedSharding(mesh, P(DATA_AXIS)))

    def kmeans(self, nlist: int, iters: int, seed: int, embeddings: np.ndarray):
        rng = np.random.default_rng(seed)
        centroids = embeddings[rng.choice(self.n, size=nlist, replace=False)].copy()
        chunk = self.chunk

        @jax.jit
        @partial(
            shard_map,
            mesh=self.mesh,
            in_specs=(P(), P(DATA_AXIS, None), P(DATA_AXIS)),
            out_specs=(P(), P()),
        )
        def step(c, xs, ws):
            d = xs.shape[1]

            def body(carry, args):
                xc, wc = args
                scores = jnp.einsum(
                    "nd,kd->nk", xc, c, preferred_element_type=jnp.float32
                )
                onehot = jax.nn.one_hot(jnp.argmax(scores, axis=1), nlist) * wc[:, None]
                sums = carry[0] + jnp.einsum(
                    "nk,nd->kd", onehot, xc, preferred_element_type=jnp.float32
                )
                return (sums, carry[1] + onehot.sum(0)), None

            init = jax.lax.pcast(  # carry varies per shard until the psum
                (jnp.zeros((nlist, d), jnp.float32), jnp.zeros((nlist,), jnp.float32)),
                DATA_AXIS,
                to="varying",
            )
            (sums, counts), _ = jax.lax.scan(
                body, init, (xs.reshape(-1, chunk, d), ws.reshape(-1, chunk))
            )
            return jax.lax.psum(sums, DATA_AXIS), jax.lax.psum(counts, DATA_AXIS)

        for _ in range(iters):
            sums, counts = step(jnp.asarray(centroids), self.x, self.w)
            centroids = _finish_centroids(sums, counts, embeddings, rng)
        return centroids

    def prefs(self, centroids: np.ndarray, prefs: int) -> np.ndarray:
        """Top-``prefs`` nearest centroids per row, [n, prefs] int32."""
        chunk = self.chunk

        @jax.jit
        @partial(
            shard_map,
            mesh=self.mesh,
            in_specs=(P(), P(DATA_AXIS, None)),
            out_specs=P(DATA_AXIS, None),
        )
        def prefs_fn(c, xs):
            def body(_, xc):
                scores = jnp.einsum(
                    "nd,kd->nk", xc, c, preferred_element_type=jnp.float32
                )
                _, idx = jax.lax.top_k(scores, prefs)
                return None, idx.astype(jnp.int32)

            _, idx = jax.lax.scan(body, None, xs.reshape(-1, chunk, xs.shape[1]))
            return idx.reshape(-1, prefs)

        return np.asarray(prefs_fn(jnp.asarray(centroids), self.x))[: self.n]


def _balanced_assign(pref_idx: np.ndarray, nlist: int, cap: int) -> np.ndarray:
    """Capacity-balanced cluster assignment from per-row preference lists.

    Round ``r`` offers every still-unassigned row its rank-``r`` centroid;
    a cluster admits rows (in row order) until its ``cap`` is exhausted and
    the rest spill to their next preference. Fully vectorized — no per-row
    Python loop, so a 100M-row build spends O(prefs) argsorts, not O(n)
    interpreter iterations. Rows whose whole preference list is full land in
    arbitrary free slots (capacity ``nlist*cap >= n`` guarantees room).
    """
    n, n_prefs = pref_idx.shape
    assign = np.full(n, -1, np.int64)
    remaining = np.full(nlist, cap, np.int64)
    unassigned = np.arange(n)
    for r in range(n_prefs):
        if not len(unassigned):
            break
        ci = pref_idx[unassigned, r]
        order = np.argsort(ci, kind="stable")  # stable: row order within cluster
        sci = ci[order]
        run_start = np.r_[0, np.flatnonzero(np.diff(sci)) + 1]
        run_len = np.diff(np.r_[run_start, len(sci)])
        rank_in_cluster = np.arange(len(sci)) - np.repeat(run_start, run_len)
        admit = rank_in_cluster < remaining[sci]
        rows = unassigned[order[admit]]
        assign[rows] = sci[admit]
        remaining -= np.bincount(sci[admit], minlength=nlist)
        unassigned = unassigned[order[~admit]]
    if len(unassigned):  # rare: all preferences full; any free slot works
        free = np.repeat(np.arange(nlist), remaining)
        assign[unassigned] = free[: len(unassigned)]
    return assign


def _fill_buckets(
    assign: np.ndarray, embeddings: np.ndarray, nlist: int, cap: int, chunk: int = 262_144
) -> tuple[np.ndarray, np.ndarray]:
    """Scatter rows into the dense [nlist, cap] bucket tensors (vectorized).

    The gather runs in chunks so a memmapped ``embeddings`` never needs a
    full-size in-RAM temporary; the bucket tensor itself is the one full-size
    allocation (it IS the device catalog)."""
    d = embeddings.shape[1]
    order = np.argsort(assign, kind="stable")
    sa = assign[order]
    run_start = np.r_[0, np.flatnonzero(np.diff(sa)) + 1]
    run_len = np.diff(np.r_[run_start, len(sa)])
    slot = np.arange(len(sa)) - np.repeat(run_start, run_len)
    buckets = np.zeros((nlist, cap, d), np.float32)
    bucket_ids = np.full((nlist, cap), -1, np.int32)
    for lo in range(0, len(order), chunk):
        sel = order[lo : lo + chunk]
        buckets[sa[lo : lo + chunk], slot[lo : lo + chunk]] = embeddings[sel]
    bucket_ids[sa, slot] = order
    return buckets, bucket_ids


class IVFCatalogIndex:
    """Approximate top-k over bucketed clusters. Same ``topk`` API as
    ShardedCatalogIndex (drop-in for the Recommender)."""

    def __init__(
        self,
        embeddings: np.ndarray,
        nlist: int | None = None,
        nprobe: int = 8,
        bucket_slack: float = 1.3,
        kmeans_iters: int = 8,
        seed: int = 0,
        dtype: str = "float32",
        mesh: Mesh | None = None,
        build_chunk: int = 8192,
    ):
        """``mesh``: shard the k-means/preference build over the ``data``
        axis (large catalogs). Search itself stays on the default device."""
        n, d = embeddings.shape
        self.n_total = n
        self.dim = d
        self.nlist = nlist or max(1, int(np.sqrt(n)))
        self.nprobe = min(nprobe, self.nlist)
        self.bucket_len = max(1, int(np.ceil(n / self.nlist * bucket_slack)))
        self._topk_cache: dict = {}
        from instacart_next_order_recommendation_tpu.serve.aot import AotStore

        self._aot = AotStore.from_env()

        embeddings = np.asarray(embeddings, np.float32)
        n_prefs = min(8, self.nlist)
        if mesh is not None and mesh.shape[DATA_AXIS] > 1:
            builder = _MeshBuilder(embeddings, mesh, chunk=build_chunk)
            centroids = builder.kmeans(self.nlist, kmeans_iters, seed, embeddings)
            pref_idx = builder.prefs(centroids, n_prefs)
        else:
            centroids = _kmeans(embeddings, self.nlist, kmeans_iters, seed)
            pref_idx = self._host_prefs(embeddings, centroids, n_prefs)
        assign = _balanced_assign(pref_idx, self.nlist, self.bucket_len)
        buckets, bucket_ids = _fill_buckets(assign, embeddings, self.nlist, self.bucket_len)

        self._centroids = jnp.asarray(centroids)
        self._buckets = jnp.asarray(buckets, dtype=jnp.dtype(dtype))
        self._bucket_ids = jnp.asarray(bucket_ids)
        fill = (bucket_ids >= 0).mean()
        logger.info(
            "IVF index: %d rows, nlist=%d, bucket_len=%d (fill %.0f%%), nprobe=%d%s",
            n, self.nlist, self.bucket_len, 100 * fill, self.nprobe,
            f", built on {mesh.shape[DATA_AXIS]}-way mesh" if mesh is not None else "",
        )

    @staticmethod
    def _host_prefs(
        embeddings: np.ndarray, centroids: np.ndarray, prefs: int, chunk: int = 65536
    ) -> np.ndarray:
        """Top-``prefs`` nearest centroids per row (host matmul, chunked)."""
        out = np.empty((embeddings.shape[0], prefs), np.int32)
        for lo in range(0, embeddings.shape[0], chunk):
            scores = embeddings[lo : lo + chunk] @ centroids.T
            out[lo : lo + chunk] = np.argsort(-scores, axis=1)[:, :prefs]
        return out

    def _build_topk(self, k: int, has_mask: bool):
        nprobe = self.nprobe

        @jax.jit
        def topk_fn(queries, centroids, buckets, bucket_ids, mask=None):
            q = queries.astype(jnp.float32)
            cscores = jnp.einsum(
                "bd,kd->bk", q, centroids, preferred_element_type=jnp.float32
            )
            _, probe = jax.lax.top_k(cscores, nprobe)  # [B, nprobe]
            cand = buckets[probe]  # [B, nprobe, L, D]
            cand_ids = bucket_ids[probe]  # [B, nprobe, L]
            scores = jnp.einsum(
                "bd,bpld->bpl", q, cand.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            valid = cand_ids >= 0
            if mask is not None:
                valid = valid & (mask[jnp.clip(cand_ids, 0, None)] != 0)
            scores = jnp.where(valid, scores, _NEG_INF)
            b = q.shape[0]
            flat_s = scores.reshape(b, -1)
            flat_i = cand_ids.reshape(b, -1)
            top_s, pos = jax.lax.top_k(flat_s, k)
            top_i = jnp.take_along_axis(flat_i, pos, axis=1)
            return top_s, top_i

        return topk_fn

    def topk_device(self, queries, k: int, candidate_mask=None):
        k = min(k, self.nprobe * self.bucket_len, self.n_total)
        queries = jnp.asarray(queries)
        key = (k, queries.shape[0], candidate_mask is not None)
        if key not in self._topk_cache:
            self._topk_cache[key] = self._build_topk(k, candidate_mask is not None)
        args = [queries, self._centroids, self._buckets, self._bucket_ids]
        if candidate_mask is not None:
            args.append(jnp.asarray(np.asarray(candidate_mask, np.int32)))
        fn = self._topk_cache[key]
        if self._aot is not None:
            # Same zero-compile startup contract as the exact-scan index
            # (index/sharded.py): ann deployments with ITOR_AOT_DIR must not
            # invoke the compiler per top-k shape on first request.
            aot_key = (
                f"ivf_n{self.n_total}_d{self.dim}_l{self.nlist}_p{self.nprobe}"
                f"_L{self.bucket_len}_k{k}_b{queries.shape[0]}"
                f"_{self._buckets.dtype}_mask{int(candidate_mask is not None)}"
            )
            return self._aot.run(aot_key, fn, tuple(args))
        return fn(*args)

    def topk(self, queries, k: int, candidate_mask=None) -> tuple[np.ndarray, np.ndarray]:
        s, i = self.topk_device(queries, k, candidate_mask=candidate_mask)
        return np.asarray(s), np.asarray(i)
