"""Row-sharded catalog index over the device mesh.

The reference performs the full similarity + argsort on ONE device
(/root/reference/src/inference/serve_recommendations.py:213-215). Here the
catalog rows are sharded over the ``data`` axis: each device runs the fused
cosine+top-k kernel on its shard, offsets indices into global row space, and
the per-shard candidate lists are all-gathered (k*ndev rows ride the ICI, not
the catalog) and merged with one small ``lax.top_k`` — exact global top-k,
functionally identical to the reference's full sort.

On a single device this degrades to the plain fused kernel with no
collectives (the shard_map wrapper compiles away).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from instacart_next_order_recommendation_tpu.ops import cosine_topk
from instacart_next_order_recommendation_tpu.parallel.mesh import DATA_AXIS


class ShardedCatalogIndex:
    """Catalog embeddings resident on-device, row-sharded over the mesh."""

    def __init__(
        self,
        embeddings: np.ndarray,
        mesh: Mesh | None = None,
        dtype: str = "float32",
        extraction: str = "exact",
    ):
        """Args:
        embeddings: [N, D] float32 unit-norm catalog matrix (host).
        mesh: device mesh with a ``data`` axis; None = single default device.
        dtype: on-device catalog storage dtype. ``bfloat16`` halves HBM
            footprint and read bandwidth (the retrieval bottleneck) at the
            cost of ~3 decimal digits of score precision — rankings can swap
            only between near-tied candidates. Scores still accumulate in f32.
        extraction: ``"exact"`` (default contract — identical to the
            reference's full argsort) or ``"packed"`` — the ~2x-fewer-passes
            packed kernel for >=1M-row catalogs where per-candidate
            extraction dominates; scores compare at 20-bit precision, so
            near-tied candidates may swap and returned scores are quantized
            (~3 decimal digits).
        """
        if extraction not in ("exact", "packed"):
            raise ValueError(f"extraction must be 'exact' or 'packed', got {extraction!r}")
        self.mesh = mesh
        self.packed = extraction == "packed"
        self.dtype = jnp.dtype(dtype)
        self.n_total = embeddings.shape[0]
        self.dim = embeddings.shape[1]
        self._topk_cache: dict[tuple[int, int], object] = {}

        if mesh is None or mesh.shape[DATA_AXIS] == 1:
            self.dp = 1
            self.shard_rows = self.n_total
            self._catalog = jnp.asarray(embeddings, dtype=self.dtype)
        else:
            self.dp = mesh.shape[DATA_AXIS]
            self.shard_rows = -(-self.n_total // self.dp)
            padded = self.shard_rows * self.dp
            if padded != self.n_total:
                embeddings = np.concatenate(
                    [embeddings, np.zeros((padded - self.n_total, self.dim), embeddings.dtype)]
                )
            sharding = NamedSharding(mesh, P(DATA_AXIS, None))
            self._catalog = jax.device_put(
                jnp.asarray(embeddings, dtype=self.dtype), sharding
            )

    def _build_topk(self, k: int, batch: int, has_mask: bool):
        if self.mesh is None or self.dp == 1:
            from instacart_next_order_recommendation_tpu.serve.aot import AotStore

            n_valid = self.n_total
            packed = self.packed
            aot = AotStore.from_env()

            @jax.jit
            def topk_fn(queries, catalog, mask=None):
                return cosine_topk(
                    queries.astype(catalog.dtype),
                    catalog,
                    k,
                    n_valid=n_valid,
                    candidate_mask=mask,
                    packed=packed,
                )

            if aot is None:
                return topk_fn

            def aot_topk(queries, catalog, mask=None):
                from instacart_next_order_recommendation_tpu.ops.topk import (
                    topk_cache_suffix,
                )

                key = (
                    f"topk_k{k}_b{queries.shape[0]}_n{catalog.shape[0]}"
                    f"_d{catalog.shape[1]}_{catalog.dtype}_mask{int(mask is not None)}"
                    + topk_cache_suffix(packed)
                )
                args = (queries, catalog) + ((mask,) if mask is not None else ())
                return aot.run(key, topk_fn, args)

            return aot_topk

        mesh = self.mesh
        shard_rows = self.shard_rows
        n_total = self.n_total
        packed = self.packed

        def local_topk(queries, catalog_shard, mask_shard=None):
            # queries replicated; catalog_shard [shard_rows, D] local block.
            queries = queries.astype(catalog_shard.dtype)
            shard_idx = jax.lax.axis_index(DATA_AXIS)
            start = shard_idx * shard_rows
            n_valid = jnp.clip(n_total - start, 0, shard_rows)
            s, i = cosine_topk(
                queries,
                catalog_shard,
                min(k, shard_rows),
                n_valid=n_valid,
                local=True,
                candidate_mask=mask_shard,
                packed=packed,
            )
            i = i + start
            # Gather candidates from every shard: [dp, B, k_local].
            all_s = jax.lax.all_gather(s, DATA_AXIS)
            all_i = jax.lax.all_gather(i, DATA_AXIS)
            b = queries.shape[0]
            all_s = jnp.transpose(all_s, (1, 0, 2)).reshape(b, -1)
            all_i = jnp.transpose(all_i, (1, 0, 2)).reshape(b, -1)
            top_s, pos = jax.lax.top_k(all_s, k)
            top_i = jnp.take_along_axis(all_i, pos, axis=1)
            return top_s, top_i

        in_specs = (P(), P(DATA_AXIS, None)) + ((P(DATA_AXIS),) if has_mask else ())
        fn = shard_map(
            local_topk,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=(P(), P()),
            check_vma=False,
        )
        return jax.jit(fn)

    def topk_device(
        self,
        queries: np.ndarray | jax.Array,
        k: int,
        candidate_mask: np.ndarray | jax.Array | None = None,
    ):
        """Async top-k: returns device arrays without host sync (pipelines).

        ``candidate_mask`` is an optional [n_total] row filter (1 = eligible)
        applied device-side before top-k — exact filtered retrieval without
        fetch-k escalation (serve aisle/department filters).
        """
        k = min(k, self.n_total)
        queries = jnp.asarray(queries)
        cache_key = (k, queries.shape[0], candidate_mask is not None)
        if cache_key not in self._topk_cache:
            self._topk_cache[cache_key] = self._build_topk(
                k, queries.shape[0], candidate_mask is not None
            )
        fn = self._topk_cache[cache_key]
        if candidate_mask is None:
            return fn(queries, self._catalog)
        mask = np.asarray(candidate_mask, np.int32)
        padded_rows = self.shard_rows * self.dp
        if padded_rows != mask.shape[0]:
            mask = np.pad(mask, (0, padded_rows - mask.shape[0]))
        mask_dev = jnp.asarray(mask)
        if self.mesh is not None and self.dp > 1:
            mask_dev = jax.device_put(
                mask_dev, NamedSharding(self.mesh, P(DATA_AXIS))
            )
        return fn(queries, self._catalog, mask_dev)

    def topk(
        self,
        queries: np.ndarray | jax.Array,
        k: int,
        candidate_mask: np.ndarray | jax.Array | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Global exact top-k: returns (scores [B, k], indices [B, k])."""
        s, i = self.topk_device(queries, k, candidate_mask=candidate_mask)
        return np.asarray(s), np.asarray(i)
