"""Fused serving pipeline: tokenized batch -> top-k in ONE device dispatch.

The two-call path (encode, then top-k) costs two dispatch round trips per
batch; on tunneled TPU setups the RTT dominates the sub-millisecond compute.
This pipeline jits ``topk(encode(ids, mask), catalog)`` as a single program —
XLA also fuses the L2-norm output of the tower directly into the similarity
matmul's producer chain.

Used by the plain ``Recommender`` serve path and the bench;
``MonitoredRecommender`` keeps the two-call path because its API contract
reports encode and similarity timings separately
(/root/reference/src/inference/serve_recommendations.py:244-277).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from instacart_next_order_recommendation_tpu.models.encoder import TowerConfig, encode
from instacart_next_order_recommendation_tpu.ops import cosine_topk


class FusedServePipeline:
    """One-dispatch (ids, mask) -> (scores, indices) over a resident catalog."""

    def __init__(self, params, config: TowerConfig, catalog: jax.Array, n_valid: int):
        self.params = params
        self.config = config
        self.catalog = catalog
        self.n_valid = n_valid
        self._jitted: dict[int, object] = {}

    def _fn(self, k: int):
        if k not in self._jitted:
            config, n_valid = self.config, self.n_valid

            @jax.jit
            def run(params, ids, mask, catalog):
                emb = encode(params, ids, mask, config)
                s, i = cosine_topk(emb, catalog, k, n_valid=n_valid)
                # Pack scores + bitcast indices into ONE [B, 2k] f32 array so
                # the host fetches a single transfer (each device->host round
                # trip costs real latency on tunneled setups).
                return jnp.concatenate(
                    [s, jax.lax.bitcast_convert_type(i, jnp.float32)], axis=1
                )

            self._jitted[k] = run
        return self._jitted[k]

    def topk_device(self, ids: np.ndarray, mask: np.ndarray, k: int):
        """Async: returns the packed [B, 2k] device array (see ``unpack``)."""
        k = min(k, self.n_valid)
        return self._fn(k)(self.params, jnp.asarray(ids), jnp.asarray(mask), self.catalog), k

    @staticmethod
    def unpack(packed: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
        scores = packed[:, :k]
        indices = np.ascontiguousarray(packed[:, k:]).view(np.int32)
        return scores, indices

    def topk(self, ids: np.ndarray, mask: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
        packed, k = self.topk_device(ids, mask, k)
        return self.unpack(np.asarray(packed), k)
