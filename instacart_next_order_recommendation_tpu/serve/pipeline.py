"""Fused serving pipeline: tokenized batch -> top-k in ONE device dispatch.

The two-call path (encode, then top-k) costs two dispatch round trips per
batch; on tunneled TPU setups the RTT dominates the sub-millisecond compute.
This pipeline jits ``topk(encode(ids), catalog)`` as a single program —
XLA also fuses the L2-norm output of the tower directly into the similarity
matmul's producer chain. The wire carries only token ids (int16 when the
vocab fits): the attention mask is recomputed on device from pad positions,
halving-to-quartering the per-batch upload.

Used by the plain ``Recommender`` serve path, the bench, and (since r4)
``MonitoredRecommender`` and the micro-batcher: the per-stage stats contract
(/root/reference/src/inference/serve_recommendations.py:244-277) is kept by
reporting device-calibrated stage timings (recommender.StageCalibrator)
instead of paying a second round trip per request to wall-clock the stages.
``ITOR_MONITORED_SINGLE_DISPATCH=0`` restores the two-call monitored path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from instacart_next_order_recommendation_tpu.models.encoder import TowerConfig
from instacart_next_order_recommendation_tpu.models.text_encoder import encode_from_ids
from instacart_next_order_recommendation_tpu.ops import cosine_topk


class FusedServePipeline:
    """One-dispatch ids -> (scores, indices) over a resident catalog."""

    def __init__(
        self,
        params,
        config: TowerConfig,
        catalog: jax.Array,
        n_valid: int,
        pad_id: int = 0,
        packed: bool = False,
    ):
        from instacart_next_order_recommendation_tpu.serve.aot import AotStore

        self.params = params
        self.config = config
        self.catalog = catalog
        self.n_valid = n_valid
        self.pad_id = pad_id
        # Packed-extraction top-k (ops/topk.py): opt-in for huge catalogs;
        # scores come back quantized to ~3 decimal digits.
        self.packed = packed
        self.wire_dtype = (
            np.int16 if config.vocab_size <= np.iinfo(np.int16).max else np.int32
        )
        self._jitted: dict[int, object] = {}
        self._aot = AotStore.from_env()

    def _fn(self, k: int):
        if k not in self._jitted:
            config, n_valid, pad_id = self.config, self.n_valid, self.pad_id
            packed = self.packed

            @jax.jit
            def run(params, ids, catalog):
                emb = encode_from_ids(params, ids, config=config, pad_id=pad_id)
                s, i = cosine_topk(emb, catalog, k, n_valid=n_valid, packed=packed)
                # Pack scores + indices into ONE [B, 2k] array so the host
                # fetches a single transfer (each device->host round trip
                # costs real latency on tunneled setups). Pack in INT space:
                # small int32 indices bitcast to f32 are denormals, which the
                # TPU flushes to zero; f32 score bit patterns as int32 are
                # ordinary integers and survive any data path.
                return jnp.concatenate(
                    [jax.lax.bitcast_convert_type(s, jnp.int32), i], axis=1
                )

            self._jitted[k] = run
        return self._jitted[k]

    def topk_device(self, ids: np.ndarray, mask: np.ndarray | None, k: int):
        """Async: returns the packed [B, 2k] device array (see ``unpack``).

        ``mask`` is accepted for API symmetry with the tokenizer but never
        transferred — pad positions in ``ids`` determine it on device.
        """
        k = min(k, self.n_valid)
        args = (self.params, jnp.asarray(ids.astype(self.wire_dtype)), self.catalog)
        if self._aot is not None:
            c = self.config
            # The key must pin everything that changes the compiled program
            # or its argument shapes: tower architecture (vocab sizes the
            # embedding table; heads/intermediate change the graph), the
            # baked-in pad_id, wire dtype, and the catalog/batch shapes. A
            # collision would deserialize an executable whose arg shapes
            # don't match (runtime crash) or, worse for pad_id, run silently
            # with wrong attention masks.
            from instacart_next_order_recommendation_tpu.ops.topk import (
                topk_cache_suffix,
            )

            key = (
                f"fused_{c.num_layers}x{c.hidden_size}h{c.num_heads}"
                f"i{c.intermediate_size}v{c.vocab_size}_p{self.pad_id}"
                f"_{np.dtype(self.wire_dtype).name}_k{k}"
                f"_b{ids.shape[0]}_s{ids.shape[1]}"
                f"_n{self.catalog.shape[0]}_{self.catalog.dtype}"
                + topk_cache_suffix(self.packed)
            )
            return self._aot.run(key, self._fn(k), args), k
        return self._fn(k)(*args), k

    @staticmethod
    def unpack(packed: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
        scores = np.ascontiguousarray(packed[:, :k]).view(np.float32)
        indices = packed[:, k:]
        return scores, indices

    def topk(
        self, ids: np.ndarray, mask: np.ndarray | None, k: int
    ) -> tuple[np.ndarray, np.ndarray]:
        packed, k = self.topk_device(ids, mask, k)
        return self.unpack(np.asarray(packed), k)
