"""TPU compute ops: Pallas kernels with jnp reference implementations.

Every op has two implementations:

- ``*_reference`` — pure ``jnp``; the numerical oracle, runs anywhere (CPU
  tests, interpret mode) and is what XLA fuses on non-TPU backends.
- ``*_pallas``    — hand-written Pallas TPU kernel for the hot path.

``use_pallas()`` picks the backend: Pallas on real TPU devices, reference
elsewhere. Override with env var ``ITOR_FORCE_PALLAS=1`` (interpret mode on
CPU) or ``ITOR_DISABLE_PALLAS=1``.
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax


@lru_cache(maxsize=1)
def use_pallas() -> bool:
    """Pallas on TPU; jnp references elsewhere.

    Multi-device note: a pallas_call is an opaque custom call to GSPMD, so
    under jit over a multi-device mesh XLA would replicate its operands.
    The batch-parallel ops (attention, pool+norm) carry
    ``custom_partitioning`` sharding rules (ops/partition.py) that keep the
    kernels shard-local under jit-GSPMD, so they are enabled on any TPU
    topology. Ops invoked INSIDE shard_map see local shapes and are always
    safe. The catalog top-k keeps its own gate: its multi-device form is the
    shard_map path in index/sharded.py.
    """
    if os.getenv("ITOR_DISABLE_PALLAS", "").strip() in ("1", "true"):
        return False
    if os.getenv("ITOR_FORCE_PALLAS", "").strip() in ("1", "true"):
        return True
    return jax.default_backend() == "tpu"


@lru_cache(maxsize=1)
def pallas_interpret() -> bool:
    """Interpret mode: required when forcing Pallas on non-TPU backends."""
    return jax.default_backend() != "tpu"


from instacart_next_order_recommendation_tpu.ops.attention import (  # noqa: E402
    multi_head_attention,
)
from instacart_next_order_recommendation_tpu.ops.pool_norm import (  # noqa: E402
    masked_mean_pool_l2norm,
)
from instacart_next_order_recommendation_tpu.ops.topk import (  # noqa: E402
    cosine_topk,
)
from instacart_next_order_recommendation_tpu.ops.mnrl import (  # noqa: E402
    mnrl_loss,
)
from instacart_next_order_recommendation_tpu.ops.fused_layer import (  # noqa: E402
    fused_encoder_layer,
)

__all__ = [
    "use_pallas",
    "pallas_interpret",
    "multi_head_attention",
    "masked_mean_pool_l2norm",
    "cosine_topk",
    "mnrl_loss",
    "fused_encoder_layer",
]
