"""Transformer towers (pure-functional JAX) and checkpoint IO."""

from instacart_next_order_recommendation_tpu.models.encoder import (
    TowerConfig,
    MINILM_L6,
    MPNET_BASE_CLASS,
    init_params,
    encode,
)
from instacart_next_order_recommendation_tpu.models.checkpoint import (
    load_tower,
    save_tower,
)

__all__ = [
    "TowerConfig",
    "MINILM_L6",
    "MPNET_BASE_CLASS",
    "init_params",
    "encode",
    "save_tower",
    "load_tower",
]
