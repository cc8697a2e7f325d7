"""Contrastive training loop (MNRL) with mesh-sharded data parallelism."""

from instacart_next_order_recommendation_tpu.train.trainer import (
    TrainConfig,
    TwoTowerTrainer,
)

__all__ = ["TrainConfig", "TwoTowerTrainer"]
