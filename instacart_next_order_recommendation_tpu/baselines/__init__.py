"""Baselines: content-based (untrained tower) and item-item CF."""

from instacart_next_order_recommendation_tpu.baselines.content_based import (
    ContentBasedBaseline,
)
from instacart_next_order_recommendation_tpu.baselines.collaborative_filtering import (
    ItemItemCFBaseline,
    load_eval_data,
)

__all__ = ["ContentBasedBaseline", "ItemItemCFBaseline", "load_eval_data"]
