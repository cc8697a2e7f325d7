"""Data preparation: Instacart CSVs -> (anchor, positive) pairs + IR artifacts."""

from instacart_next_order_recommendation_tpu.data.prepare import (
    DataPrepConfig,
    InstacartDataPrep,
    strip_next_order_from_context,
)

__all__ = ["DataPrepConfig", "InstacartDataPrep", "strip_next_order_from_context"]
