"""Offline IR evaluation: metrics and the batch retrieval evaluator."""

from instacart_next_order_recommendation_tpu.eval.metrics import compute_ir_metrics

__all__ = ["compute_ir_metrics"]
