"""Serving core: Recommender / MonitoredRecommender and CLI."""

from instacart_next_order_recommendation_tpu.serve.recommender import (
    MonitoredRecommender,
    Recommender,
    RecommendationMetrics,
)

__all__ = ["Recommender", "MonitoredRecommender", "RecommendationMetrics"]
