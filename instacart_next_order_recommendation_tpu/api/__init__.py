"""HTTP API service (stdlib server): /recommend /feedback /admin/corpus
/health /ready /metrics with auth, rate limiting, and Prometheus metrics."""

from instacart_next_order_recommendation_tpu.api.app import create_app

__all__ = ["create_app"]
