"""Catalog embedding index: disk cache + row-sharded device index + IVF ANN."""

from instacart_next_order_recommendation_tpu.index.embedding_index import EmbeddingIndex
from instacart_next_order_recommendation_tpu.index.ivf import IVFCatalogIndex
from instacart_next_order_recommendation_tpu.index.sharded import ShardedCatalogIndex

__all__ = ["EmbeddingIndex", "IVFCatalogIndex", "ShardedCatalogIndex"]
