"""Shared utilities: colored logging, YAML config loading, path resolution."""

from instacart_next_order_recommendation_tpu.utils.logging import (
    ColoredFormatter,
    setup_colored_logging,
)
from instacart_next_order_recommendation_tpu.utils.resolve import (
    resolve_corpus_with_hf_fallback,
    resolve_processed_dir,
)
from instacart_next_order_recommendation_tpu.utils.config import load_yaml_config

__all__ = [
    "ColoredFormatter",
    "setup_colored_logging",
    "resolve_processed_dir",
    "resolve_corpus_with_hf_fallback",
    "load_yaml_config",
]
