"""Host-side tokenization feeding fixed-shape int32 batches to the TPU."""

from instacart_next_order_recommendation_tpu.tokenizer.wordpiece import (
    WordPieceTokenizer,
    bucket_length,
)

__all__ = ["WordPieceTokenizer", "bucket_length"]
