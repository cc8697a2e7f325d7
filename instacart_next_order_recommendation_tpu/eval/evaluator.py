"""Batch retrieval evaluator.

TPU-native equivalent of sentence-transformers'
``InformationRetrievalEvaluator`` used per epoch by the reference trainer
(/root/reference/src/training/train_sbert.py:187-202): encodes the eval
queries and the full corpus, retrieves top-K by cosine similarity with the
fused top-k op, and computes the IR metric suite.
"""

from __future__ import annotations

import logging
from typing import Mapping

import jax.numpy as jnp
import numpy as np

from instacart_next_order_recommendation_tpu.eval.metrics import (
    compute_ir_metrics_from_arrays,
)
from instacart_next_order_recommendation_tpu.models.text_encoder import TextEncoder
from instacart_next_order_recommendation_tpu.ops import cosine_topk

logger = logging.getLogger(__name__)


class RetrievalEvaluator:
    """Evaluates a tower on (queries, corpus, relevant_docs) IR artifacts."""

    def __init__(
        self,
        queries: Mapping[str, str],
        corpus: Mapping[str, str],
        relevant_docs: Mapping[str, set[str]],
        batch_size: int = 64,
        top_k: int = 100,
        name: str = "order-recommendation",
    ):
        self.query_ids = list(queries.keys())
        self.query_texts = [queries[q] for q in self.query_ids]
        self.corpus_ids = list(corpus.keys())
        self.corpus_texts = [corpus[c] for c in self.corpus_ids]
        self.relevant_docs = {k: set(v) for k, v in relevant_docs.items()}
        self.batch_size = batch_size
        self.top_k = min(top_k, len(self.corpus_ids))
        self.name = name

    def __call__(self, encoder: TextEncoder) -> dict[str, float]:
        corpus_emb = encoder.encode(self.corpus_texts, batch_size=self.batch_size)
        query_emb = encoder.encode(self.query_texts, batch_size=self.batch_size)
        ranked = self.rank(query_emb, corpus_emb)
        return compute_ir_metrics_from_arrays(
            ranked, self.query_ids, self.relevant_docs, self.corpus_ids
        )

    def rank(self, query_emb: np.ndarray, corpus_emb: np.ndarray) -> np.ndarray:
        """Top-K corpus row indices per query, best first ([n_queries, K])."""
        catalog = jnp.asarray(corpus_emb)
        n = len(query_emb)
        bs = self.batch_size
        out = np.empty((n, self.top_k), dtype=np.int64)
        for lo in range(0, n, bs):
            hi = min(lo + bs, n)
            q = np.zeros((bs, query_emb.shape[1]), dtype=query_emb.dtype)
            q[: hi - lo] = query_emb[lo:hi]
            _, idx = cosine_topk(jnp.asarray(q), catalog, self.top_k)
            out[lo:hi] = np.asarray(idx[: hi - lo])
        return out
