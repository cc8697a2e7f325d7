"""Content-based baseline: the same tower architecture, untrained.

Reference equivalent: frozen pretrained SBERT with no fine-tuning
(/root/reference/src/baselines/content_based.py:16-64) — it isolates the gain
from contrastive training. Offline-from-scratch regime: "untrained" means a
freshly initialized tower with a corpus-trained vocab (or any checkpoint dir
passed as ``model``), encoded and ranked with the same fused cosine top-k.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import jax
import numpy as np

from instacart_next_order_recommendation_tpu.models import (
    MINILM_L6,
    init_params,
)
from instacart_next_order_recommendation_tpu.models.text_encoder import TextEncoder
from instacart_next_order_recommendation_tpu.tokenizer import WordPieceTokenizer


def untrained_encoder(
    corpus_texts,
    vocab_size: int = 30000,
    seed: int = 0,
    preset=MINILM_L6,
    max_seq_length: int = 256,
) -> TextEncoder:
    """Freshly initialized tower with a corpus-trained vocab."""
    tok = WordPieceTokenizer.train(corpus_texts, vocab_size=vocab_size)
    cfg = dataclasses.replace(preset, vocab_size=tok.vocab_size, max_seq_length=max_seq_length)
    params = init_params(cfg, jax.random.key(seed))
    return TextEncoder(params, cfg, tok, max_seq_length)


class ContentBasedBaseline:
    """Rank products for each query by untrained-tower cosine similarity."""

    def __init__(
        self,
        eval_queries: dict[str, str],
        eval_corpus: dict[str, str],
        model: str | Path | TextEncoder | None = None,
        batch_size: int = 64,
    ):
        self.eval_queries = eval_queries
        self.eval_corpus = eval_corpus
        self.product_ids = list(eval_corpus.keys())
        self.corpus_texts = [eval_corpus[pid] for pid in self.product_ids]
        self.batch_size = batch_size
        if isinstance(model, TextEncoder):
            self.encoder = model
        elif model is not None:
            self.encoder = TextEncoder.load(model)
        else:
            self.encoder = untrained_encoder(self.corpus_texts)
        self.corpus_embeddings = self.encoder.encode(self.corpus_texts, batch_size=batch_size)

    def rank_all(self, top_k: int | None = None) -> dict[str, list[str]]:
        """query_id -> ranked product ids (descending score).

        ``top_k=None`` ranks the full corpus (reference behavior); a cutoff
        uses the fused top-k kernel instead of a full sort.
        """
        query_ids = list(self.eval_queries.keys())
        query_emb = self.encoder.encode(
            [self.eval_queries[q] for q in query_ids], batch_size=self.batch_size
        )
        if top_k is None:
            sim = query_emb @ self.corpus_embeddings.T
            order = np.argsort(-sim, axis=1, kind="stable")
        else:
            from instacart_next_order_recommendation_tpu.eval.evaluator import (
                RetrievalEvaluator,
            )

            ev = RetrievalEvaluator(
                self.eval_queries, self.eval_corpus, {}, self.batch_size, top_k
            )
            order = ev.rank(query_emb, self.corpus_embeddings)
        ids = np.asarray(self.product_ids, dtype=object)
        return {qid: list(ids[order[i]]) for i, qid in enumerate(query_ids)}
