"""instacart_next_order_recommendation_tpu — a TPU-native two-tower retrieval engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
chen-bowen/instacart_next_order_recommendation (reference: /root/reference):

- ``data``      — vectorized Instacart data prep (user-context / product text contracts)
- ``tokenizer`` — WordPiece tokenizer (BERT-compatible vocab format, trainable from corpus)
- ``models``    — MiniLM-class transformer tower (pure-functional JAX, bf16 on MXU)
- ``ops``       — Pallas TPU kernels (fused attention, pool+L2-norm, cosine top-k) with
                  jnp reference implementations as test oracles and CPU fallbacks
- ``train``     — MultipleNegativesRankingLoss training loop with cross-device
                  all-gathered in-batch negatives over a ``jax.sharding.Mesh``
- ``eval``      — IR metrics (Accuracy@k / Recall@10 / MRR@10 / NDCG@10 / MAP@100)
- ``index``     — row-sharded catalog embedding index with on-disk manifest cache
- ``serve``     — Recommender / MonitoredRecommender + CLI
- ``baselines`` — content-based (untrained tower) and item-item CF baselines
- ``api``       — HTTP service (stdlib-server based): /recommend /feedback /admin/corpus
                  /health /ready /metrics, API-key auth, rate limiting, SQLite feedback
- ``parallel``  — mesh bootstrap and collective helpers (data/model axes)
"""

__version__ = "0.1.0"
