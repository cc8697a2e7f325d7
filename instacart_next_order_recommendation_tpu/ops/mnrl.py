"""MultipleNegativesRankingLoss with cross-device in-batch negatives.

From-scratch equivalent of sentence-transformers'
``MultipleNegativesRankingLoss(scale=30)`` used by the reference trainer
(/root/reference/src/training/train_sbert.py:182-185): softmax cross-entropy
over ``scale * (Q . P^T)`` where each query's positive is the diagonal and
every other positive in the batch is a negative.

TPU-native extension: when ``axis_name`` is given (running inside
``shard_map``/``pjit`` over the data axis), positives are all-gathered across
devices so the negative pool is the GLOBAL batch — the effective-batch scaling
the reference could not express (it only approximates via the NO_DUPLICATES
sampler, train_sbert.py:233). Queries stay local; only the [B, D] positive
block rides the ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mnrl_loss(
    query_emb: jax.Array,
    positive_emb: jax.Array,
    scale: float = 30.0,
    axis_name: str | None = None,
) -> jax.Array:
    """Mean softmax CE over in-batch (optionally cross-device) negatives.

    Args:
        query_emb: [B, D] L2-normalized anchor embeddings (local shard).
        positive_emb: [B, D] L2-normalized positive embeddings (local shard).
        scale: similarity temperature (reference default 30.0).
        axis_name: mesh axis to all-gather positives over, or None.

    Returns:
        Scalar loss (f32).
    """
    local_b = query_emb.shape[0]
    if axis_name is not None:
        all_pos = jax.lax.all_gather(positive_emb, axis_name, axis=0, tiled=True)
        label_shift = jax.lax.axis_index(axis_name) * local_b
    else:
        all_pos = positive_emb
        label_shift = 0

    logits = (
        jax.lax.dot_general(
            query_emb,
            all_pos,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
    )  # (B, B_global)

    labels = jnp.arange(local_b, dtype=jnp.int32) + label_shift
    log_z = jax.nn.logsumexp(logits, axis=1)
    pos_logit = jnp.take_along_axis(logits, labels[:, None], axis=1)[:, 0]
    return jnp.mean(log_z - pos_logit)
