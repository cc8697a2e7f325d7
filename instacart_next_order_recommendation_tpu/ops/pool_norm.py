"""Fused masked mean-pooling + L2 normalization.

Reproduces sentence-transformers' pooling semantics (mean over real tokens
with the count clamped to 1e-9, then p=2 normalization) that the reference
relies on via ``normalize_embeddings=True``
(/root/reference/src/inference/serve_recommendations.py:195-213). Wrong
pooling semantics silently destroy retrieval quality (SURVEY.md §7 hard
parts), so the jnp reference here is the oracle the Pallas kernel is tested
against.

Input ``hidden`` is [batch, seq, dim]; ``mask`` is [batch, seq] (1 = real).
Output is [batch, dim], unit L2 norm, f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def masked_mean_pool_l2norm_reference(hidden: jax.Array, mask: jax.Array) -> jax.Array:
    m = mask.astype(jnp.float32)[..., None]
    summed = jnp.sum(hidden.astype(jnp.float32) * m, axis=1)
    count = jnp.maximum(jnp.sum(m, axis=1), 1e-9)
    pooled = summed / count
    norm = jnp.maximum(jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12)
    return pooled / norm


def _pool_kernel(hidden_ref, mask_ref, out_ref):
    hidden = hidden_ref[:].astype(jnp.float32)  # (Bb, S, H)
    mask = mask_ref[:].astype(jnp.float32)  # (Bb, S)
    summed = jnp.sum(hidden * mask[..., None], axis=1)  # (Bb, H)
    count = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1e-9)
    pooled = summed / count
    sq = jnp.sum(pooled * pooled, axis=-1, keepdims=True)
    norm = jnp.maximum(jnp.sqrt(sq), 1e-12)
    out_ref[:] = pooled / norm


def masked_mean_pool_l2norm_pallas(
    hidden: jax.Array, mask: jax.Array, interpret: bool = False, block_batch: int = 8
) -> jax.Array:
    batch, seq, dim = hidden.shape
    block_batch = min(block_batch, batch)
    while batch % block_batch != 0:
        # Largest divisor of batch <= the requested block: a ragged batch
        # must not collapse to one whole-batch block, which would demand the
        # entire [batch, seq, dim] tensor in VMEM and fail for large batches.
        block_batch -= 1
    grid = (batch // block_batch,)
    return pl.pallas_call(
        _pool_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_batch, seq, dim), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_batch, seq), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_batch, dim), lambda b: (b, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, dim), jnp.float32),
        interpret=interpret,
    )(hidden, mask)


def masked_mean_pool_l2norm(hidden: jax.Array, mask: jax.Array) -> jax.Array:
    """Dispatching entry point. Differentiable in both backends.

    The Pallas path is linear-algebra simple enough that we let JAX derive the
    VJP through the reference implementation (pool+norm is <1% of tower FLOPs;
    the kernel's value is fusing two HBM round-trips in the serve path).
    """
    from instacart_next_order_recommendation_tpu.ops import pallas_interpret, use_pallas

    if use_pallas():
        return _pool_with_ref_grad(hidden, mask)
    return masked_mean_pool_l2norm_reference(hidden, mask)


@functools.lru_cache(maxsize=None)
def _pool_partitioned(interpret):
    """custom_partitioning wrapper: batch partitionable, seq/dim replicated
    (the mean reduces over seq; the L2 norm reduces over dim)."""
    from instacart_next_order_recommendation_tpu.ops.partition import batch_partitioned

    def impl(hidden, mask):
        return masked_mean_pool_l2norm_pallas(hidden, mask, interpret=interpret)

    return batch_partitioned(impl, rule="b s h, b s -> b h", need_replication=("s", "h"))


@jax.custom_vjp
def _pool_with_ref_grad(hidden, mask):
    from instacart_next_order_recommendation_tpu.ops import pallas_interpret

    if jax.device_count() == 1:
        return masked_mean_pool_l2norm_pallas(hidden, mask, interpret=pallas_interpret())
    return _pool_partitioned(pallas_interpret())(hidden, mask)


def _pool_fwd(hidden, mask):
    return _pool_with_ref_grad(hidden, mask), (hidden, mask)


def _pool_bwd(residuals, g):
    hidden, mask = residuals
    dh = jax.vjp(lambda h: masked_mean_pool_l2norm_reference(h, mask), hidden)[1](g)[0]
    return dh, None


_pool_with_ref_grad.defvjp(_pool_fwd, _pool_bwd)
