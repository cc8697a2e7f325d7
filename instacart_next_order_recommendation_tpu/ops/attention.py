"""Multi-head attention: Pallas TPU kernel + jnp reference.

Replaces the torch attention inside sentence-transformers' BERT encoder
(invoked from /root/reference/src/training/train_sbert.py:128-137 and
serve_recommendations.py:195-213 via ``SentenceTransformer.encode``).

Shapes: q/k/v are ``[batch, heads, seq, head_dim]``; ``mask`` is
``[batch, seq]`` with 1 = real token. Sequences are short (<=512; default 256)
so each (batch, head) program holds the full S x S score tile in VMEM — no
streaming needed. Softmax runs in f32; matmuls hit the MXU via
``preferred_element_type``.

The op is differentiable: forward uses the Pallas kernel, backward recomputes
attention with jnp (rematerialization trades FLOPs for HBM, the standard
flash-attention trick).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e9


def _attention_math(q, k, v, mask, scale):
    """Shared attention math (f32 softmax). q/k/v: [..., S, D]; mask: [S] bias axis."""
    logits = (
        jnp.einsum("...qd,...kd->...qk", q, k, preferred_element_type=jnp.float32) * scale
    )
    bias = (1.0 - mask.astype(jnp.float32)) * _NEG_INF
    logits = logits + bias
    logits = logits - jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
    probs = jnp.exp(logits)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    return jnp.einsum("...qk,...kd->...qd", probs.astype(v.dtype), v)


def multi_head_attention_reference(
    q: jax.Array, k: jax.Array, v: jax.Array, mask: jax.Array, scale: float
) -> jax.Array:
    """jnp oracle: [B, H, S, D] attention with key-side padding mask."""
    return _attention_math(q, k, v, mask[:, None, None, :], scale)


def _batch_block(batch: int, seq: int) -> int:
    """Batches per program: large enough to amortize program launch overhead
    (a (batch, heads) grid of single-example programs is launch-bound at MiniLM
    shapes), small enough that the f32 [BB, S, S] score tile plus q/k/v blocks
    fit comfortably in VMEM. Must divide ``batch`` exactly."""
    cap = max(1, (4 << 20) // (seq * seq * 4))  # ~4MB of f32 scores
    bb = min(16, cap, batch)
    while batch % bb:
        bb -= 1
    return bb


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale):
    q = q_ref[:, 0]  # [BB, S, D]
    k = k_ref[:, 0]
    v = v_ref[:, 0]
    mask = mask_ref[...]  # [BB, S]
    logits = (
        jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        * scale
    )
    logits = logits + (1.0 - mask.astype(jnp.float32))[:, None, :] * _NEG_INF  # key-side
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[:, 0] = out.astype(o_ref.dtype)


def _attention_pallas_fwd_impl(q, k, v, mask, scale, interpret):
    batch, heads, seq, head_dim = q.shape
    bb = _batch_block(batch, seq)
    kernel = functools.partial(_attn_kernel, scale=scale)
    qkv_spec = pl.BlockSpec(
        (bb, 1, seq, head_dim), lambda b, h: (b, h, 0, 0), memory_space=pl.ANY if interpret else pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(batch // bb, heads),
        in_specs=[
            qkv_spec,
            qkv_spec,
            qkv_spec,
            pl.BlockSpec((bb, seq), lambda b, h: (b, 0), memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * batch * heads * seq * seq * head_dim,
            bytes_accessed=4 * batch * heads * seq * head_dim * q.dtype.itemsize,
            transcendentals=batch * heads * seq * seq,
        ),
        interpret=interpret,
    )(q, k, v, mask)


@functools.lru_cache(maxsize=None)
def _attn_fwd_partitioned(scale, interpret):
    """custom_partitioning wrapper: batch/head partitionable, seq/dim replicated."""
    from instacart_next_order_recommendation_tpu.ops.partition import batch_partitioned

    def impl(q, k, v, mask):
        return _attention_pallas_fwd_impl(q, k, v, mask, scale, interpret)

    return batch_partitioned(
        impl,
        rule="b h s d1, b h s d2, b h s d3, b s -> b h s d3",
        need_replication=("s", "d1", "d2", "d3"),
    )


@functools.lru_cache(maxsize=None)
def _attn_bwd_partitioned(scale, interpret):
    from instacart_next_order_recommendation_tpu.ops.partition import batch_partitioned

    def impl(q, k, v, mask, g):
        return _attention_pallas_bwd_impl(q, k, v, mask, g, scale, interpret)

    return batch_partitioned(
        impl,
        rule="b h s d1, b h s d2, b h s d3, b s, b h s d4 -> b h s d1, b h s d2, b h s d3",
        need_replication=("s", "d1", "d2", "d3", "d4"),
    )


def _dispatch_fwd(q, k, v, mask, scale, interpret):
    # Single device: call the kernel directly. Multi-device: go through the
    # partitioning wrapper so jit-GSPMD shards batch/heads instead of
    # replicating (inside shard_map the wrapper sees one device and is inert).
    if jax.device_count() == 1:
        return _attention_pallas_fwd_impl(q, k, v, mask, scale, interpret)
    return _attn_fwd_partitioned(scale, interpret)(q, k, v, mask)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _attention_pallas(q, k, v, mask, scale, interpret):
    return _dispatch_fwd(q, k, v, mask, scale, interpret)


def _attention_pallas_fwd(q, k, v, mask, scale, interpret):
    out = _dispatch_fwd(q, k, v, mask, scale, interpret)
    return out, (q, k, v, mask)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale):
    """Recompute-flash backward per (batch-block, head) program.

    With P = softmax(scale·QKᵀ + bias):
        dV = Pᵀ·dO,  dP = dO·Vᵀ,  D = rowsum(P∘dP),
        dS = P∘(dP − D),  dQ = scale·dS·K,  dK = scale·dSᵀ·Q.
    Everything stays in VMEM (S ≤ 512); f32 math, outputs cast back.
    """
    q = q_ref[:, 0]  # [BB, S, D]
    k = k_ref[:, 0]
    v = v_ref[:, 0]
    do = do_ref[:, 0].astype(jnp.float32)
    mask = mask_ref[...]  # [BB, S]

    def dot(a, bb, trans_a=False, trans_b=False):
        ca = 1 if trans_a else 2
        cb = 2 if trans_b else 1
        return jax.lax.dot_general(
            a, bb, dimension_numbers=(((ca,), (cb,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    logits = dot(q, k, trans_b=True) * scale + (1.0 - mask.astype(jnp.float32))[:, None, :] * _NEG_INF
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)  # (BB, S, S) f32

    dv = dot(p, do, trans_a=True)  # (BB, S, D)
    dp = dot(do, v.astype(jnp.float32), trans_b=True)  # (BB, S, S)
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)
    ds = p * (dp - delta)
    dq = dot(ds, k.astype(jnp.float32)) * scale
    dk = dot(ds, q.astype(jnp.float32), trans_a=True) * scale

    dq_ref[:, 0] = dq.astype(dq_ref.dtype)
    dk_ref[:, 0] = dk.astype(dk_ref.dtype)
    dv_ref[:, 0] = dv.astype(dv_ref.dtype)


def _attention_pallas_bwd_impl(q, k, v, mask, g, scale, interpret):
    batch, heads, seq, head_dim = q.shape
    # Backward holds ~4 f32 [BB, S, S] tiles live; halve the forward block.
    bb = _batch_block(batch, seq)
    bb = max(1, bb // 2) if batch % max(1, bb // 2) == 0 else 1
    kernel = functools.partial(_attn_bwd_kernel, scale=scale)
    spec = pl.BlockSpec(
        (bb, 1, seq, head_dim), lambda b, h: (b, h, 0, 0),
        memory_space=pl.ANY if interpret else pltpu.VMEM,
    )
    mask_spec = pl.BlockSpec(
        (bb, seq), lambda b, h: (b, 0), memory_space=pl.ANY if interpret else pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(batch // bb, heads),
        in_specs=[spec, spec, spec, mask_spec, spec],
        out_specs=[spec, spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * batch * heads * seq * seq * head_dim,
            bytes_accessed=8 * batch * heads * seq * head_dim * q.dtype.itemsize,
            transcendentals=batch * heads * seq * seq,
        ),
        interpret=interpret,
    )(q, k, v, mask, g)


def _attention_pallas_bwd(scale, interpret, residuals, g):
    q, k, v, mask = residuals
    if jax.device_count() == 1:
        dq, dk, dv = _attention_pallas_bwd_impl(q, k, v, mask, g, scale, interpret)
    else:
        dq, dk, dv = _attn_bwd_partitioned(scale, interpret)(q, k, v, mask, g)
    return dq, dk, dv, None


_attention_pallas.defvjp(_attention_pallas_fwd, _attention_pallas_bwd)


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array,
    scale: float,
    training: bool = False,
) -> jax.Array:
    """Dispatching entry point; see module docstring for shapes.

    Training and inference both default to the Pallas kernels on TPU (the
    hand-written fwd + recompute-flash bwd pair). The one-time compile of the
    fwd+bwd graph is absorbed by the persistent compilation cache
    (utils/cache.py), so only the first run on a fresh machine pays it.
    ``ITOR_PALLAS_TRAIN=0`` opts training out (escape hatch for
    remote-compile-constrained debugging; inference is unaffected).
    """
    import os

    from instacart_next_order_recommendation_tpu.ops import pallas_interpret, use_pallas

    if training and os.getenv("ITOR_PALLAS_TRAIN", "").strip() in ("0", "false"):
        return multi_head_attention_reference(q, k, v, mask, scale)
    if use_pallas():
        return _attention_pallas(q, k, v, mask, scale, pallas_interpret())
    return multi_head_attention_reference(q, k, v, mask, scale)
