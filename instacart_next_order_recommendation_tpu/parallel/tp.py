"""Megatron-style tensor-parallel region markers for shard_map forwards.

Inside ``shard_map`` the GSPMD partitioner is out of the picture: the program
is written against LOCAL shards and every collective is explicit. For a
column-parallel -> row-parallel pair (attention QKV/O, FFN w1/w2) the classic
Megatron construction needs two linear ops:

- ``tp_enter`` (Megatron's *f*): identity in the forward, **psum over the
  model axis in the backward**. Placed where a replicated activation enters a
  column-parallel region — each device's backward only carries its shard's
  contribution to the input cotangent, so the cotangents must be all-reduced.
- ``tp_exit`` (Megatron's *g*): **psum in the forward**, identity in the
  backward. Placed on the partial output of the row-parallel matmul — the
  cotangent of a replicated activation is already full on every device.

With both markers in place, gradients of replicated params (embeddings,
layernorms, post-psum biases) come out identical and FULL on every model-axis
device (no extra reduction needed), and gradients of tensor-parallel shards
come out local to their shard.

The reference has no tensor parallelism at all (single-process training,
/root/reference/src/training/train_sbert.py:213-217); this exists so the
tpu-native tower can scale past replication while keeping Pallas kernels
active (a pallas_call inside shard_map sees local shapes; under jit-GSPMD it
is an opaque custom call the partitioner cannot split).
"""

from __future__ import annotations

import functools

import jax


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def tp_enter(x: jax.Array, axis_name: str) -> jax.Array:
    """Identity forward / psum backward over ``axis_name``."""
    return x


def _enter_fwd(x, axis_name):
    return x, None


def _enter_bwd(axis_name, _, ct):
    return (jax.lax.psum(ct, axis_name),)


tp_enter.defvjp(_enter_fwd, _enter_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def tp_exit(x: jax.Array, axis_name: str) -> jax.Array:
    """Psum forward / identity backward over ``axis_name``."""
    return jax.lax.psum(x, axis_name)


def _exit_fwd(x, axis_name):
    return jax.lax.psum(x, axis_name), None


def _exit_bwd(axis_name, _, ct):
    return (ct,)


tp_exit.defvjp(_exit_fwd, _exit_bwd)
