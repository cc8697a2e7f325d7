"""GSPMD partitioning rules for Pallas ops.

A ``pallas_call`` lowers to an opaque custom call, so the SPMD partitioner
cannot see which dimensions are embarrassingly parallel: under ``jit`` over a
multi-device mesh it would replicate every operand (correct but wasteful —
the whole batch rides the ICI to every chip). ``custom_partitioning`` with a
Shardy einsum-style sharding rule declares the batch (and head) dimensions
partitionable, so XLA runs the kernel per-shard on local data with no
resharding, exactly like a hand-written ``shard_map`` would — but composable
with the jit-GSPMD training/encode steps where shardings are annotations, not
explicit maps.

The reference has no analog (single-device torch throughout; closest is the
implicit DDP replication in HF Trainer, /root/reference/src/training/
train_sbert.py:213). This module is what lets the TPU build keep hand-written
kernels on the hot path while scaling via sharding annotations alone.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import jax
from jax.experimental.custom_partitioning import custom_partitioning


def batch_partitioned(
    impl: Callable,
    rule: str,
    need_replication: Sequence[str],
) -> Callable:
    """Wrap ``impl`` so GSPMD partitions it along the rule's free factors.

    Args:
        impl: function of array operands only (static config must be closed
            over) whose semantics are independent per-row along partitionable
            factors.
        rule: Shardy einsum-like sharding rule, e.g. ``"b s h, b s -> b h"``.
        need_replication: factors that must stay replicated because the
            kernel needs the full extent (e.g. the softmax/seq axis, feature
            axes that are reduced or normalized over).
    """
    wrapped = custom_partitioning(impl)

    def partition(mesh, arg_shapes, result_shape):
        # The propagation already satisfied `rule`; run the kernel on the
        # local shards as-is.
        def lower_fn(*args):
            return impl(*args)

        return (
            mesh,
            lower_fn,
            jax.tree.map(lambda s: s.sharding, result_shape),
            jax.tree.map(lambda s: s.sharding, arg_shapes),
        )

    wrapped.def_partition(
        partition,
        sharding_rule=rule,
        need_replication_factors=tuple(need_replication),
    )
    return wrapped
