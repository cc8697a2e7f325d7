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
    reduce_outputs: Sequence[int] = (),
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
        reduce_outputs: indices of outputs that the per-shard kernel produces
            as PARTIALS over the batch rows it saw (e.g. in-kernel weight-grad
            accumulators). The lowering all-reduces them over whatever mesh
            axes shard dim 0 of operand 0 — the grad psum data parallelism
            implies. These outputs must be replicated under the rule (all
            their factors in ``need_replication``).
    """
    wrapped = custom_partitioning(impl)

    def partition(mesh, arg_shapes, result_shape):
        # The propagation already satisfied `rule`; run the kernel on the
        # local shards, then all-reduce the declared partial outputs over
        # the batch-sharding axes (the psum the split form gets implicitly
        # from XLA's sharded wgrad GEMM contractions).
        reduce_axes: tuple = ()
        if reduce_outputs:
            spec = arg_shapes[0].sharding.spec
            dim0 = spec[0] if len(spec) > 0 else None
            if dim0 is not None:
                reduce_axes = tuple(dim0) if isinstance(dim0, (tuple, list)) else (dim0,)

        def lower_fn(*args):
            out = impl(*args)
            if reduce_axes:
                out = list(out)
                for i in reduce_outputs:
                    out[i] = jax.lax.psum(out[i], reduce_axes)
                out = tuple(out)
            return out

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
