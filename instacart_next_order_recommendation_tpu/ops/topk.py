"""Fused cosine-similarity + top-k retrieval kernel.

The reference serve path computes a dense (1 x N) similarity then a FULL
argsort of the catalog on one device
(/root/reference/src/inference/serve_recommendations.py:213-215). The
TPU-native design never materializes a full sort:

- Pallas kernel, grid over catalog blocks: each program computes the
  ``[B, block_n]`` similarity tile on the MXU (embeddings are L2-normalized so
  dot product == cosine), then extracts the block-local top-k in VMEM by
  iterative max extraction (k is small: 10-100).
- A cheap ``lax.top_k`` merge over the ``[B, n_blocks * k]`` candidates gives
  the exact global top-k — identical results to the reference's full sort.

For a multi-device row-sharded catalog the same kernel runs per shard inside
``shard_map`` and the merge happens after an all-gather of per-shard
candidates (see index/sharded.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30

DEFAULT_BLOCK_N = 2048


def topk_cache_suffix(packed: bool = False) -> str:
    """Suffix for AOT-store keys of programs containing a ``cosine_topk``:
    pins everything that changes the compiled program beyond shapes — the
    packed-extraction opt-in and a non-default dispatch override. Without
    this, flipping ITOR_TOPK_DISPATCH would silently load an executable
    compiled for the other path."""
    import os

    mode = (os.getenv("ITOR_TOPK_DISPATCH") or "auto").strip().lower()
    return ("_pk1" if packed else "") + ("" if mode == "auto" else f"_disp-{mode}")


def cosine_topk_reference(
    queries: jax.Array,
    catalog: jax.Array,
    k: int,
    n_valid: jax.Array | int | None = None,
    candidate_mask: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """jnp oracle: [B, D] x [N, D] -> top-k (scores [B, k], indices [B, k]).

    ``n_valid`` masks out padding rows at the tail of the catalog (used when
    the catalog is padded for even device sharding). ``candidate_mask`` is an
    optional [N] int32/bool row filter (1 = candidate eligible), used by
    serve-side aisle/department filters.
    """
    scores = jax.lax.dot_general(
        queries,
        catalog,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if n_valid is not None:
        col = jnp.arange(catalog.shape[0])[None, :]
        scores = jnp.where(col < n_valid, scores, _NEG_INF)
    if candidate_mask is not None:
        scores = jnp.where(candidate_mask[None, :] != 0, scores, _NEG_INF)
    return jax.lax.top_k(scores, k)


def _topk_block_kernel_packed(
    n_valid_ref, q_ref, c_ref, mask_ref, out_s_ref, out_i_ref, *, k, block_n
):
    """Packed-extraction variant: fewer VPU passes per extracted candidate.

    Scores are packed into ONE int32 per candidate — the f32 bit pattern
    mapped to a sortable integer (sign-magnitude -> two's-complement order)
    with its low 12 bits replaced by ``0xFFF - column``. One max-reduction
    then yields value AND argmax together (ties break to the lowest column,
    matching the exact kernel), and clearing the winner is a single
    equality select (packed values are unique per column) — two data passes
    per candidate instead of the exact kernel's three-plus. Measured on v5e
    at 1M x 384 bf16: 1.12x at B=256 k=10, 1.38x at B=8 (the shared
    max-reduction dominates both variants, bounding the gain). The cost:
    output scores lose their low 12 mantissa bits (~3 decimal digits), and
    candidates whose scores differ only below that precision may swap —
    hence opt-in (``extraction="packed"``); the exact kernel stays the
    default contract.
    """
    block_idx = pl.program_id(0)
    start = block_idx * block_n
    n_valid = n_valid_ref[0]
    sign = jnp.int32(-2147483648)  # 0x80000000

    q = q_ref[:]
    c = c_ref[:]
    scores = jax.lax.dot_general(
        q,
        c,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, block_n)

    b = scores.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (b, block_n), dimension=1)
    gcol = col + start
    valid = gcol < n_valid
    if mask_ref is not None:
        valid = valid & (mask_ref[:] != 0)
    scores = jnp.where(valid, scores, _NEG_INF)

    # f32 -> order-preserving int32 (signed comparison): non-negative floats
    # keep their bit pattern; negative floats are bit-flipped (undoing their
    # reversed magnitude order) and shifted below zero with the sign bit.
    bits = jax.lax.bitcast_convert_type(scores, jnp.int32)
    sortable = jnp.where(bits < 0, (~bits) ^ sign, bits)
    packed = (sortable & jnp.int32(~0xFFF)) | (jnp.int32(0xFFF) - col)

    k_pad = out_s_ref.shape[-1]
    col_k = jax.lax.broadcasted_iota(jnp.int32, (b, k_pad), dimension=1)

    def extract(i, carry):
        p, acc_s, acc_i = carry
        m = jnp.max(p, axis=1)  # (B,) — value AND argmax in ONE reduction
        amax = jnp.int32(0xFFF) - (m & jnp.int32(0xFFF))
        s_sort = m & jnp.int32(~0xFFF)  # quantized sortable key
        s_bits = jnp.where(s_sort >= 0, s_sort, ~(s_sort ^ sign))
        s_val = jax.lax.bitcast_convert_type(s_bits, jnp.float32)
        acc_s = jnp.where(col_k == i, s_val[:, None], acc_s)
        acc_i = jnp.where(col_k == i, amax[:, None] + start, acc_i)
        # Packed values are unique per column, so one equality select
        # removes exactly the winner.
        p = jnp.where(p == m[:, None], sign, p)
        return p, acc_s, acc_i

    _, acc_s, acc_i = jax.lax.fori_loop(
        0,
        k,
        extract,
        (
            packed,
            jnp.full((b, k_pad), _NEG_INF, jnp.float32),
            jnp.zeros((b, k_pad), jnp.int32),
        ),
    )
    out_s_ref[:] = acc_s
    out_i_ref[:] = acc_i


def _topk_block_kernel(
    n_valid_ref, q_ref, c_ref, mask_ref, out_s_ref, out_i_ref, *, k, block_n
):
    block_idx = pl.program_id(0)
    start = block_idx * block_n
    n_valid = n_valid_ref[0]

    q = q_ref[:]
    c = c_ref[:]
    scores = jax.lax.dot_general(
        q,
        c,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, block_n)

    b = scores.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (b, block_n), dimension=1)
    gcol = col + start
    valid = gcol < n_valid
    if mask_ref is not None:
        valid = valid & (mask_ref[:] != 0)  # (1, block_n) broadcasts over B
    scores = jnp.where(valid, scores, _NEG_INF)

    # Iterative max extraction. The (b, k_pad) accumulators ride the fori_loop
    # carry and update via elementwise `where` on a k-iota — Mosaic forbids
    # lane-unaligned dynamic column stores, so no per-column writes. k_pad is
    # the lane-aligned output width; only the first k columns are ever set.
    k_pad = out_s_ref.shape[-1]
    col_k = jax.lax.broadcasted_iota(jnp.int32, (b, k_pad), dimension=1)

    def extract(i, carry):
        s, acc_s, acc_i = carry
        m = jnp.max(s, axis=1)  # (B,)
        # Tie-break to the lowest index (matches argsort-descending order).
        amax = jnp.min(jnp.where(s == m[:, None], col, block_n), axis=1)
        acc_s = jnp.where(col_k == i, m[:, None], acc_s)
        acc_i = jnp.where(col_k == i, amax[:, None] + start, acc_i)
        s = jnp.where(col == amax[:, None], _NEG_INF, s)
        return s, acc_s, acc_i

    _, acc_s, acc_i = jax.lax.fori_loop(
        0,
        k,
        extract,
        (
            scores,
            jnp.full((b, k_pad), _NEG_INF, jnp.float32),
            jnp.zeros((b, k_pad), jnp.int32),
        ),
    )
    out_s_ref[:] = acc_s
    out_i_ref[:] = acc_i


def cosine_topk_pallas(
    queries: jax.Array,
    catalog: jax.Array,
    k: int,
    block_n: int = DEFAULT_BLOCK_N,
    interpret: bool = False,
    n_valid: jax.Array | int | None = None,
    candidate_mask: jax.Array | None = None,
    packed: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Exact top-k via blockwise Pallas kernel + candidate merge.

    ``packed=True`` selects the packed-extraction kernel (~2x fewer VPU
    passes per extracted candidate — extraction dominates at >=1M rows):
    scores are compared at 20-bit precision with the column index packed
    into the low bits, so returned scores are quantized (~3 decimal
    digits) and candidates tied within that precision may swap. Opt-in;
    the exact kernel is the default contract.
    """
    b, d = queries.shape
    n, _ = catalog.shape
    if n_valid is None:
        n_valid = n
    block_n = min(block_n, max(128, 1 << (n - 1).bit_length()))
    if packed:
        block_n = min(block_n, 4096)  # 12 index bits in the packed int32
    # VMEM budget: the [B, block_n] f32 score tile dominates; keep it ~<=4MB
    # so queries + catalog block + accumulators fit the ~16MB VMEM limit.
    while b * block_n * 4 > 4 * 1024 * 1024 and block_n > 128:
        block_n //= 2
    if k > block_n:
        # Exactness requires each block to surface its own top-k: a single
        # block may hold more than block_n of the global winners otherwise.
        # Large-b AND large-k requests fall back to the dense path.
        return cosine_topk_reference(
            queries, catalog, k, n_valid=n_valid, candidate_mask=candidate_mask
        )
    n_blocks = pl.cdiv(n, block_n)
    n_padded = n_blocks * block_n
    if n_padded != n:
        catalog = jnp.pad(catalog, ((0, n_padded - n), (0, 0)))
    # k <= block_n here (the k > block_n case returned via the dense fallback
    # above); the merge's exactness relies on each block surfacing a full
    # top-k, i.e. candidate width n_blocks * k.
    k_local = k

    # Hardware-tile padding: queries to 8 sublanes, output width to 128 lanes.
    b_pad = -(-b // 8) * 8
    if b_pad != b:
        queries = jnp.pad(queries, ((0, b_pad - b), (0, 0)))
    k_pad = -(-k_local // 128) * 128

    has_mask = candidate_mask is not None
    in_specs = [
        pl.BlockSpec((b_pad, d), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_n, d), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
    ]
    operands = [queries, catalog]
    if has_mask:
        mask = jnp.asarray(candidate_mask, jnp.int32).reshape(1, n)
        if n_padded != n:
            mask = jnp.pad(mask, ((0, 0), (0, n_padded - n)))
        in_specs.append(
            pl.BlockSpec((1, block_n), lambda i, *_: (0, i), memory_space=pltpu.VMEM)
        )
        operands.append(mask)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=[
            # Leading grid axis keeps the constrained last-two dims == (b, k).
            pl.BlockSpec((1, b_pad, k_pad), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_pad, k_pad), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
    )

    block_kernel = _topk_block_kernel_packed if packed else _topk_block_kernel

    def kernel(n_valid_ref, q_ref, c_ref, *rest):
        mask_ref, (out_s_ref, out_i_ref) = (
            (rest[0], rest[1:]) if has_mask else (None, rest)
        )
        block_kernel(
            n_valid_ref,
            q_ref,
            c_ref,
            mask_ref,
            out_s_ref.at[0],
            out_i_ref.at[0],
            k=k_local,
            block_n=block_n,
        )

    cand_s, cand_i = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, b_pad, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, b_pad, k_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_padded * d,
            bytes_accessed=(n_padded * d + b * d) * catalog.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(n_valid, dtype=jnp.int32).reshape(1), *operands)

    cand_s = jnp.transpose(cand_s[:, :b, :k_local], (1, 0, 2)).reshape(b, n_blocks * k_local)
    cand_i = jnp.transpose(cand_i[:, :b, :k_local], (1, 0, 2)).reshape(b, n_blocks * k_local)
    top_s, pos = jax.lax.top_k(cand_s, k)
    top_i = jnp.take_along_axis(cand_i, pos, axis=1)
    return top_s, top_i


def cosine_topk(
    queries: jax.Array,
    catalog: jax.Array,
    k: int,
    n_valid: jax.Array | int | None = None,
    local: bool = False,
    candidate_mask: jax.Array | None = None,
    packed: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Dispatching entry point: exact brute-force cosine top-k.

    ``local=True`` marks a call made inside shard_map (operands are local
    shards), where the Pallas kernel is safe on any device topology.
    ``candidate_mask`` ([N] int32/bool, 1 = eligible) restricts the candidate
    pool device-side (aisle/department filters). ``packed=True`` opts into
    the faster 20-bit packed-extraction kernel (see cosine_topk_pallas);
    ignored on the non-Pallas fallback, which stays exact.
    """
    import os as _os

    import jax as _jax

    from instacart_next_order_recommendation_tpu.ops import pallas_interpret, use_pallas

    # The global (non-local) form has no partitioning rule: on a multi-device
    # mesh the sharded index (index/sharded.py) calls this with local=True
    # inside shard_map instead.
    pallas_ok = use_pallas() and (local or _jax.device_count() == 1)
    use_blocked = pallas_ok and k <= DEFAULT_BLOCK_N
    # Operator override for the blocked-vs-dense choice (read at trace time;
    # constants.ENV_TOPK_DISPATCH): "blocked"/"dense" pin the path — within
    # structural limits (blocked needs Pallas and k <= block size) — and
    # "auto" keeps the measured crossover below. Primarily for A/B benching
    # and for deployments whose catalog/k mix sits near the crossover.
    dispatch = (_os.getenv("ITOR_TOPK_DISPATCH") or "auto").strip().lower()
    if dispatch == "dense":
        use_blocked = False
    elif dispatch != "blocked":
        if use_blocked and k > 32 and queries.shape[0] * catalog.shape[0] * 4 <= (2 << 30):
            # Measured crossover (v5e, 50k-1M rows): the blocked kernel's
            # per-candidate extraction is linear in k while the dense
            # scores+lax.top_k path is k-flat — beyond k~32 dense wins at every
            # catalog size whose [B, N] f32 score matrix fits on device
            # (1.15-1.6x at k=64-256). Blocked keeps the small-k serve buckets
            # (where it wins at batch) and anything too big to materialize.
            use_blocked = False
    if use_blocked:
        return cosine_topk_pallas(
            queries,
            catalog,
            k,
            interpret=pallas_interpret(),
            n_valid=n_valid,
            candidate_mask=candidate_mask,
            packed=packed,
        )
    return cosine_topk_reference(
        queries, catalog, k, n_valid=n_valid, candidate_mask=candidate_mask
    )
