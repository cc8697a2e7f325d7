"""Fused transformer encoder layer: one Pallas program per batch block.

Why this kernel exists: the unfused layer materializes per-head
``[B, heads, S, 32]`` tensors in HBM. With head_dim 32, TPU tiled layouts pad
the minor dimension to 128 lanes (4x memory and bandwidth waste), and the
per-head score matmuls become thousands of tiny ``[S,32]x[32,S]`` MXU ops that
run latency-bound at a few TFLOP/s. Measured on v5e, attention + layout
overhead was ~65% of the whole MiniLM tower forward.

This kernel keeps activations packed ``[B, S, hidden]`` end to end (hidden is a
multiple of 128 -> perfectly tiled) and runs a whole encoder layer per
program:

    qkv = x @ Wqkv                      (one MXU GEMM, f32 accum)
    per head-group g (head_dim*heads_per_group == 128 lanes):
        scores_g = Qg @ blockdiag(Kg)^T (the block-diagonal expansion turns
        out_g   = P_g @ blockdiag(Vg)    hpg tiny per-head dots into ONE
                                         [S,128]x[128,hpg*S] MXU dot; the 0
                                         blocks cost hpg x FLOPs but the MXU
                                         runs tile-aligned, which is >4x
                                         faster than latency-bound head dots)
    attn = out @ Wo ; x1 = LN(x + attn)
    ffn  = gelu(x1 @ W1) @ W2 ; y = LN(x1 + ffn)

All intermediates (scores, probs, FFN hidden) live in VMEM only; per layer the
HBM traffic is x in, y out, and the weights once per grid sweep. Softmax and
LayerNorm are f32; matmuls accumulate f32 on the MXU and store bf16, matching
the unfused path's numerics (models/encoder.py:_encoder_layer is the oracle).

Replaces the attention/FFN math sentence-transformers runs in torch for the
reference's ``SentenceTransformer.encode``
(/root/reference/src/inference/serve_recommendations.py:195-213).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e9


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf approximation (|err| < 2e-6 in f32;
    invisible at bf16 storage precision). Mosaic has no erf/erfc lowering."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def supports(hidden: int, num_heads: int, seq: int) -> bool:
    """Static shape gate: hidden tile-aligned, heads groupable to 128 lanes,
    sequence a sublane multiple (K/V pad to a 128-lane multiple in VMEM)."""
    if hidden % 128 or num_heads == 0 or hidden % num_heads:
        return False
    head_dim = hidden // num_heads
    if head_dim > 128 or 128 % head_dim:
        return False
    hpg = 128 // head_dim
    return num_heads % hpg == 0 and seq % 16 == 0 and seq >= 16


def _kernel(
    x_ref,
    bias_ref,
    qkv_w_ref,
    qkv_b_ref,
    o_w_ref,
    o_b_ref,
    ln1_s_ref,
    ln1_b_ref,
    w1_ref,
    b1_ref,
    w2_ref,
    b2_ref,
    ln2_s_ref,
    ln2_b_ref,
    y_ref,
    qkv_ref,
    attn_ref,
    *,
    bb: int,
    seq: int,
    hidden: int,
    num_heads: int,
    scale: float,
    eps: float,
    ffn_chunks: int,
):
    head_dim = hidden // num_heads
    hpg = 128 // head_dim  # heads per 128-lane group
    ngroups = num_heads // hpg
    cdt = x_ref.dtype

    x = x_ref[...].reshape(bb * seq, hidden)

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    qkv = dot(x, qkv_w_ref[...]) + qkv_b_ref[...].astype(jnp.float32)
    # Stage qkv in a VMEM scratch ref: the batch fori_loop below needs
    # dynamic row slices, which Mosaic supports on refs but not on values.
    qkv_ref[...] = qkv.astype(cdt)  # [bb*seq, 3*hidden]

    # Lane masks selecting each head's columns within a 128-lane group; the
    # k and v tiles are masked together in one [seq, 256] pass per block.
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1) % 128
    kv_masks = [
        ((lane >= i * head_dim) & (lane < (i + 1) * head_dim)).astype(cdt)
        for i in range(hpg)
    ]

    # fori_loop over the batch rows (NOT unrolled): only one example's score
    # tiles are live at a time, which is what lets bb grow to 8-16 rows (big
    # GEMMs) without blowing VMEM. Attention output lands in a VMEM scratch.
    # Key/value rows pad to a 128-lane multiple so the per-head score slices
    # stay tile-aligned for any seq % 16 == 0; the padded-key bias below
    # drives their probabilities to zero.
    skv = -(-seq // 128) * 128

    def attn_body(b, _):
        r0 = pl.multiple_of(b * seq, seq)
        bias = bias_ref[pl.ds(b, 1)].reshape(1, skv)  # f32 key-side bias
        rows = qkv_ref[pl.ds(r0, seq), :]
        for g in range(ngroups):
            lo = g * 128
            qg = rows[:, lo : lo + 128]
            kg = rows[:, hidden + lo : hidden + lo + 128]
            vg = rows[:, 2 * hidden + lo : 2 * hidden + lo + 128]

            # Block-diagonal expansion: row block i carries head i's lanes.
            kv = jnp.concatenate([kg, vg], axis=1)  # [seq, 256]
            if skv != seq:
                kv = jnp.concatenate(
                    [kv, jnp.zeros((skv - seq, 256), cdt)], axis=0
                )
            kv_bd = jnp.concatenate([kv * m for m in kv_masks], axis=0)
            k_bd = kv_bd[:, :128]
            v_bd = kv_bd[:, 128:]
            scores = (
                jax.lax.dot_general(
                    qg, k_bd, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
            )  # [seq, hpg*skv]
            probs = []
            zs = []
            for i in range(hpg):
                s_i = scores[:, i * skv : (i + 1) * skv] + bias
                m_i = jnp.max(s_i, axis=-1, keepdims=True)
                p_i = jnp.exp(s_i - m_i)
                # Defer the 1/sum to after the PV dot: divide [seq, 128]
                # there instead of [seq, hpg*skv] here.
                zs.append(jnp.sum(p_i, axis=-1, keepdims=True))
                probs.append(p_i.astype(cdt))
            p = jnp.concatenate(probs, axis=1)  # [seq, hpg*skv]
            z = jnp.concatenate(
                [jnp.broadcast_to(z_i, (seq, head_dim)) for z_i in zs], axis=1
            )  # [seq, 128] per-head denominators aligned with output lanes
            # Per-head outputs land in their own lane block (v_bd zeros
            # everything else) — heads recombine with no concat/transpose.
            attn_ref[pl.ds(r0, seq), lo : lo + 128] = (
                dot(p, v_bd) / z
            ).astype(cdt)
        return 0

    jax.lax.fori_loop(0, bb, attn_body, 0)
    attn = attn_ref[...]  # [bb*seq, hidden]
    ao = dot(attn, o_w_ref[...]) + o_b_ref[...].astype(jnp.float32)

    def layer_norm(res_f32, s_ref, b_ref):
        mean = jnp.mean(res_f32, axis=-1, keepdims=True)
        cent = res_f32 - mean
        var = jnp.mean(cent * cent, axis=-1, keepdims=True)
        normed = cent * jax.lax.rsqrt(var + eps)
        return normed * s_ref[...] + b_ref[...]

    # Match the unfused path: residual add in compute dtype, LN in f32.
    x1 = layer_norm(
        (x + ao.astype(cdt)).astype(jnp.float32), ln1_s_ref, ln1_b_ref
    ).astype(cdt)

    # FFN in chunks over the intermediate dim: caps the f32 GELU transient at
    # [bb*seq, inter/chunks] so large bb fits VMEM.
    inter = w1_ref.shape[-1]
    step = inter // ffn_chunks
    f = b2_ref[...].astype(jnp.float32)
    for c in range(ffn_chunks):
        lo = c * step
        h_c = dot(x1, w1_ref[:, lo : lo + step]) + b1_ref[
            :, lo : lo + step
        ].astype(jnp.float32)
        h_c = _gelu_exact(h_c).astype(cdt)
        f = f + dot(h_c, w2_ref[pl.ds(lo, step), :])
    y = layer_norm(
        (x1 + f.astype(cdt)).astype(jnp.float32), ln2_s_ref, ln2_b_ref
    ).astype(cdt)
    y_ref[...] = y.reshape(bb, seq, hidden)


def _pick_bb(batch: int, seq: int, hidden: int, inter: int) -> int:
    """Batch rows per program. Scores live one example at a time (fori_loop)
    and the FFN is chunked, so the budget is set by the persistent [bb*seq]
    activations: x, qkv, attn scratch, x1, FFN chunk tiles."""
    # ~8 hidden-width bf16 tensors per row (x/y double-buffered blocks, qkv
    # scratch, attn scratch, x1, f) — FFN chunking caps the rest. The
    # per-example score/prob tiles ([seq, hpg*skv], hpg<=4) are transient but
    # count against the same 16MB scoped VMEM.
    skv = -(-seq // 128) * 128
    per_row = seq * hidden * 16
    score_transient = seq * skv * 4 * 6
    bb = max(1, min(8, ((9 << 20) - score_transient) // max(per_row, 1)))
    while batch % bb:
        bb -= 1
    return bb


def _vec2(v, dtype=None):
    v = v.reshape(1, -1)
    return v if dtype is None else v.astype(dtype)


def _call(x, bias, qkv_w, qkv_b, o_w, o_b, ln1_s, ln1_b, w1, b1, w2, b2,
          ln2_s, ln2_b, *, num_heads, scale, eps, interpret):
    batch, seq, hidden = x.shape
    inter = w1.shape[-1]
    bb = _pick_bb(batch, seq, hidden, inter)
    ms = pl.ANY if interpret else pltpu.VMEM

    def const_spec(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim, memory_space=ms)

    # Cap the f32 GELU transient at ~2MB.
    ffn_chunks = 1
    while bb * seq * (inter // ffn_chunks) * 4 > (2 << 20) and inter % (ffn_chunks * 2) == 0:
        ffn_chunks *= 2
    kernel = functools.partial(
        _kernel, bb=bb, seq=seq, hidden=hidden, num_heads=num_heads,
        scale=scale, eps=eps, ffn_chunks=ffn_chunks,
    )
    consts = [qkv_w, qkv_b, o_w, o_b, ln1_s, ln1_b, w1, b1, w2, b2, ln2_s, ln2_b]
    flops_attn = 2 * 2 * batch * seq * seq * (128 // (hidden // num_heads)) * hidden
    flops_gemm = 2 * batch * seq * (4 * hidden * hidden + 2 * hidden * inter)
    return pl.pallas_call(
        kernel,
        grid=(batch // bb,),
        in_specs=[
            pl.BlockSpec((bb, seq, hidden), lambda i: (i, 0, 0), memory_space=ms),
            pl.BlockSpec((bb, 1, bias.shape[-1]), lambda i: (i, 0, 0), memory_space=ms),
            *[const_spec(a) for a in consts],
        ],
        out_specs=pl.BlockSpec((bb, seq, hidden), lambda i: (i, 0, 0), memory_space=ms),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bb * seq, 3 * hidden), x.dtype),
            pltpu.VMEM((bb * seq, hidden), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops_gemm + flops_attn,
            bytes_accessed=2 * batch * seq * hidden * x.dtype.itemsize,
            transcendentals=batch * seq * (num_heads * seq + inter),
        ),
        interpret=interpret,
    )(x, bias, *consts)


@functools.lru_cache(maxsize=None)
def _call_partitioned(num_heads, scale, eps, interpret):
    """custom_partitioning wrapper: batch partitionable, weights replicated
    (same mechanism as ops/partition.py for attention/pool+norm)."""
    from instacart_next_order_recommendation_tpu.ops.partition import batch_partitioned

    def impl(*args):
        return _call(*args, num_heads=num_heads, scale=scale, eps=eps,
                     interpret=interpret)

    rule = (
        "b s h, b u8 s2, a c, u0 c, d e, u1 e, u2 f, u3 g, k l, u4 l, m n,"
        " u5 n, u6 p, u7 r -> b s h"
    )
    return batch_partitioned(
        impl,
        rule=rule,
        # Shardy requires these sorted by first appearance in the rule.
        need_replication=(
            "s", "h", "u8", "s2", "a", "c", "u0", "d", "e", "u1", "u2", "f",
            "u3", "g", "k", "l", "u4", "m", "n", "u5", "u6", "p", "u7", "r",
        ),
    )


def fused_encoder_layer(
    x: jax.Array,
    mask: jax.Array,
    layer: dict,
    *,
    num_heads: int,
    scale: float,
    eps: float,
) -> jax.Array:
    """One post-LN BERT encoder layer, fully fused on TPU.

    x: [B, S, hidden] (compute dtype); mask: [B, S] with 1 = real token.
    ``layer`` uses the same param names as models/encoder.py. Inference-only
    (no dropout); callers gate on ``supports()`` and fall back to the unfused
    path otherwise.
    """
    from instacart_next_order_recommendation_tpu.ops import pallas_interpret

    cdt = x.dtype
    qkv_w = jnp.concatenate(
        [layer["q_w"], layer["k_w"], layer["v_w"]], axis=1
    ).astype(cdt)
    qkv_b = _vec2(
        jnp.concatenate([layer["q_b"], layer["k_b"], layer["v_b"]]), cdt
    )
    # Key-side additive bias, padded to the kernel's 128-multiple K/V length
    # (padded keys get -inf so their probabilities vanish). [B, 1, skv]
    seq = x.shape[1]
    skv = -(-seq // 128) * 128
    bias = ((1.0 - mask.astype(jnp.float32)) * _NEG_INF)[:, None, :]
    if skv != seq:
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, skv - seq)), constant_values=_NEG_INF)
    if jax.device_count() == 1:
        call = functools.partial(
            _call, num_heads=num_heads, scale=scale, eps=eps,
            interpret=pallas_interpret(),
        )
    else:
        call = _call_partitioned(num_heads, scale, eps, pallas_interpret())
    return call(
        x,
        bias,
        qkv_w,
        qkv_b,
        layer["o_w"].astype(cdt),
        _vec2(layer["o_b"], cdt),
        _vec2(layer["attn_ln_scale"], jnp.float32),
        _vec2(layer["attn_ln_bias"], jnp.float32),
        layer["ffn_w1"].astype(cdt),
        _vec2(layer["ffn_b1"], cdt),
        layer["ffn_w2"].astype(cdt),
        _vec2(layer["ffn_b2"], cdt),
        _vec2(layer["ffn_ln_scale"], jnp.float32),
        _vec2(layer["ffn_ln_bias"], jnp.float32),
    )
