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


def _env_on(name: str, default_on: bool = True) -> bool:
    """Shared truthiness for the ITOR_FUSED_BWD* knob family (case-folded):
    default-on knobs turn off only on 0/false; default-off ones turn on
    only on 1/true."""
    import os

    v = os.getenv(name, "").strip().lower()
    return v not in ("0", "false") if default_on else v in ("1", "true")


def bwd_supports(hidden: int, inter: int, seq: int, itemsize: int = 2,
                 wgrads: bool = True, batch: int = 0) -> bool:
    """VMEM feasibility gate for the backward kernel at bb=1.

    The backward holds every weight matrix in VMEM (plus, in wgrads mode,
    an f32 accumulator per weight), so large towers simply don't fit:
    measured on v5e, MiniLM-L6 (H=384, I=1536) compiles in both forms while
    mpnet-base-class (H=768, I=3072) fails Mosaic compilation in BOTH —
    its bf16 weights alone are 14.2 MB and the wgrad accumulators another
    28 MB. Callers fall back to the recompute-vjp (pure XLA) backward when
    this returns False. The estimate is calibrated, not exact: weights +
    accumulators + the bb=1 working set (qkv/dqkv scratch f32-equivalents,
    hidden-width streams, the [seq, inter] FFN transient, and the
    per-example score tiles), against a budget overridable via
    ITOR_FUSED_BWD_MAXVMEM_MB.

    ``batch`` (the per-SHARD batch reaching the kernel) matters only in the
    split form (wgrads=False): its four LayerNorm scale/bias partial outputs
    are whole-array [B, H] f32 blocks with a constant index map, so their
    VMEM cost grows linearly with batch (4*B*H*4 bytes ≈ 6.3 MB at
    B=1024/H=384). Oversized batches must route to the recompute-vjp
    fallback rather than fail Mosaic compilation.
    """
    import os

    skv = -(-seq // 128) * 128
    gemm_params = 4 * hidden * hidden + 2 * hidden * inter
    wbytes = gemm_params * itemsize
    accums = gemm_params * 4 if wgrads else 0
    partials = 0 if wgrads else 4 * batch * hidden * 4
    chunks = bwd_ffn_chunks(1, seq, inter)
    if chunks > 1:
        # Chunked FFN (seq > 128): two persistent [seq, inter] cdt scratches
        # (gelu out + gelu') plus ~2 per-chunk f32 transients. Calibrated on
        # v5e at S=256 (the chunked wgrads form compiles and wins there —
        # see PERFORMANCE.md r5); without chunking the unsplit [seq, inter]
        # f32 transients made Mosaic exceed VMEM at S=256.
        ffn_term = seq * inter * 2 * itemsize + seq * (inter // chunks) * 4 * 2
    else:
        ffn_term = seq * inter * (4 + itemsize)
    work = (
        seq * (3 * hidden * 4 + 8 * hidden * itemsize)
        + ffn_term
        + seq * skv * 4 * 6
    )
    budget_mb = int(os.getenv("ITOR_FUSED_BWD_MAXVMEM_MB", "18") or 18)
    return wbytes + accums + partials + work <= (budget_mb << 20)


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
    *rest,
    bb: int,
    seq: int,
    hidden: int,
    num_heads: int,
    scale: float,
    eps: float,
    ffn_chunks: int,
    dropout: bool = False,
    save_resid: bool = False,
):
    # rest = ([m1_ref, m2_ref,] y_ref, [attn_out, ao_out, x1_out, f_out,]
    #         qkv_ref, attn_ref): dropout masks are optional inputs
    # ({0, 1/keep}-valued, generated by the caller so the recompute backward
    # sees the identical masks). With save_resid the kernel also emits the
    # four residuals the fused backward would otherwise recompute (attention
    # output, post-dropout attn projection, x1, post-dropout FFN output) —
    # all bit-exact fwd values in compute dtype. qkv is deliberately NOT
    # saved: its 3H width costs more HBM round-trip than the one GEMM that
    # rebuilds it (measured — see PERFORMANCE.md).
    if dropout:
        m1_ref, m2_ref = rest[:2]
        rest = rest[2:]
    if save_resid:
        (y_ref, attn_out_ref, ao_out_ref, x1_out_ref, f_out_ref,
         qkv_ref, attn_ref) = rest
    else:
        y_ref, qkv_ref, attn_ref = rest
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
    if save_resid:
        attn_out_ref[...] = attn.reshape(bb, seq, hidden)
    ao = dot(attn, o_w_ref[...]) + o_b_ref[...].astype(jnp.float32)

    def layer_norm(res_f32, s_ref, b_ref):
        mean = jnp.mean(res_f32, axis=-1, keepdims=True)
        cent = res_f32 - mean
        var = jnp.mean(cent * cent, axis=-1, keepdims=True)
        normed = cent * jax.lax.rsqrt(var + eps)
        return normed * s_ref[...] + b_ref[...]

    # Match the unfused path: residual add in compute dtype, LN in f32.
    ao_c = ao.astype(cdt)
    if dropout:
        ao_c = ao_c * m1_ref[...].reshape(bb * seq, hidden)
    x1 = layer_norm(
        (x + ao_c).astype(jnp.float32), ln1_s_ref, ln1_b_ref
    ).astype(cdt)
    if save_resid:
        ao_out_ref[...] = ao_c.reshape(bb, seq, hidden)
        x1_out_ref[...] = x1.reshape(bb, seq, hidden)

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
    f_c = f.astype(cdt)
    if dropout:
        f_c = f_c * m2_ref[...].reshape(bb * seq, hidden)
    if save_resid:
        f_out_ref[...] = f_c.reshape(bb, seq, hidden)
    y = layer_norm(
        (x1 + f_c).astype(jnp.float32), ln2_s_ref, ln2_b_ref
    ).astype(cdt)
    y_ref[...] = y.reshape(bb, seq, hidden)


def _pick_bb(
    batch: int, seq: int, hidden: int, inter: int, itemsize: int = 2,
    n_masks: int = 0, resid_widths: int = 0,
) -> int:
    """Batch rows per program. Scores live one example at a time (fori_loop)
    and the FFN is chunked, so the budget is set by the persistent [bb*seq]
    activations: x, qkv, attn scratch, x1, FFN chunk tiles."""
    # ~8 hidden-width compute-dtype tensors per row (x/y double-buffered
    # blocks, qkv scratch, attn scratch, x1, f) — FFN chunking caps the rest.
    # Each dropout-mask input adds a double-buffered [bb, seq, hidden] block,
    # and each hidden-width of saved residual output likewise (save_resid
    # passes resid_widths=4: attn, ao, x1, f).
    # The per-example score/prob tiles ([seq, hpg*skv], hpg<=4) are transient
    # but count against the same 16MB scoped VMEM.
    skv = -(-seq // 128) * 128
    per_row = seq * hidden * itemsize * (8 + 2 * n_masks + 2 * resid_widths)
    score_transient = seq * skv * 4 * 6
    bb = max(1, min(8, ((9 << 20) - score_transient) // max(per_row, 1)))
    while batch % bb:
        bb -= 1
    return bb


def _vec2(v, dtype=None):
    v = v.reshape(1, -1)
    return v if dtype is None else v.astype(dtype)


def _call(x, bias, qkv_w, qkv_b, o_w, o_b, ln1_s, ln1_b, w1, b1, w2, b2,
          ln2_s, ln2_b, *masks, num_heads, scale, eps, interpret,
          save_resid=False):
    batch, seq, hidden = x.shape
    inter = w1.shape[-1]
    bb = _pick_bb(
        batch, seq, hidden, inter, x.dtype.itemsize, len(masks),
        resid_widths=4 if save_resid else 0,
    )
    ms = pl.ANY if interpret else pltpu.VMEM
    dropout = len(masks) == 2

    def const_spec(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim, memory_space=ms)

    def batch_spec(shape):
        return pl.BlockSpec((bb, *shape[1:]), lambda i: (i,) + (0,) * (len(shape) - 1), memory_space=ms)

    # Cap the f32 GELU transient at ~2MB.
    ffn_chunks = 1
    while bb * seq * (inter // ffn_chunks) * 4 > (2 << 20) and inter % (ffn_chunks * 2) == 0:
        ffn_chunks *= 2
    kernel = functools.partial(
        _kernel, bb=bb, seq=seq, hidden=hidden, num_heads=num_heads,
        scale=scale, eps=eps, ffn_chunks=ffn_chunks, dropout=dropout,
        save_resid=save_resid,
    )
    consts = [qkv_w, qkv_b, o_w, o_b, ln1_s, ln1_b, w1, b1, w2, b2, ln2_s, ln2_b]
    flops_attn = 2 * 2 * batch * seq * seq * (128 // (hidden // num_heads)) * hidden
    flops_gemm = 2 * batch * seq * (4 * hidden * hidden + 2 * hidden * inter)
    out_shape = jax.ShapeDtypeStruct(x.shape, x.dtype)
    out_specs = pl.BlockSpec((bb, seq, hidden), lambda i: (i, 0, 0), memory_space=ms)
    if save_resid:
        resid_shapes = [
            (batch, seq, hidden),      # attn
            (batch, seq, hidden),      # ao (post-dropout)
            (batch, seq, hidden),      # x1
            (batch, seq, hidden),      # f (post-dropout)
        ]
        out_shape = [out_shape] + [
            jax.ShapeDtypeStruct(s, x.dtype) for s in resid_shapes
        ]
        out_specs = [out_specs] + [batch_spec(s) for s in resid_shapes]
    return pl.pallas_call(
        kernel,
        grid=(batch // bb,),
        in_specs=[
            batch_spec(x.shape),
            batch_spec(bias.shape),
            *[const_spec(a) for a in consts],
            *[batch_spec(m.shape) for m in masks],
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((bb * seq, 3 * hidden), x.dtype),
            pltpu.VMEM((bb * seq, hidden), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops_gemm + flops_attn,
            bytes_accessed=(2 + len(masks) + (4 if save_resid else 0))
            * batch * seq * hidden * x.dtype.itemsize,
            transcendentals=batch * seq * (num_heads * seq + inter),
        ),
        interpret=interpret,
    )(x, bias, *consts, *masks)


@functools.lru_cache(maxsize=None)
def _call_partitioned(num_heads, scale, eps, interpret, dropout=False):
    """custom_partitioning wrapper: batch partitionable, weights replicated
    (same mechanism as ops/partition.py for attention/pool+norm)."""
    from instacart_next_order_recommendation_tpu.ops.partition import batch_partitioned

    def impl(*args):
        return _call(*args, num_heads=num_heads, scale=scale, eps=eps,
                     interpret=interpret)

    rule = (
        "b s h, b u8 s2, a c, u0 c, d e, u1 e, u2 f, u3 g, k l, u4 l, m n,"
        " u5 n, u6 p, u7 r"
        + (", b s h, b s h" if dropout else "")
        + " -> b s h"
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


def _prep_inputs(x, mask, layer, cdt):
    """Shared wrapper plumbing: concatenated/cast weights + padded key bias."""
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
        bias = jnp.pad(
            bias, ((0, 0), (0, 0), (0, skv - seq)), constant_values=_NEG_INF
        )
    weights = (
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
    return bias, weights


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
    bias, weights = _prep_inputs(x, mask, layer, cdt)
    if jax.device_count() == 1:
        call = functools.partial(
            _call, num_heads=num_heads, scale=scale, eps=eps,
            interpret=pallas_interpret(),
        )
    else:
        call = _call_partitioned(num_heads, scale, eps, pallas_interpret())
    return call(x, bias, *weights)


# --------------------------------------------------------------------------
# Training path: fused forward + recompute backward.
#
# Dropout becomes explicit {0, 1/keep} mask INPUTS (generated by the caller
# from the same PRNG stream as the unfused path, so numerics match), which
# makes the layer a pure function of arrays: the forward runs the Pallas
# kernel, and the backward re-derives gradients through a jnp oracle of the
# identical math (flash-style recompute — activations are never stored).


def _oracle(x, bias, m1, m2, qkv_w, qkv_b, o_w, o_b, ln1_s, ln1_b,
            w1, b1, w2, b2, ln2_s, ln2_b, *, num_heads, scale, eps):
    """jnp mirror of ``_kernel`` (same cast points, masks, gelu approx).

    Used as the differentiation oracle for the recompute backward and as the
    numerical test reference for the train core. ``m1``/``m2`` may be None
    (no dropout) — the mask multiplies are elided entirely.
    """
    cdt = x.dtype
    b_, s_, h_ = x.shape
    hd = h_ // num_heads
    x2 = x.reshape(b_ * s_, h_)

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    qkv = (dot(x2, qkv_w) + qkv_b.astype(jnp.float32)).astype(cdt)
    qkv = qkv.reshape(b_, s_, 3 * h_)

    def heads(t):
        return t.reshape(b_, s_, num_heads, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = (heads(qkv[..., i * h_ : (i + 1) * h_]) for i in range(3))
    logits = (
        jnp.einsum("bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32)
        * scale
    )
    logits = logits + bias[:, :, None, :s_].reshape(b_, 1, 1, s_)
    mx = jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
    p = jnp.exp(logits - mx)
    z = jnp.sum(p, axis=-1, keepdims=True)
    out = (
        jnp.einsum(
            "bhqk,bhkd->bhqd", p.astype(cdt), vh, preferred_element_type=jnp.float32
        )
        / z
    )
    attn = out.transpose(0, 2, 1, 3).reshape(b_ * s_, h_).astype(cdt)

    def layer_norm(res_f32, s, b):
        mean = jnp.mean(res_f32, axis=-1, keepdims=True)
        cent = res_f32 - mean
        var = jnp.mean(cent * cent, axis=-1, keepdims=True)
        return cent * jax.lax.rsqrt(var + eps) * s + b

    ao = (dot(attn, o_w) + o_b.astype(jnp.float32)).astype(cdt)
    if m1 is not None:
        ao = ao * m1.reshape(b_ * s_, h_)
    x1 = layer_norm((x2 + ao).astype(jnp.float32), ln1_s, ln1_b).astype(cdt)
    h = dot(x1, w1) + b1.astype(jnp.float32)
    h = _gelu_exact(h).astype(cdt)
    f = (dot(h, w2) + b2.astype(jnp.float32)).astype(cdt)
    if m2 is not None:
        f = f * m2.reshape(b_ * s_, h_)
    y = layer_norm((x1 + f).astype(jnp.float32), ln2_s, ln2_b).astype(cdt)
    return y.reshape(b_, s_, h_)


def _oracle_blockdiag(x, bias, m1, m2, qkv_w, qkv_b, o_w, o_b, ln1_s, ln1_b,
                      w1, b1, w2, b2, ln2_s, ln2_b, *, num_heads, scale, eps):
    """jnp mirror of ``_kernel`` using its block-diagonal attention form.

    Numerically identical math to ``_oracle`` (same cast points, same
    f32 softmax with the denominator applied after the PV dot), with the
    attention contractions over 128 lanes instead of per-head head_dim-32
    einsums — the hypothesis was that XLA would lower these tile-aligned
    and make the recompute backward cheaper. **Measured r3: it does not**
    (36.7 vs 24.4 ms/step at B=64 — in plain XLA the hpg x structural-zero
    FLOPs cost more than the per-head layout waste, and the vjp doubles
    them). Kept, tested for value+grad equality, behind
    ``ITOR_BWD_ORACLE=blockdiag`` as a reproducible negative result: the
    formulation trick that makes the Pallas FORWARD fast needs the
    kernel's VMEM scheduling to pay off, which is exactly why a
    hand-written fused backward remains the real headroom (ROADMAP 2b).
    """
    cdt = x.dtype
    b_, s_, h_ = x.shape
    hd = h_ // num_heads
    hpg = 128 // hd
    ngroups = num_heads // hpg
    skv = -(-s_ // 128) * 128
    x2 = x.reshape(b_ * s_, h_)

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    qkv = (dot(x2, qkv_w) + qkv_b.astype(jnp.float32)).astype(cdt)
    qkv = qkv.reshape(b_, s_, 3 * h_)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    kv_masks = [
        ((lane >= i * hd) & (lane < (i + 1) * hd)).astype(cdt) for i in range(hpg)
    ]
    pad_rows = skv - s_
    outs = []
    for g in range(ngroups):
        lo = g * 128
        qg = qkv[:, :, lo : lo + 128]
        kg = qkv[:, :, h_ + lo : h_ + lo + 128]
        vg = qkv[:, :, 2 * h_ + lo : 2 * h_ + lo + 128]
        if pad_rows:
            zp = jnp.zeros((b_, pad_rows, 128), cdt)
            kg = jnp.concatenate([kg, zp], axis=1)
            vg = jnp.concatenate([vg, zp], axis=1)
        k_bd = jnp.concatenate([kg * m for m in kv_masks], axis=1)  # [b, hpg*skv, 128]
        v_bd = jnp.concatenate([vg * m for m in kv_masks], axis=1)
        scores = (
            jnp.einsum("bqd,bkd->bqk", qg, k_bd, preferred_element_type=jnp.float32)
            * scale
        ).reshape(b_, s_, hpg, skv)
        scores = scores + bias[:, :, None, :]  # bias [b, 1, skv] (padded keys -inf)
        mx = jax.lax.stop_gradient(jnp.max(scores, axis=-1, keepdims=True))
        p = jnp.exp(scores - mx)
        z = jnp.sum(p, axis=-1, keepdims=True)  # [b, s, hpg, 1] f32
        out_bd = jnp.einsum(
            "bqk,bkd->bqd",
            p.reshape(b_, s_, hpg * skv).astype(cdt),
            v_bd,
            preferred_element_type=jnp.float32,
        )  # [b, s, 128]: head i's output lands in its own lane block
        z_lanes = jnp.broadcast_to(z, (b_, s_, hpg, hd)).reshape(b_, s_, 128)
        outs.append((out_bd / z_lanes).astype(cdt))
    attn = jnp.concatenate(outs, axis=-1).reshape(b_ * s_, h_)

    def layer_norm(res_f32, s, b):
        mean = jnp.mean(res_f32, axis=-1, keepdims=True)
        cent = res_f32 - mean
        var = jnp.mean(cent * cent, axis=-1, keepdims=True)
        return cent * jax.lax.rsqrt(var + eps) * s + b

    ao = (dot(attn, o_w) + o_b.astype(jnp.float32)).astype(cdt)
    if m1 is not None:
        ao = ao * m1.reshape(b_ * s_, h_)
    x1 = layer_norm((x2 + ao).astype(jnp.float32), ln1_s, ln1_b).astype(cdt)
    h = dot(x1, w1) + b1.astype(jnp.float32)
    h = _gelu_exact(h).astype(cdt)
    f = (dot(h, w2) + b2.astype(jnp.float32)).astype(cdt)
    if m2 is not None:
        f = f * m2.reshape(b_ * s_, h_)
    y = layer_norm((x1 + f).astype(jnp.float32), ln2_s, ln2_b).astype(cdt)
    return y.reshape(b_, s_, h_)


# --------------------------------------------------------------------------
# Fused BACKWARD kernel (r3, opt-in via ITOR_FUSED_BWD=1).
#
# One Pallas program per batch block: recomputes the forward entirely in
# VMEM (same block-diagonal attention as the forward kernel), then runs the
# backward chain through both LayerNorms, the FFN and the attention — the
# part XLA's recompute-vjp does through per-head einsums with head_dim-32
# layout waste. The kernel emits dx plus the intermediate grads and
# activations; the four large weight-gradient GEMMs (dWqkv/dWo/dW1/dW2) run
# OUTSIDE in XLA over the whole batch (tile-friendly [H, N]x[N, *] shapes,
# no giant VMEM accumulators). LN scale/bias grads leave the kernel as
# per-example [B, H] partials (seq-reduced in VMEM) and are summed outside —
# per-example rather than in-kernel accumulators so every kernel output
# carries the batch dimension, which is what lets the SAME kernel partition
# along batch under jit-GSPMD (``_call_bwd_partitioned``): each shard reduces
# its local examples, and XLA turns the outer sum + wgrad GEMMs into the
# cross-shard psum a hand-written shard_map would need.


def bwd_ffn_chunks(bb: int, seq: int, inter: int) -> int:
    """FFN chunk count for the backward kernel: smallest power of two that
    caps the per-chunk [bb*seq, inter/chunks] f32 transient at ~1MB.
    ITOR_FUSED_BWD_FFN_CHUNKS overrides for tuning."""
    import os

    env = (os.getenv("ITOR_FUSED_BWD_FFN_CHUNKS") or "").strip()
    if env:
        chunks = max(1, int(env))
        while inter % chunks:
            chunks -= 1
        return chunks
    chunks = 1
    while bb * seq * (inter // chunks) * 4 > (1 << 20) and inter % (chunks * 2) == 0:
        chunks *= 2
    return chunks


def _batch_shard_divisor() -> int:
    """Per-shard batch divisor for the split-form VMEM gate under jit-GSPMD.

    The trainer shards the batch over the mesh's ``data`` axis only, so
    dividing the global batch by ``jax.device_count()`` under-estimates the
    per-shard batch whenever a ``model`` (or other non-data) axis is present
    — which could admit a split kernel whose [B, H] LN partials exceed VMEM
    and fail Mosaic compilation instead of routing to the recompute
    fallback. With an abstract mesh in scope, use its ``data`` axis size
    (assume unsharded when the mesh has no such axis: over-estimating the
    per-shard batch can only push toward the safe fallback). With no mesh
    context (bare multi-device jit), device_count stays the best bound.
    """
    try:
        shape = dict(jax.sharding.get_abstract_mesh().shape)
    except Exception:  # noqa: BLE001 - no mesh context
        shape = {}
    if not shape:
        return jax.device_count()
    return max(1, int(shape.get("data", 1)))


def _gelu_grad(x):
    """d/dx gelu_exact (f32): Phi(x) + x*phi(x)."""
    cdf = 0.5 * (1.0 + _erf(x * 0.7071067811865476))
    pdf = jnp.exp(-0.5 * x * x) * 0.3989422804014327
    return cdf + x * pdf


def _bwd_kernel(
    x_ref, bias_ref, g_ref,
    qkv_w_ref, qkv_b_ref, o_w_ref, o_b_ref, ln1_s_ref, ln1_b_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, ln2_s_ref, ln2_b_ref,
    *rest,
    bb: int, seq: int, hidden: int, num_heads: int, scale: float, eps: float,
    dropout: bool, wgrads: bool = False, resid: bool = False,
    ffn_chunks: int = 1, pz_resident: bool = False,
):
    # rest (wgrads=False) = ([m1_ref, m2_ref,] dx, dqkv_out, dao, dhpre, df,
    #         attn_out, x1_out, ds1, db1ln, ds2, db2ln, qkv_scr, attn_scr,
    #         dattn_scr, dqkv_scr [, hg_scr, gp_scr] [, p_scr, z_scr])
    # rest (wgrads=True)  = ([m1_ref, m2_ref,] [4 resid input refs,] dx,
    #         then one grad ref per weight in the weights-tuple order, then
    #         the four scratches [, hg_scr, gp_scr] [, p_scr, z_scr]). With
    #         resid the fwd's saved (attn, ao, x1, f) replace the in-VMEM
    #         forward recompute past qkv. With ffn_chunks > 1 (long-seq
    #         shapes) the FFN fwd recompute and backward both run chunked
    #         over the intermediate dim, staging gelu(hpre) and gelu'(hpre)
    #         in two compute-dtype scratches so no [n, inter] f32 tensor is
    #         ever live — the VMEM saving that lets the fully-fused form
    #         compile at S=256 (the reference's training shape). With
    #         pz_resident the fwd-recompute attention loop stages the
    #         softmax probabilities and per-head denominators in two f32
    #         scratches and the backward loop reuses them — eliminating the
    #         second scores-GEMM + softmax pass per (example, head-group).
    if pz_resident:
        rest, (p_scr, z_scr) = rest[:-2], rest[-2:]
    if ffn_chunks > 1:
        rest, (hg_scr, gp_scr) = rest[:-2], rest[-2:]
    if dropout:
        m1_ref, m2_ref = rest[:2]
        rest = rest[2:]
    if resid:
        attn_in_ref, ao_in_ref, x1_in_ref, f_in_ref = rest[:4]
        rest = rest[4:]
    if wgrads:
        (dx_ref, dqkv_w_ref_g, dqkv_b_ref_g, d_o_w_ref, d_o_b_ref,
         ds1_ref, db1_ref, d_w1_ref, d_b1_ref, d_w2_ref, d_b2_ref,
         ds2_ref, db2_ref,
         qkv_ref, attn_ref, dattn_ref, dqkv_ref) = rest
    else:
        (dx_ref, dqkv_out_ref, dao_ref, dhpre_ref, df_ref, attn_out_ref,
         x1_out_ref, ds1_ref, db1_ref, ds2_ref, db2_ref,
         qkv_ref, attn_ref, dattn_ref, dqkv_ref) = rest

    head_dim = hidden // num_heads
    hpg = 128 // head_dim
    ngroups = num_heads // hpg
    cdt = x_ref.dtype
    skv = -(-seq // 128) * 128
    n = bb * seq

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    def dot_t(a, b):  # a @ b.T
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    def dot_tt(a, b):  # a.T @ b
        return jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    x = x_ref[...].reshape(n, hidden)

    # ---- forward recompute (identical to _kernel) -------------------------
    # The qkv GEMM always reruns (cheaper than round-tripping a 3H-wide
    # residual through HBM — measured); with resid, everything downstream of
    # the attention probabilities comes from the fwd's saved tensors. The
    # scores/probs are re-derived in the bwd loop either way (saving the
    # [seq, hpg*skv] prob tiles would cost more than the scores GEMM).
    qkv = dot(x, qkv_w_ref[...]) + qkv_b_ref[...].astype(jnp.float32)
    qkv_ref[...] = qkv.astype(cdt)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1) % 128
    kv_masks = [
        ((lane >= i * head_dim) & (lane < (i + 1) * head_dim)).astype(cdt)
        for i in range(hpg)
    ]
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    out_masks = [
        ((lane1 >= i * head_dim) & (lane1 < (i + 1) * head_dim)).astype(jnp.float32)
        for i in range(hpg)
    ]

    def qkv_tiles(rows, g):
        """Tile plumbing for head-group g: (qg, k_bd, v_bd) — mask/concat
        only, no GEMMs."""
        lo = g * 128
        qg = rows[:, lo : lo + 128]
        kg = rows[:, hidden + lo : hidden + lo + 128]
        vg = rows[:, 2 * hidden + lo : 2 * hidden + lo + 128]
        kv = jnp.concatenate([kg, vg], axis=1)
        if skv != seq:
            kv = jnp.concatenate([kv, jnp.zeros((skv - seq, 256), cdt)], axis=0)
        kv_bd = jnp.concatenate([kv * m for m in kv_masks], axis=0)
        return qg, kv_bd[:, :128], kv_bd[:, 128:]

    def softmax_tiles(qg, k_bd, b):
        """Scores GEMM + per-head softmax: (p_f32 [seq, hpg*skv],
        z [seq, 128])."""
        bias = bias_ref[pl.ds(b, 1)].reshape(1, skv)
        scores = dot_t(qg, k_bd) * scale  # [seq, hpg*skv] f32
        ps, zs = [], []
        for i in range(hpg):
            s_i = scores[:, i * skv : (i + 1) * skv] + bias
            m_i = jnp.max(s_i, axis=-1, keepdims=True)
            p_i = jnp.exp(s_i - m_i)
            zs.append(jnp.sum(p_i, axis=-1, keepdims=True))
            ps.append(p_i)
        p = jnp.concatenate(ps, axis=1)
        z = jnp.concatenate(
            [jnp.broadcast_to(z_i, (seq, head_dim)) for z_i in zs], axis=1
        )
        return p, z

    def group_tiles(rows, b, g):
        qg, k_bd, v_bd = qkv_tiles(rows, g)
        p, z = softmax_tiles(qg, k_bd, b)
        return qg, k_bd, v_bd, p, z

    def attn_fwd_body(b, _):
        r0 = pl.multiple_of(b * seq, seq)
        rows = qkv_ref[pl.ds(r0, seq), :]
        for g in range(ngroups):
            qg, k_bd, v_bd = qkv_tiles(rows, g)
            p, z = softmax_tiles(qg, k_bd, b)
            if pz_resident:
                pr0 = pl.multiple_of((b * ngroups + g) * seq, seq)
                p_scr[pl.ds(pr0, seq), :] = p
                z_scr[pl.ds(pr0, seq), :] = z
            attn_ref[pl.ds(r0, seq), g * 128 : g * 128 + 128] = (
                dot(p.astype(cdt), v_bd) / z
            ).astype(cdt)
        return 0

    if resid:
        # Saved attention output + post-dropout projection: skip the PV
        # dots and the o-projection GEMM.
        attn_ref[...] = attn_in_ref[...].reshape(n, hidden)
        attn = attn_ref[...]
        ao_c = ao_in_ref[...].reshape(n, hidden)
    else:
        jax.lax.fori_loop(0, bb, attn_fwd_body, 0)
        attn = attn_ref[...]
        ao = dot(attn, o_w_ref[...]) + o_b_ref[...].astype(jnp.float32)
        ao_c = ao.astype(cdt)
        if dropout:
            ao_c = ao_c * m1_ref[...].reshape(n, hidden)

    def ln_fwd_bwd(r_f32, s_row, dy_f32):
        mean = jnp.mean(r_f32, axis=-1, keepdims=True)
        cent = r_f32 - mean
        var = jnp.mean(cent * cent, axis=-1, keepdims=True)
        inv = jax.lax.rsqrt(var + eps)
        nh = cent * inv
        dnh = dy_f32 * s_row
        dr = inv * (
            dnh
            - jnp.mean(dnh, axis=-1, keepdims=True)
            - nh * jnp.mean(dnh * nh, axis=-1, keepdims=True)
        )
        if wgrads:
            # Whole-block [1, H] sums feeding the in-kernel accumulators.
            ds = jnp.sum(dy_f32 * nh, axis=0, keepdims=True)
            db = jnp.sum(dy_f32, axis=0, keepdims=True)
        else:
            # Per-EXAMPLE scale/bias partials [bb, H] (summed over seq only):
            # batch-dim outputs keep the kernel partitionable along batch.
            ds = jnp.sum((dy_f32 * nh).reshape(bb, seq, hidden), axis=1)
            db = jnp.sum(dy_f32.reshape(bb, seq, hidden), axis=1)
        return nh, dr, ds, db

    res1 = (x + ao_c).astype(jnp.float32)
    if resid:
        x1 = x1_in_ref[...].reshape(n, hidden)
    else:
        mean1 = jnp.mean(res1, axis=-1, keepdims=True)
        cent1 = res1 - mean1
        var1 = jnp.mean(cent1 * cent1, axis=-1, keepdims=True)
        x1 = (
            cent1 * jax.lax.rsqrt(var1 + eps) * ln1_s_ref[...] + ln1_b_ref[...]
        ).astype(cdt)
    if not wgrads:
        x1_out_ref[...] = x1.reshape(bb, seq, hidden)
        attn_out_ref[...] = attn.reshape(bb, seq, hidden)

    # hpre/hg recompute stays even with resid: gelu'(hpre) and hg (for dW2)
    # are needed, and saving the [N, inter] tensors would cost more traffic
    # than this one GEMM.
    inter = w1_ref.shape[-1]
    if ffn_chunks > 1:
        # Chunked FFN fwd recompute: stage gelu(hpre) / gelu'(hpre) in cdt
        # scratches chunk by chunk; only [n, inter/chunks] f32 transients.
        step_i = inter // ffn_chunks
        f_acc = b2_ref[...].astype(jnp.float32)
        for c in range(ffn_chunks):
            lo = c * step_i
            hpre_c = dot(x1, w1_ref[:, lo : lo + step_i]) + b1_ref[
                :, lo : lo + step_i
            ].astype(jnp.float32)
            hg_c = _gelu_exact(hpre_c).astype(cdt)
            hg_scr[:, lo : lo + step_i] = hg_c
            gp_scr[:, lo : lo + step_i] = _gelu_grad(hpre_c).astype(cdt)
            if not resid:
                f_acc = f_acc + dot(hg_c, w2_ref[pl.ds(lo, step_i), :])
        if resid:
            f_c = f_in_ref[...].reshape(n, hidden)
        else:
            f = f_acc.astype(cdt)
            f_c = f * m2_ref[...].reshape(n, hidden) if dropout else f
    else:
        hpre = dot(x1, w1_ref[...]) + b1_ref[...].astype(jnp.float32)
        hg = _gelu_exact(hpre).astype(cdt)
        if resid:
            f_c = f_in_ref[...].reshape(n, hidden)
        else:
            f = (dot(hg, w2_ref[...]) + b2_ref[...].astype(jnp.float32)).astype(cdt)
            f_c = f * m2_ref[...].reshape(n, hidden) if dropout else f
    res2 = (x1 + f_c).astype(jnp.float32)

    # ---- backward chain ---------------------------------------------------
    if wgrads:
        # f32 weight-grad accumulators live in revisited whole-array output
        # blocks (constant index maps): zero them once, += per grid step.
        @pl.when(pl.program_id(0) == 0)
        def _init_accums():
            for r in (dqkv_w_ref_g, dqkv_b_ref_g, d_o_w_ref, d_o_b_ref,
                      ds1_ref, db1_ref, d_w1_ref, d_b1_ref, d_w2_ref,
                      d_b2_ref, ds2_ref, db2_ref):
                r[...] = jnp.zeros_like(r)
    else:
        # The per-example partial outputs ride a single full-[B, H] block
        # (constant index map; Mosaic rejects sub-8-row tiled blocks): each
        # program writes its own bb rows, so every row is written exactly
        # once.
        prow = pl.multiple_of(pl.program_id(0) * bb, bb)

    g_up = g_ref[...].reshape(n, hidden).astype(jnp.float32)
    _, dres2, ds2, db2ln = ln_fwd_bwd(res2, ln2_s_ref[...], g_up)
    if wgrads:
        ds2_ref[...] += ds2
        db2_ref[...] += db2ln
    else:
        ds2_ref[pl.ds(prow, bb), :] = ds2
        db2_ref[pl.ds(prow, bb), :] = db2ln

    df = dres2 * m2_ref[...].reshape(n, hidden).astype(jnp.float32) if dropout else dres2
    df_c = df.astype(cdt)
    if wgrads:
        d_b2_ref[...] += jnp.sum(df, axis=0, keepdims=True)
    else:
        df_ref[...] = df_c.reshape(bb, seq, hidden)
    if ffn_chunks > 1:
        # Chunked FFN backward off the staged scratches: per chunk the
        # only f32 transients are [n, inter/chunks].
        step_i = inter // ffn_chunks
        dx1 = dres2
        for c in range(ffn_chunks):
            lo = c * step_i
            hg_c = hg_scr[:, lo : lo + step_i]
            dhg_c = dot_t(df_c, w2_ref[pl.ds(lo, step_i), :])
            dhpre_f = dhg_c * gp_scr[:, lo : lo + step_i].astype(jnp.float32)
            dhpre_cc = dhpre_f.astype(cdt)
            if wgrads:
                d_w2_ref[pl.ds(lo, step_i), :] += dot_tt(hg_c, df_c)
                d_w1_ref[:, lo : lo + step_i] += dot_tt(x1, dhpre_cc)
                d_b1_ref[:, lo : lo + step_i] += jnp.sum(
                    dhpre_f, axis=0, keepdims=True
                )
            else:
                dhpre_ref[:, :, lo : lo + step_i] = dhpre_cc.reshape(
                    bb, seq, step_i
                )
            dx1 = dx1 + dot_t(dhpre_cc, w1_ref[:, lo : lo + step_i])
    else:
        if wgrads:
            hg_c = hg  # gelu output from the fwd recompute above (cdt)
            d_w2_ref[...] += dot_tt(hg_c, df_c)
        dhg = dot_t(df_c, w2_ref[...])  # [n, inter] f32
        dhpre = dhg * _gelu_grad(hpre)
        dhpre_c = dhpre.astype(cdt)
        if wgrads:
            d_w1_ref[...] += dot_tt(x1, dhpre_c)
            d_b1_ref[...] += jnp.sum(dhpre, axis=0, keepdims=True)
        else:
            dhpre_ref[...] = dhpre_c.reshape(bb, seq, w1_ref.shape[-1])
        dx1 = dres2 + dot_t(dhpre_c, w1_ref[...])

    _, dres1, ds1, db1ln = ln_fwd_bwd(res1, ln1_s_ref[...], dx1)
    if wgrads:
        ds1_ref[...] += ds1
        db1_ref[...] += db1ln
    else:
        ds1_ref[pl.ds(prow, bb), :] = ds1
        db1_ref[pl.ds(prow, bb), :] = db1ln

    dao = dres1 * m1_ref[...].reshape(n, hidden).astype(jnp.float32) if dropout else dres1
    dao_c = dao.astype(cdt)
    if wgrads:
        d_o_w_ref[...] += dot_tt(attn, dao_c)
        d_o_b_ref[...] += jnp.sum(dao, axis=0, keepdims=True)
    else:
        dao_ref[...] = dao_c.reshape(bb, seq, hidden)
    dattn_ref[...] = dot_t(dao_c, o_w_ref[...]).astype(cdt)

    def attn_bwd_body(b, _):
        r0 = pl.multiple_of(b * seq, seq)
        rows = qkv_ref[pl.ds(r0, seq), :]
        d_attn_rows = dattn_ref[pl.ds(r0, seq), :]
        a_rows = attn_ref[pl.ds(r0, seq), :]
        for g in range(ngroups):
            lo = g * 128
            if pz_resident and not resid:
                # Probabilities staged by the fwd loop: skip the second
                # scores GEMM + softmax for this (example, group).
                qg, k_bd, v_bd = qkv_tiles(rows, g)
                pr0 = pl.multiple_of((b * ngroups + g) * seq, seq)
                p = p_scr[pl.ds(pr0, seq), :]
                z = z_scr[pl.ds(pr0, seq), :]
            else:
                qg, k_bd, v_bd, p, z = group_tiles(rows, b, g)
            dA = d_attn_rows[:, lo : lo + 128].astype(jnp.float32)
            A = a_rows[:, lo : lo + 128].astype(jnp.float32)
            dU = dA / z  # [seq, 128] f32
            p_c = p.astype(cdt)
            dU_c = dU.astype(cdt)
            # dV (block-diag): P^T @ dU, head lanes masked per block.
            dv_bd = dot_tt(p_c, dU_c)  # [hpg*skv, 128]
            # dP~ = dU @ V^T ; per-head dz folds the deferred denominator.
            dp = dot_t(dU_c, v_bd)  # [seq, hpg*skv] f32
            dl_blocks = []
            dvg = jnp.zeros((skv, 128), jnp.float32)
            dadota = dA * A  # [seq, 128]
            for i in range(hpg):
                # Deferred-denominator term: dZ_i = -(sum over head-i lanes
                # of dA*A) / z_i (A is the already-divided output).
                dz_i = -jnp.sum(
                    dadota * out_masks[i], axis=-1, keepdims=True
                ) / z[:, i * head_dim : i * head_dim + 1]
                dl_blocks.append(
                    p[:, i * skv : (i + 1) * skv]
                    * (dp[:, i * skv : (i + 1) * skv] + dz_i)
                )
                dvg = dvg + dv_bd[i * skv : (i + 1) * skv, :] * kv_masks[i][:, :128]
            dl = jnp.concatenate(dl_blocks, axis=1).astype(cdt)  # [seq, hpg*skv]
            dqg = dot(dl, k_bd) * scale  # [seq, 128]
            dk_bd = dot_tt(dl, qg) * scale  # [hpg*skv, 128]
            dkg = jnp.zeros((skv, 128), jnp.float32)
            for i in range(hpg):
                dkg = dkg + dk_bd[i * skv : (i + 1) * skv, :] * kv_masks[i][:, :128]
            dqkv_ref[pl.ds(r0, seq), lo : lo + 128] = dqg.astype(cdt)
            dqkv_ref[pl.ds(r0, seq), hidden + lo : hidden + lo + 128] = (
                dkg[:seq].astype(cdt)
            )
            dqkv_ref[pl.ds(r0, seq), 2 * hidden + lo : 2 * hidden + lo + 128] = (
                dvg[:seq].astype(cdt)
            )
        return 0

    jax.lax.fori_loop(0, bb, attn_bwd_body, 0)
    dqkv = dqkv_ref[...]
    if wgrads:
        dqkv_w_ref_g[...] += dot_tt(x, dqkv)
        dqkv_b_ref_g[...] += jnp.sum(dqkv.astype(jnp.float32), axis=0, keepdims=True)
    else:
        dqkv_out_ref[...] = dqkv.reshape(bb, seq, 3 * hidden)
    dx = dres1 + dot_t(dqkv, qkv_w_ref[...])
    dx_ref[...] = dx.astype(cdt).reshape(bb, seq, hidden)


def _call_bwd(x, bias, g, *masks_and_weights, num_heads, scale, eps, interpret,
              wgrads=False, resids=()):
    n_masks = len(masks_and_weights) - 12
    masks = masks_and_weights[:n_masks]
    weights = masks_and_weights[n_masks:]
    batch, seq, hidden = x.shape
    inter = weights[6].shape[-1]  # w1
    import os

    ms = pl.ANY if interpret else pltpu.VMEM
    # The block holds ~15 [bb*seq] working tensors plus the weights (and in
    # wgrads mode ~7MB of f32 grad accumulators): keep the block small (bb=1
    # measured within 2% of bb=2 on v5e; env override for tuning).
    bb = max(1, int(os.getenv("ITOR_FUSED_BWD_BB", "1")))
    while batch % bb:
        bb -= 1
    # FFN chunking: above S=128 the [n, inter] f32 FFN transients are what
    # break the 16MB VMEM model, so the backward stages gelu/gelu' in cdt
    # scratches and runs the FFN fwd-recompute + backward chunk by chunk
    # (cap ~1MB per f32 transient). S<=128 keeps chunks=1 — the exact
    # kernel the r3/r4 numbers were measured on.
    ffn_chunks = bwd_ffn_chunks(bb, seq, inter)
    # Probs-resident attention backward (r5): the fwd-recompute loop stages
    # the softmax probabilities + denominators in f32 scratches and the bwd
    # loop reuses them, eliminating the second scores-GEMM + softmax per
    # (example, head-group). Costs bb*heads/hpg*seq*(hpg*skv+128)*4 bytes of
    # VMEM (~1 MB at MiniLM B-block/S=128), so gate on a budget and skip at
    # long seq where the FFN chunking already runs the VMEM to its edge.
    # ITOR_FUSED_BWD_PZ=0 opts out (A/B lever for the MFU table).
    head_dim = hidden // num_heads
    hpg = 128 // head_dim
    ngroups = num_heads // hpg
    skv = -(-seq // 128) * 128
    pz_bytes = bb * ngroups * seq * (hpg * skv + 128) * 4
    pz_budget_mb = int(os.getenv("ITOR_FUSED_BWD_PZ_MAXMB", "4") or 4)
    pz_resident = (
        _env_on("ITOR_FUSED_BWD_PZ")
        and not resids
        and pz_bytes <= (pz_budget_mb << 20)
    )

    def const_spec(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim, memory_space=ms)

    def batch_spec(shape):
        return pl.BlockSpec(
            (bb, *shape[1:]), lambda i: (i,) + (0,) * (len(shape) - 1), memory_space=ms
        )

    def full_spec(shape):
        # Whole-array block revisited by every program (constant index map):
        # the [B, H] LN-grad partial outputs stay VMEM-resident across the
        # grid and write back once; each program fills only its own rows.
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=ms)

    kernel = functools.partial(
        _bwd_kernel, bb=bb, seq=seq, hidden=hidden, num_heads=num_heads,
        scale=scale, eps=eps, dropout=bool(masks), wgrads=wgrads,
        resid=bool(resids), ffn_chunks=ffn_chunks, pz_resident=pz_resident,
    )
    f32 = jnp.float32
    if wgrads:
        # dx plus one f32 grad per weight (weights-tuple order). The weight
        # grads are revisited whole-array VMEM accumulator blocks — nothing
        # [B, S, *]-sized leaves the kernel except dx.
        out_shape = [jax.ShapeDtypeStruct((batch, seq, hidden), x.dtype)] + [
            jax.ShapeDtypeStruct(w.shape, f32) for w in weights
        ]
        out_specs = [batch_spec((batch, seq, hidden))] + [
            full_spec(w.shape) for w in weights
        ]
    else:
        out_shape = [
            jax.ShapeDtypeStruct((batch, seq, hidden), x.dtype),      # dx
            jax.ShapeDtypeStruct((batch, seq, 3 * hidden), x.dtype),  # dqkv
            jax.ShapeDtypeStruct((batch, seq, hidden), x.dtype),      # dao
            jax.ShapeDtypeStruct((batch, seq, inter), x.dtype),       # dhpre
            jax.ShapeDtypeStruct((batch, seq, hidden), x.dtype),      # df
            jax.ShapeDtypeStruct((batch, seq, hidden), x.dtype),      # attn
            jax.ShapeDtypeStruct((batch, seq, hidden), x.dtype),      # x1
            jax.ShapeDtypeStruct((batch, hidden), f32),               # ds1 partials
            jax.ShapeDtypeStruct((batch, hidden), f32),               # db1ln partials
            jax.ShapeDtypeStruct((batch, hidden), f32),               # ds2 partials
            jax.ShapeDtypeStruct((batch, hidden), f32),               # db2ln partials
        ]
        out_specs = [
            batch_spec((batch, seq, hidden)),
            batch_spec((batch, seq, 3 * hidden)),
            batch_spec((batch, seq, hidden)),
            batch_spec((batch, seq, inter)),
            batch_spec((batch, seq, hidden)),
            batch_spec((batch, seq, hidden)),
            batch_spec((batch, seq, hidden)),
            full_spec((batch, hidden)),
            full_spec((batch, hidden)),
            full_spec((batch, hidden)),
            full_spec((batch, hidden)),
        ]
    skv = -(-seq // 128) * 128
    flops_attn = 2 * 4 * batch * seq * skv * (128 // (hidden // num_heads)) * 128
    flops_gemm = 2 * 2 * batch * seq * (4 * hidden * hidden + 2 * hidden * inter)
    if wgrads:
        flops_gemm += 2 * batch * seq * (4 * hidden * hidden + 2 * hidden * inter)
    return pl.pallas_call(
        kernel,
        grid=(batch // bb,),
        in_specs=[
            batch_spec(x.shape),
            batch_spec(bias.shape),
            batch_spec(g.shape),
            *[const_spec(a) for a in weights],
            *[batch_spec(m.shape) for m in masks],
            *[batch_spec(r.shape) for r in resids],
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((bb * seq, 3 * hidden), x.dtype),  # qkv
            pltpu.VMEM((bb * seq, hidden), x.dtype),      # attn
            pltpu.VMEM((bb * seq, hidden), x.dtype),      # dattn
            pltpu.VMEM((bb * seq, 3 * hidden), x.dtype),  # dqkv
        ] + (
            [
                pltpu.VMEM((bb * seq, inter), x.dtype),   # hg (gelu out)
                pltpu.VMEM((bb * seq, inter), x.dtype),   # gp (gelu')
            ]
            if ffn_chunks > 1
            else []
        ) + (
            [
                pltpu.VMEM((bb * ngroups * seq, hpg * skv), jnp.float32),  # p
                pltpu.VMEM((bb * ngroups * seq, 128), jnp.float32),        # z
            ]
            if pz_resident
            else []
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops_gemm + flops_attn,
            bytes_accessed=(
                (3 + len(masks) + 4 * bool(resids)) if wgrads else 14
            ) * batch * seq * hidden * x.dtype.itemsize,
            transcendentals=2 * batch * seq * (num_heads * seq + inter),
        ),
        # Long-seq shapes legitimately need >16MB of scoped VMEM (v5e has
        # 128MB physical; XLA's default scoped limit is 16MB): at S=256 the
        # chunked wgrads form measures ~19.2MB. Raise the per-kernel limit
        # only when the seq demands it so S<=128 keeps the exact compiler
        # budget the r3/r4 numbers were measured under; bwd_supports stays
        # the admission gate against genuinely infeasible towers.
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=(28 << 20))
            if seq > 128 and not interpret
            else None
        ),
        interpret=interpret,
    )(x, bias, g, *weights, *masks, *resids)


@functools.lru_cache(maxsize=None)
def _call_bwd_partitioned(num_heads, scale, eps, interpret, dropout=False):
    """custom_partitioning wrapper for the backward kernel: batch
    partitionable, weights replicated. Every output carries the batch factor
    (the LN scale/bias grads are per-example partials), so under jit-GSPMD
    each shard runs the kernel on local rows only; the cross-shard reductions
    (partial sums + wgrad GEMM contractions over N) happen in the XLA ops of
    ``_fused_backward`` and lower to the usual psum collectives."""
    from instacart_next_order_recommendation_tpu.ops.partition import batch_partitioned

    def impl(*args):
        return _call_bwd(*args, num_heads=num_heads, scale=scale, eps=eps,
                         interpret=interpret)

    rule = (
        "b s h, b u8 s2, b s h"
        + (", b s h, b s h" if dropout else "")
        + ", a c, u0 c, d e, u1 e, u2 f, u3 g, k l, u4 l, m n, u5 n, u6 p,"
        " u7 r"
        " -> b s h, b s c, b s h, b s l, b s h, b s h, b s h,"
        " b h, b h, b h, b h"
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


@functools.lru_cache(maxsize=None)
def _call_bwd_wgrads_partitioned(num_heads, scale, eps, interpret, dropout=False):
    """custom_partitioning wrapper for the FULLY-FUSED backward (in-kernel
    weight-grad accumulation) on multi-device meshes: batch partitionable,
    weights replicated. Each shard runs the wgrads kernel on its local rows,
    so its 12 f32 accumulator outputs are weight-grad PARTIALS over the
    local batch; the lowering all-reduces them over the axes that shard the
    batch — one psum per weight, the same collective data parallelism
    already implies (and the same one the split form's sharded XLA wgrad
    GEMMs lower to). This removes the r3 limitation that kept multi-device
    meshes on the split path (~10%/step slower at B=512; PERFORMANCE.md)."""
    from instacart_next_order_recommendation_tpu.ops.partition import batch_partitioned

    def impl(*args):
        return _call_bwd(*args, num_heads=num_heads, scale=scale, eps=eps,
                         interpret=interpret, wgrads=True)

    rule = (
        "b s h, b u8 s2, b s h"
        + (", b s h, b s h" if dropout else "")
        + ", a c, u0 c, d e, u1 e, u2 f, u3 g, k l, u4 l, m n, u5 n, u6 p,"
        " u7 r"
        " -> b s h, a c, u0 c, d e, u1 e, u2 f, u3 g, k l, u4 l, m n, u5 n,"
        " u6 p, u7 r"
    )
    return batch_partitioned(
        impl,
        rule=rule,
        # Shardy requires these sorted by first appearance in the rule.
        need_replication=(
            "s", "h", "u8", "s2", "a", "c", "u0", "d", "e", "u1", "u2", "f",
            "u3", "g", "k", "l", "u4", "m", "n", "u5", "u6", "p", "u7", "r",
        ),
        reduce_outputs=tuple(range(1, 13)),  # the 12 weight-grad partials
    )


def _fused_backward(x, bias, masks, weights, g, *, num_heads, scale, eps,
                    interpret, multi=False, resids=(), wgrads=False):
    """Full vjp of the layer core w.r.t. (x, *weights).

    ``wgrads=True`` (default dispatch when the accumulators fit VMEM): the
    fully-fused kernel — weight grads accumulate in VMEM-resident f32
    blocks across the grid, so the ONLY [B, S, *] tensor that touches HBM
    is dx (measured r3 on v5e: the split path streams ~1 GB/layer of
    intermediates at B=1024 just to feed the XLA wgrad GEMMs). On
    multi-device meshes the kernel runs shard-local and the wrapper psums
    the 12 weight-grad partials (_call_bwd_wgrads_partitioned).
    ``ITOR_FUSED_BWD_WGRAD=0`` opts back into the split path (kernel emits
    intermediate grads, wgrad GEMMs run in XLA).
    """
    (qkv_w, qkv_b, o_w, o_b, ln1_s, ln1_b, w1, b1, w2, b2, ln2_s, ln2_b) = weights
    if wgrads:
        if multi:
            call = _call_bwd_wgrads_partitioned(
                num_heads, scale, eps, interpret, dropout=bool(masks)
            )
            dx, *dw_f32 = call(x, bias, g, *masks, *weights)
        else:
            dx, *dw_f32 = _call_bwd(
                x, bias, g, *masks, *weights,
                num_heads=num_heads, scale=scale, eps=eps, interpret=interpret,
                wgrads=True, resids=resids,
            )
        dw = tuple(d.astype(w.dtype) for d, w in zip(dw_f32, weights))
        return dx, dw
    if multi:
        call = _call_bwd_partitioned(
            num_heads, scale, eps, interpret, dropout=bool(masks)
        )
        outs = call(x, bias, g, *masks, *weights)
    else:
        outs = _call_bwd(
            x, bias, g, *masks, *weights,
            num_heads=num_heads, scale=scale, eps=eps, interpret=interpret,
        )
    (dx, dqkv, dao, dhpre, df, attn, x1, ds1_p, db1_p, ds2_p, db2_p) = outs
    ds1 = jnp.sum(ds1_p, axis=0, keepdims=True)
    db1ln = jnp.sum(db1_p, axis=0, keepdims=True)
    ds2 = jnp.sum(ds2_p, axis=0, keepdims=True)
    db2ln = jnp.sum(db2_p, axis=0, keepdims=True)
    b_, s_, h_ = x.shape
    n = b_ * s_
    inter = w1.shape[-1]

    def tdot(a, bmat):  # a.T @ b in f32
        return jax.lax.dot_general(
            a, bmat, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    x2 = x.reshape(n, h_)
    dqkv2 = dqkv.reshape(n, 3 * h_)
    dao2 = dao.reshape(n, h_)
    dhpre2 = dhpre.reshape(n, inter)
    df2 = df.reshape(n, h_)
    attn2 = attn.reshape(n, h_)
    x12 = x1.reshape(n, h_)
    # Hg recompute (one GEMM) instead of shipping a [N, inter] tensor out.
    hg = _gelu_exact(
        jax.lax.dot_general(
            x12, w1, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        + b1.astype(jnp.float32)
    ).astype(x.dtype)

    d_qkv_w = tdot(x2, dqkv2).astype(qkv_w.dtype)
    d_qkv_b = jnp.sum(dqkv2, axis=0, keepdims=True).astype(qkv_b.dtype)
    d_o_w = tdot(attn2, dao2).astype(o_w.dtype)
    d_o_b = jnp.sum(dao2, axis=0, keepdims=True).astype(o_b.dtype)
    d_w1 = tdot(x12, dhpre2).astype(w1.dtype)
    d_b1 = jnp.sum(dhpre2, axis=0, keepdims=True).astype(b1.dtype)
    d_w2 = tdot(hg, df2).astype(w2.dtype)
    d_b2 = jnp.sum(df2, axis=0, keepdims=True).astype(b2.dtype)
    dw = (
        d_qkv_w, d_qkv_b, d_o_w, d_o_b,
        ds1.astype(ln1_s.dtype), db1ln.astype(ln1_b.dtype),
        d_w1, d_b1, d_w2, d_b2,
        ds2.astype(ln2_s.dtype), db2ln.astype(ln2_b.dtype),
    )
    return dx, dw


@functools.lru_cache(maxsize=None)
def _train_core(num_heads, scale, eps, interpret, multi, dropout):
    """custom_vjp core over (x, bias, [m1, m2,] *weights).

    The backward differentiates the jnp oracle w.r.t. x and the weights only:
    bias and the dropout masks are closed over as constants (their cotangents
    are discarded by the outer AD anyway — bias comes from the integer
    attention mask, the masks from bernoulli draws), which keeps the
    recompute backward from building [B, skv] / [B, S, H] cotangents that
    are immediately thrown away.
    """
    if multi:
        part = _call_partitioned(num_heads, scale, eps, interpret, dropout=dropout)

    def fwd_impl(x, bias, masks, weights):
        if multi:
            return part(x, bias, *weights, *masks)
        return _call(
            x, bias, *weights, *masks,
            num_heads=num_heads, scale=scale, eps=eps, interpret=interpret,
        )

    def oracle(x, bias, masks, weights):
        import os

        m1, m2 = masks if dropout else (None, None)
        # Measured r3 (v5e, B=64 S=128): differentiating through the
        # block-diagonal formulation is SLOWER (36.7 vs 24.4 ms/step) —
        # in plain XLA the hpg x structural-zero FLOPs don't buy the
        # kernel's tile-alignment win, and the vjp doubles them. Per-head
        # stays the default; ITOR_BWD_ORACLE=blockdiag keeps the
        # experiment reproducible.
        fn = (
            _oracle_blockdiag
            if (os.getenv("ITOR_BWD_ORACLE") or "").strip().lower() == "blockdiag"
            else _oracle
        )
        return fn(
            x, bias, m1, m2, *weights, num_heads=num_heads, scale=scale, eps=eps
        )

    n_masks = 2 if dropout else 0

    @jax.custom_vjp
    def core(x, bias, *rest):
        return fwd_impl(x, bias, rest[:n_masks], rest[n_masks:])

    def _resid_on():
        # Residual saving pairs with the fully-fused (wgrads) single-device
        # backward: the fwd emits (attn, ao, x1, f) and the bwd skips the
        # recompute downstream of the attention probs. **Measured r3 and
        # kept opt-in (off by default)**: +1.7% at B=64 but -4% at B=512 —
        # at the throughput-optimal batch, streaming 4 extra [B, S, H]
        # residuals through HBM costs more than the PV/o/W2 recompute it
        # saves. (A heavier variant that also saved qkv was worse still:
        # 153 ms vs 137 at B=512 — the 3H-wide residual plus the fwd
        # block-size hit it forces.) ITOR_FUSED_BWD_RESID=1 enables it for
        # latency-bound small-batch training.
        return (
            not multi
            and _env_on("ITOR_FUSED_BWD")
            and _env_on("ITOR_FUSED_BWD_WGRAD")
            and _env_on("ITOR_FUSED_BWD_RESID", default_on=False)
        )

    def fwd_rule(x, bias, *rest):
        masks, weights = rest[:n_masks], rest[n_masks:]
        if _resid_on() and bwd_supports(
            x.shape[-1], weights[6].shape[-1], x.shape[1],
            x.dtype.itemsize, wgrads=True,
        ):
            y, *resids = _call(
                x, bias, *weights, *masks,
                num_heads=num_heads, scale=scale, eps=eps,
                interpret=interpret, save_resid=True,
            )
            return y, (x, bias, *rest, *resids)
        return fwd_impl(x, bias, masks, weights), (x, bias, *rest)

    def bwd_rule(residuals, g):
        x, bias, *rest = residuals
        resids = ()
        if len(rest) == n_masks + 12 + 4:
            resids = tuple(rest[n_masks + 12 :])
            rest = rest[: n_masks + 12]
        masks, weights = tuple(rest[:n_masks]), tuple(rest[n_masks:])
        zeros = tuple(jnp.zeros_like(r) for r in (bias, *masks))
        # Fused backward kernel — DEFAULT everywhere (measured r3,
        # single-device: 24.4 -> 23.1 ms/step at B=64 and 252.8 -> 178.8
        # at B=512, where it also lifts B=512 above B=64 in pairs/s;
        # flagship 5-epoch metrics re-validated, docs/VALIDATION.md).
        # Multi-device meshes route through the custom_partitioning wrapper
        # so the kernel stays shard-local along batch under jit-GSPMD.
        # ITOR_FUSED_BWD=0 is the opt-out back to the recompute-vjp path;
        # towers whose weights don't fit the kernel's VMEM model (e.g.
        # mpnet-base-class) fall back to it automatically (bwd_supports).
        # Feasibility gates per kernel form. The wgrads form's footprint is
        # batch-independent (accumulators only); the split form's includes
        # its batch-scaled [B, H] f32 LN partials, gated on the batch the
        # KERNEL sees per shard: inside shard_map x.shape[0] is already the
        # local shard (manual mesh axes present); under jit-GSPMD it is the
        # global batch, which the partitioned call divides across devices.
        # Preference order: fully-fused wgrads > split > recompute-vjp.
        fits_wgrads = (
            _env_on("ITOR_FUSED_BWD_WGRAD")
            and bwd_supports(
                x.shape[-1], weights[6].shape[-1], x.shape[1],
                x.dtype.itemsize, wgrads=True,
            )
        )
        in_manual = bool(getattr(jax.sharding.get_abstract_mesh(), "manual_axes", ()))
        shard_b = (
            x.shape[0] if (not multi or in_manual)
            else max(1, x.shape[0] // _batch_shard_divisor())
        )
        fits_split = bwd_supports(
            x.shape[-1], weights[6].shape[-1], x.shape[1],
            x.dtype.itemsize, wgrads=False, batch=shard_b,
        )
        if _env_on("ITOR_FUSED_BWD") and (fits_wgrads or fits_split):
            dx, dw = _fused_backward(
                x, bias, masks, weights, g,
                num_heads=num_heads, scale=scale, eps=eps, interpret=interpret,
                multi=multi, resids=resids, wgrads=fits_wgrads,
            )
            return (dx, *zeros, *dw)
        _, vjp = jax.vjp(
            lambda x_, *w: oracle(x_, bias, masks, w), x, *weights
        )
        dx, *dw = vjp(g)
        return (dx, *zeros, *dw)

    core.defvjp(fwd_rule, bwd_rule)
    return core


def fused_encoder_layer_train(
    x: jax.Array,
    mask: jax.Array,
    layer: dict,
    *,
    dropout_key: jax.Array,
    dropout_rate: float,
    num_heads: int,
    scale: float,
    eps: float,
) -> jax.Array:
    """Differentiable fused layer with BERT hidden dropout.

    Mask bits come from the same (key, shape, keep) bernoulli draws as the
    unfused ``models/encoder.py`` path, so switching implementations does not
    change the training trajectory beyond bf16 rounding.
    """
    from instacart_next_order_recommendation_tpu.ops import pallas_interpret

    cdt = x.dtype
    keep = 1.0 - float(dropout_rate)
    if keep >= 1.0:
        masks = ()  # maskless kernel variant: no [B, S, H] mask traffic
    else:
        k1, k2 = jax.random.split(dropout_key)
        inv = jnp.asarray(1.0 / keep, cdt)
        m1 = jnp.where(jax.random.bernoulli(k1, keep, x.shape), inv, 0).astype(cdt)
        m2 = jnp.where(jax.random.bernoulli(k2, keep, x.shape), inv, 0).astype(cdt)
        masks = (m1, m2)

    bias, weights = _prep_inputs(x, mask, layer, cdt)
    core = _train_core(
        num_heads, scale, eps, pallas_interpret(), jax.device_count() > 1,
        dropout=bool(masks),
    )
    return core(x, bias, *masks, *weights)
