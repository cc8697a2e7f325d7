"""MiniLM-class transformer tower: BERT encoder + mean-pool + L2-norm.

TPU-native re-design of the sentence-transformers bi-encoder the reference
fine-tunes (``all-MiniLM-L6-v2`` built at
/root/reference/src/training/train_sbert.py:174-180 and applied via
``model.encode`` in serve_recommendations.py:195-213). One shared tower
encodes both "user context text" and "product text" (two-tower with tied
weights).

Design choices (tpu-first):
- Pure functional: params are a pytree of arrays; no module framework. This
  keeps pjit sharding annotations, HF weight mapping, and optimizer wiring
  transparent.
- Layers are STACKED along a leading axis and the forward runs a single
  ``lax.scan`` over them: one compiled block instead of L, which cuts XLA
  compile time and lets the compiler pipeline HBM weight streaming.
- bf16 matmuls on the MXU (params stored f32; activations bf16), layernorm
  and softmax in f32.
- Attention and pool+norm dispatch to Pallas kernels on TPU (ops/).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from instacart_next_order_recommendation_tpu.ops import (
    masked_mean_pool_l2norm,
    multi_head_attention,
)
from instacart_next_order_recommendation_tpu.ops.fused_layer import (
    supports as fused_layer_supports,
)

Params = dict[str, Any]


def _fused_layer_enabled() -> bool:
    import os

    from instacart_next_order_recommendation_tpu.ops import use_pallas

    if os.getenv("ITOR_DISABLE_FUSED_LAYER", "").strip() in ("1", "true"):
        return False
    return use_pallas()


@dataclasses.dataclass(frozen=True)
class TowerConfig:
    """Architecture hyperparameters (BERT-encoder family)."""

    vocab_size: int = 30522
    hidden_size: int = 384
    num_layers: int = 6
    num_heads: int = 12
    intermediate_size: int = 1536
    max_position: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_dropout: float = 0.1
    max_seq_length: int = 256
    compute_dtype: str = "bfloat16"
    # Rematerialize each encoder layer in the backward pass (jax.checkpoint):
    # trades ~30% forward FLOPs for O(layers) activation memory — required for
    # large-batch training (e.g. batch 512 seq 128 stores ~3GB of attention
    # probabilities per layer without it).
    remat: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "TowerConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


# Preset matching the reference's default base model (all-MiniLM-L6-v2).
MINILM_L6 = TowerConfig()

# Larger preset for the mpnet-base-class configuration (BASELINE.json config 3).
MPNET_BASE_CLASS = TowerConfig(
    vocab_size=30527,
    hidden_size=768,
    num_layers=12,
    num_heads=12,
    intermediate_size=3072,
)


def _trunc_normal(key, shape, stddev=0.02, dtype=jnp.float32):
    return stddev * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def init_params(config: TowerConfig, key: jax.Array) -> Params:
    """Initialize parameters (BERT-style truncated-normal 0.02)."""
    h, inter, layers = config.hidden_size, config.intermediate_size, config.num_layers
    keys = jax.random.split(key, 16)
    return {
        "embeddings": {
            "word": _trunc_normal(keys[0], (config.vocab_size, h)),
            "position": _trunc_normal(keys[1], (config.max_position, h)),
            "token_type": _trunc_normal(keys[2], (config.type_vocab_size, h)),
            "ln_scale": jnp.ones((h,), jnp.float32),
            "ln_bias": jnp.zeros((h,), jnp.float32),
        },
        "layers": {
            "q_w": _trunc_normal(keys[3], (layers, h, h)),
            "q_b": jnp.zeros((layers, h), jnp.float32),
            "k_w": _trunc_normal(keys[4], (layers, h, h)),
            "k_b": jnp.zeros((layers, h), jnp.float32),
            "v_w": _trunc_normal(keys[5], (layers, h, h)),
            "v_b": jnp.zeros((layers, h), jnp.float32),
            "o_w": _trunc_normal(keys[6], (layers, h, h)),
            "o_b": jnp.zeros((layers, h), jnp.float32),
            "attn_ln_scale": jnp.ones((layers, h), jnp.float32),
            "attn_ln_bias": jnp.zeros((layers, h), jnp.float32),
            "ffn_w1": _trunc_normal(keys[7], (layers, h, inter)),
            "ffn_b1": jnp.zeros((layers, inter), jnp.float32),
            "ffn_w2": _trunc_normal(keys[8], (layers, inter, h)),
            "ffn_b2": jnp.zeros((layers, h), jnp.float32),
            "ffn_ln_scale": jnp.ones((layers, h), jnp.float32),
            "ffn_ln_bias": jnp.zeros((layers, h), jnp.float32),
        },
    }


def _layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float) -> jax.Array:
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    normed = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return normed * scale + bias


def _dropout(x: jax.Array, rate: float, key: jax.Array | None) -> jax.Array:
    if key is None or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def _encoder_layer(
    x: jax.Array,
    layer: Params,
    mask: jax.Array,
    config: TowerConfig,
    dropout_key: jax.Array | None,
    model_axis: str | None = None,
) -> jax.Array:
    """One post-LN BERT block. x: [B, S, H] (compute dtype).

    ``model_axis`` marks a shard_map tensor-parallel forward: the layer
    params are LOCAL Megatron shards (QKV/w1 column-parallel, O/w2
    row-parallel; see parallel/shardings.py) and the block inserts the
    tp_enter/tp_exit region markers so activations stay replicated and
    gradients come out correct (parallel/tp.py). Hidden activations and all
    layernorms remain full-width — only the head and FFN inner dimensions
    are split.
    """
    b, s, h = x.shape
    hd = config.head_dim
    cdt = x.dtype
    # Head count from the local shard width: num_heads/tp inside a TP region.
    nh = layer["q_w"].shape[-1] // hd

    if model_axis is not None:
        from instacart_next_order_recommendation_tpu.parallel.tp import tp_enter, tp_exit

        x_in = tp_enter(x, model_axis)
    else:
        x_in = x

    def proj(w, bias):
        return (x_in @ w.astype(cdt) + bias.astype(cdt)).reshape(b, s, nh, hd).transpose(0, 2, 1, 3)

    q = proj(layer["q_w"], layer["q_b"])
    k = proj(layer["k_w"], layer["k_b"])
    v = proj(layer["v_w"], layer["v_b"])

    attn = multi_head_attention(
        q, k, v, mask, scale=1.0 / (hd**0.5), training=dropout_key is not None
    )
    attn = attn.transpose(0, 2, 1, 3).reshape(b, s, nh * hd)
    attn = attn @ layer["o_w"].astype(cdt)
    if model_axis is not None:
        attn = tp_exit(attn, model_axis)
    attn = attn + layer["o_b"].astype(cdt)

    k1 = k2 = None
    if dropout_key is not None:
        k1, k2 = jax.random.split(dropout_key)
    attn = _dropout(attn, config.hidden_dropout, k1)
    x = _layer_norm(x + attn, layer["attn_ln_scale"], layer["attn_ln_bias"], config.layer_norm_eps).astype(cdt)

    ffn_in = tp_enter(x, model_axis) if model_axis is not None else x
    ffn = ffn_in @ layer["ffn_w1"].astype(cdt) + layer["ffn_b1"].astype(cdt)
    ffn = jax.nn.gelu(ffn.astype(jnp.float32), approximate=False).astype(cdt)
    ffn = ffn @ layer["ffn_w2"].astype(cdt)
    if model_axis is not None:
        ffn = tp_exit(ffn, model_axis)
    ffn = ffn + layer["ffn_b2"].astype(cdt)
    ffn = _dropout(ffn, config.hidden_dropout, k2)
    x = _layer_norm(x + ffn, layer["ffn_ln_scale"], layer["ffn_ln_bias"], config.layer_norm_eps).astype(cdt)
    return x


def encode(
    params: Params,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    config: TowerConfig,
    dropout_key: jax.Array | None = None,
    model_axis: str | None = None,
) -> jax.Array:
    """Tower forward: token ids -> unit-norm sentence embedding [B, hidden].

    ``dropout_key=None`` runs deterministically (eval/serve); a key enables
    BERT-style hidden dropout for training. ``model_axis`` runs the layers
    against local tensor-parallel param shards inside shard_map (the dropout
    key must then be identical across the model axis — fold in only the data
    axis index).
    """
    cdt = jnp.dtype(config.compute_dtype)
    b, s = input_ids.shape
    if s > config.max_position:
        # XLA clamps out-of-bounds gathers silently; fail loudly instead of
        # encoding every position past the table with its last row.
        raise ValueError(
            f"sequence length {s} exceeds the position table ({config.max_position})"
        )

    emb = params["embeddings"]
    x = (
        emb["word"][input_ids]
        + emb["position"][jnp.arange(s)][None, :, :]
        + emb["token_type"][jnp.zeros((b, s), jnp.int32)]
    )
    x = _layer_norm(x, emb["ln_scale"], emb["ln_bias"], config.layer_norm_eps)
    if dropout_key is not None:
        dropout_key, ek = jax.random.split(dropout_key)
        x = _dropout(x, config.hidden_dropout, ek)
    x = x.astype(cdt)

    if dropout_key is not None:
        layer_keys = jax.random.split(dropout_key, config.num_layers)
    else:
        layer_keys = None

    # Fused whole-layer Pallas kernel (ops/fused_layer.py) — packed
    # [B, S, hidden] activations, no per-head HBM tensors; ~3x the unfused
    # tower forward on v5e at MiniLM shapes. Inference runs the raw kernel;
    # training runs it under a custom_vjp whose backward recomputes through a
    # jnp oracle with the SAME dropout masks (flash-style recompute).
    use_fused = (
        model_axis is None
        and _fused_layer_enabled()
        and fused_layer_supports(config.hidden_size, config.num_heads, s)
    )

    def body(carry, scanned):
        if layer_keys is None:
            layer = scanned
            key = None
        else:
            layer, key = scanned
        if use_fused:
            from instacart_next_order_recommendation_tpu.ops import fused_encoder_layer
            from instacart_next_order_recommendation_tpu.ops.fused_layer import (
                fused_encoder_layer_train,
            )

            kwargs = dict(
                num_heads=config.num_heads,
                scale=1.0 / (config.head_dim**0.5),
                eps=config.layer_norm_eps,
            )
            if key is None:
                out = fused_encoder_layer(carry, attention_mask, layer, **kwargs)
            else:
                out = fused_encoder_layer_train(
                    carry,
                    attention_mask,
                    layer,
                    dropout_key=key,
                    dropout_rate=config.hidden_dropout,
                    **kwargs,
                )
            return out, None
        return _encoder_layer(carry, layer, attention_mask, config, key, model_axis), None

    if config.remat:
        body = jax.checkpoint(body)
    scanned_inputs = params["layers"] if layer_keys is None else (params["layers"], layer_keys)
    x, _ = jax.lax.scan(body, x, scanned_inputs)

    return masked_mean_pool_l2norm(x, attention_mask)
