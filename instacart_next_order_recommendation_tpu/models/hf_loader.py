"""Load Hugging Face BERT/MiniLM checkpoints into our param tree.

Parity requirement (SURVEY.md §7 hard parts): the reference fine-tunes
``sentence-transformers/all-MiniLM-L6-v2`` — the same warm start must load
into this tower. Supports ``model.safetensors`` and ``pytorch_model.bin``
(torch CPU is available in the image for deserialization only; no torch ops
run in the compute path).

HF BERT weight naming -> our stacked-layer tree; torch Linear stores
``weight`` as (out, in), so kernels are transposed to our (in, out) layout.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from instacart_next_order_recommendation_tpu.models.encoder import Params, TowerConfig
from instacart_next_order_recommendation_tpu.tokenizer import WordPieceTokenizer


def _load_state_dict(model_dir: Path) -> dict[str, np.ndarray]:
    st_path = model_dir / "model.safetensors"
    if st_path.exists():
        from safetensors.numpy import load_file

        return load_file(st_path)
    bin_path = model_dir / "pytorch_model.bin"
    if bin_path.exists():
        import torch

        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
        return {k: v.numpy() for k, v in sd.items()}
    raise FileNotFoundError(f"No model.safetensors or pytorch_model.bin in {model_dir}")


def load_hf_tower(model_dir: Path | str) -> tuple[Params, TowerConfig, WordPieceTokenizer | None]:
    """Load an HF BERT-encoder checkpoint directory (e.g. all-MiniLM-L6-v2)."""
    model_dir = Path(model_dir)
    hf_cfg = json.loads((model_dir / "config.json").read_text())
    config = TowerConfig(
        vocab_size=hf_cfg["vocab_size"],
        hidden_size=hf_cfg["hidden_size"],
        num_layers=hf_cfg["num_hidden_layers"],
        num_heads=hf_cfg["num_attention_heads"],
        intermediate_size=hf_cfg["intermediate_size"],
        max_position=hf_cfg["max_position_embeddings"],
        type_vocab_size=hf_cfg.get("type_vocab_size", 2),
        layer_norm_eps=hf_cfg.get("layer_norm_eps", 1e-12),
        hidden_dropout=hf_cfg.get("hidden_dropout_prob", 0.1),
    )

    sd = _load_state_dict(model_dir)
    # sentence-transformers checkpoints may prefix with "0." module wrappers.
    prefixes = ["", "bert.", "0.auto_model."]
    prefix = next(
        (p for p in prefixes if f"{p}embeddings.word_embeddings.weight" in sd), None
    )
    if prefix is None:
        raise KeyError(
            "Could not locate BERT embeddings in state dict; keys sample: "
            + ", ".join(list(sd.keys())[:5])
        )

    def get(name: str) -> np.ndarray:
        return np.asarray(sd[prefix + name], dtype=np.float32)

    params: Params = {
        "embeddings": {
            "word": get("embeddings.word_embeddings.weight"),
            "position": get("embeddings.position_embeddings.weight"),
            "token_type": get("embeddings.token_type_embeddings.weight"),
            "ln_scale": get("embeddings.LayerNorm.weight"),
            "ln_bias": get("embeddings.LayerNorm.bias"),
        },
        "layers": {},
    }

    def stack(fmt: str, transpose: bool = False) -> np.ndarray:
        arrs = []
        for i in range(config.num_layers):
            a = get(fmt.format(i))
            arrs.append(a.T if transpose else a)
        return np.stack(arrs)

    layer_map = {
        "q_w": ("encoder.layer.{}.attention.self.query.weight", True),
        "q_b": ("encoder.layer.{}.attention.self.query.bias", False),
        "k_w": ("encoder.layer.{}.attention.self.key.weight", True),
        "k_b": ("encoder.layer.{}.attention.self.key.bias", False),
        "v_w": ("encoder.layer.{}.attention.self.value.weight", True),
        "v_b": ("encoder.layer.{}.attention.self.value.bias", False),
        "o_w": ("encoder.layer.{}.attention.output.dense.weight", True),
        "o_b": ("encoder.layer.{}.attention.output.dense.bias", False),
        "attn_ln_scale": ("encoder.layer.{}.attention.output.LayerNorm.weight", False),
        "attn_ln_bias": ("encoder.layer.{}.attention.output.LayerNorm.bias", False),
        "ffn_w1": ("encoder.layer.{}.intermediate.dense.weight", True),
        "ffn_b1": ("encoder.layer.{}.intermediate.dense.bias", False),
        "ffn_w2": ("encoder.layer.{}.output.dense.weight", True),
        "ffn_b2": ("encoder.layer.{}.output.dense.bias", False),
        "ffn_ln_scale": ("encoder.layer.{}.output.LayerNorm.weight", False),
        "ffn_ln_bias": ("encoder.layer.{}.output.LayerNorm.bias", False),
    }
    for ours, (fmt, transpose) in layer_map.items():
        params["layers"][ours] = stack(fmt, transpose)

    params = {k: {kk: jnp.asarray(vv) for kk, vv in v.items()} for k, v in params.items()}

    tokenizer = None
    if (model_dir / "vocab.txt").exists():
        tokenizer = WordPieceTokenizer.load(model_dir)
    return params, config, tokenizer
