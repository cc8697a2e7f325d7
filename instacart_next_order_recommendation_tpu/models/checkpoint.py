"""Tower checkpoint IO: params (msgpack) + model_config.json + vocab.

A saved tower directory is the TPU-native analog of the reference's
``final/`` SentenceTransformer folder
(/root/reference/src/training/train_sbert.py:139-142): it contains everything
the serve path needs — architecture config, parameters, and tokenizer vocab.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np
from flax import serialization

from instacart_next_order_recommendation_tpu.constants import (
    MODEL_CONFIG_FILENAME,
    PARAMS_FILENAME,
)
from instacart_next_order_recommendation_tpu.models.encoder import Params, TowerConfig
from instacart_next_order_recommendation_tpu.tokenizer import WordPieceTokenizer


def save_tower(
    model_dir: Path | str,
    params: Params,
    config: TowerConfig,
    tokenizer: WordPieceTokenizer | None = None,
) -> None:
    model_dir = Path(model_dir)
    model_dir.mkdir(parents=True, exist_ok=True)
    host_params = jax.tree.map(np.asarray, params)
    (model_dir / PARAMS_FILENAME).write_bytes(serialization.to_bytes(host_params))
    (model_dir / MODEL_CONFIG_FILENAME).write_text(json.dumps(config.to_dict(), indent=2))
    if tokenizer is not None:
        tokenizer.save(model_dir)


def load_tower(
    model_dir: Path | str,
) -> tuple[Params, TowerConfig, WordPieceTokenizer | None]:
    """Load a tower checkpoint.

    Falls back to the HF-format loader (models/hf_loader.py) when the
    directory looks like a Hugging Face BERT/MiniLM checkpoint, so pretrained
    ``all-MiniLM-L6-v2`` folders load directly for the warm start the
    reference relies on.
    """
    model_dir = Path(model_dir)
    cfg_path = model_dir / MODEL_CONFIG_FILENAME
    if not cfg_path.exists():
        if (model_dir / "config.json").exists():
            from instacart_next_order_recommendation_tpu.models.hf_loader import load_hf_tower

            return load_hf_tower(model_dir)
        raise FileNotFoundError(f"No {MODEL_CONFIG_FILENAME} or config.json in {model_dir}")

    config = TowerConfig.from_dict(json.loads(cfg_path.read_text()))
    import jax.numpy as jnp

    from instacart_next_order_recommendation_tpu.models.encoder import init_params

    template = jax.eval_shape(lambda: init_params(config, jax.random.key(0)))
    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), template)
    params = serialization.from_bytes(template, (model_dir / PARAMS_FILENAME).read_bytes())
    params = jax.tree.map(jnp.asarray, params)

    tokenizer = None
    if (model_dir / "vocab.txt").exists():
        tokenizer = WordPieceTokenizer.load(model_dir)
    return params, config, tokenizer
