"""Shared test fixtures: tiny towers and corpora."""

import json
from pathlib import Path

import jax

from instacart_next_order_recommendation_tpu.models import (
    TowerConfig,
    init_params,
    save_tower,
)
from instacart_next_order_recommendation_tpu.tokenizer import WordPieceTokenizer

TINY_TOWER = TowerConfig(
    vocab_size=0,  # replaced by tokenizer size at build time
    hidden_size=32,
    num_layers=2,
    num_heads=4,
    intermediate_size=64,
    max_position=64,
    compute_dtype="float32",
    max_seq_length=32,
)


def make_corpus(n: int = 30) -> dict[str, str]:
    nouns = ["Milk", "Bread", "Banana", "Cheese", "Rice", "Coffee"]
    return {
        str(i + 1): f"Product: Organic {nouns[i % len(nouns)]} {i}. Aisle: a{i % 5}. Department: d{i % 3}."
        for i in range(n)
    }


def make_tiny_model_dir(tmp_path: Path, corpus: dict[str, str], seed: int = 0) -> Path:
    """Build and save a tiny random tower + corpus-trained tokenizer."""
    import dataclasses

    tok = WordPieceTokenizer.train(corpus.values(), vocab_size=600, min_frequency=1)
    cfg = dataclasses.replace(TINY_TOWER, vocab_size=tok.vocab_size)
    params = init_params(cfg, jax.random.key(seed))
    model_dir = tmp_path / "model"
    save_tower(model_dir, params, cfg, tok)
    return model_dir


def write_corpus_json(tmp_path: Path, corpus: dict[str, str]) -> Path:
    corpus_path = tmp_path / "eval_corpus.json"
    corpus_path.write_text(json.dumps(corpus, indent=0))
    return corpus_path
