"""Build a full-shape all-MiniLM-L6-v2-ARCHITECTURE checkpoint for shape
rehearsals of the real-data runbook.

The reference's core scenario warm-starts from
``sentence-transformers/all-MiniLM-L6-v2``
(/root/reference/src/training/train_sbert.py:174-179). That checkpoint is
not downloadable in offline environments, so `make real-data` could never
be rehearsed at true shapes: vocab 30522, H=384, 6 layers, WordPiece over a
real-sized vocab, `models/hf_loader.py` consuming HF BERT naming. This
script writes a checkpoint with EXACTLY that architecture — config.json,
HF-BERT-named ``pytorch_model.bin``, 30522-line ``vocab.txt`` — with
randomly initialized weights (BERT init: N(0, 0.02), LN ones/zeros).

It rehearses every shape and code path of the warm start (state-dict
parsing, kernel transposes, tokenizer vocab ids, position table size); it
does NOT rehearse pretrained quality — quality parity still needs the real
weights (BASELINE.md).

    python scripts/make_rehearsal_checkpoint.py [--out models/all-MiniLM-L6-v2]
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_repo_root = str(_Path(__file__).resolve().parents[1])
if _repo_root not in _sys.path:
    _sys.path.insert(0, _repo_root)

import argparse
import json
from pathlib import Path

import numpy as np

# all-MiniLM-L6-v2's config.json (architecture fields only).
MINILM_CONFIG = {
    "architectures": ["BertModel"],
    "attention_probs_dropout_prob": 0.1,
    "hidden_act": "gelu",
    "hidden_dropout_prob": 0.1,
    "hidden_size": 384,
    "initializer_range": 0.02,
    "intermediate_size": 1536,
    "layer_norm_eps": 1e-12,
    "max_position_embeddings": 512,
    "model_type": "bert",
    "num_attention_heads": 12,
    "num_hidden_layers": 6,
    "pad_token_id": 0,
    "type_vocab_size": 2,
    "vocab_size": 30522,
}


def build_vocab(n: int = 30522, seed: int = 0) -> list[str]:
    """BERT-canonical vocab layout: [PAD], [unused0..98], [UNK]/[CLS]/
    [SEP]/[MASK] at ids 100-103, then real WordPiece entries trained on a
    long-names synthetic corpus (so rehearsal tokenization exercises real
    continuation pieces), padded to exactly ``n`` with [unusedN]."""
    from instacart_next_order_recommendation_tpu.data.synthetic import (
        _ADJECTIVES, _AISLES, _DEPARTMENTS, _NAME_EXTRAS, _NAME_MODIFIERS,
        _NAME_UNITS, _NOUNS,
    )
    from instacart_next_order_recommendation_tpu.tokenizer import WordPieceTokenizer

    rng = np.random.default_rng(seed)
    texts = []
    for _ in range(4000):
        name = (
            f"{rng.choice(_NAME_MODIFIERS)} {rng.choice(_ADJECTIVES)} "
            f"{rng.choice(_NOUNS)} {rng.choice(_NAME_EXTRAS)}, "
            f"{rng.choice(_NAME_UNITS)}"
        )
        texts.append(
            f"Product: {name}. Aisle: {rng.choice(_AISLES)}. "
            f"Department: {rng.choice(_DEPARTMENTS)}."
        )
    tok = WordPieceTokenizer.train(texts, vocab_size=8000, min_frequency=1)
    learned = [
        t for t, _ in sorted(tok.vocab.items(), key=lambda kv: kv[1])
        if not (t.startswith("[") and t.endswith("]"))
    ]

    vocab = ["[PAD]"]
    vocab += [f"[unused{i}]" for i in range(99)]
    vocab += ["[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    vocab += learned
    i = 99
    while len(vocab) < n:
        vocab.append(f"[unused{i}]")
        i += 1
    return vocab[:n]


def build_state_dict(cfg: dict, seed: int = 0) -> dict:
    import torch

    rng = np.random.default_rng(seed)
    H, I, L, V = (
        cfg["hidden_size"], cfg["intermediate_size"],
        cfg["num_hidden_layers"], cfg["vocab_size"],
    )

    def w(*shape):
        return torch.from_numpy(
            rng.normal(0.0, cfg["initializer_range"], shape).astype(np.float32)
        )

    def ones(*shape):
        return torch.ones(*shape)

    def zeros(*shape):
        return torch.zeros(*shape)

    sd = {
        "embeddings.word_embeddings.weight": w(V, H),
        "embeddings.position_embeddings.weight": w(cfg["max_position_embeddings"], H),
        "embeddings.token_type_embeddings.weight": w(cfg["type_vocab_size"], H),
        "embeddings.LayerNorm.weight": ones(H),
        "embeddings.LayerNorm.bias": zeros(H),
    }
    for i in range(L):
        p = f"encoder.layer.{i}."
        sd.update({
            # torch Linear layout: (out_features, in_features)
            p + "attention.self.query.weight": w(H, H),
            p + "attention.self.query.bias": zeros(H),
            p + "attention.self.key.weight": w(H, H),
            p + "attention.self.key.bias": zeros(H),
            p + "attention.self.value.weight": w(H, H),
            p + "attention.self.value.bias": zeros(H),
            p + "attention.output.dense.weight": w(H, H),
            p + "attention.output.dense.bias": zeros(H),
            p + "attention.output.LayerNorm.weight": ones(H),
            p + "attention.output.LayerNorm.bias": zeros(H),
            p + "intermediate.dense.weight": w(I, H),
            p + "intermediate.dense.bias": zeros(I),
            p + "output.dense.weight": w(H, I),
            p + "output.dense.bias": zeros(H),
            p + "output.LayerNorm.weight": ones(H),
            p + "output.LayerNorm.bias": zeros(H),
        })
    # Pooler ships in real BERT checkpoints; the loader ignores it, and its
    # presence rehearses "extra keys are tolerated".
    sd["pooler.dense.weight"] = w(H, H)
    sd["pooler.dense.bias"] = zeros(H)
    return sd


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--out", type=Path, default=Path("models/all-MiniLM-L6-v2"))
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import torch

    out = args.out
    out.mkdir(parents=True, exist_ok=True)
    (out / "config.json").write_text(json.dumps(MINILM_CONFIG, indent=2))
    vocab = build_vocab(MINILM_CONFIG["vocab_size"], args.seed)
    (out / "vocab.txt").write_text("\n".join(vocab) + "\n")
    (out / "tokenizer_config.json").write_text(
        json.dumps({"do_lower_case": True, "model_max_length": 256})
    )
    sd = build_state_dict(MINILM_CONFIG, args.seed)
    torch.save(sd, out / "pytorch_model.bin")
    (out / "REHEARSAL.md").write_text(
        "Random-weight all-MiniLM-L6-v2-architecture checkpoint built by\n"
        "scripts/make_rehearsal_checkpoint.py for full-shape rehearsals of\n"
        "the real-data runbook. Replace with the real\n"
        "sentence-transformers/all-MiniLM-L6-v2 download for quality runs.\n"
    )
    n_params = sum(int(np.prod(t.shape)) for t in sd.values())
    print(f"wrote {out} (vocab {len(vocab)}, {n_params/1e6:.1f}M params)")


if __name__ == "__main__":
    main()
