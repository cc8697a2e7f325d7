"""Tower tests: shapes, determinism, mask invariance, checkpoint IO, and
numerics parity against the real HF BERT implementation (transformers is in
the image; used here only as a test oracle)."""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instacart_next_order_recommendation_tpu.models import (
    TowerConfig,
    encode,
    init_params,
    load_tower,
    save_tower,
)
from instacart_next_order_recommendation_tpu.tokenizer import WordPieceTokenizer

TINY = TowerConfig(
    vocab_size=128,
    hidden_size=32,
    num_layers=2,
    num_heads=4,
    intermediate_size=64,
    max_position=64,
    compute_dtype="float32",
    hidden_dropout=0.1,
)


@pytest.fixture(scope="module")
def tiny_params():
    return init_params(TINY, jax.random.key(0))


def _batch(rng, b=4, s=16, vocab=128):
    ids = rng.integers(4, vocab, size=(b, s)).astype(np.int32)
    lengths = rng.integers(2, s + 1, size=b)
    mask = (np.arange(s)[None, :] < lengths[:, None]).astype(np.int32)
    ids = np.where(mask, ids, 0)
    return jnp.asarray(ids), jnp.asarray(mask)


def test_output_shape_and_unit_norm(tiny_params, rng):
    ids, mask = _batch(rng)
    out = encode(tiny_params, ids, mask, TINY)
    assert out.shape == (4, TINY.hidden_size)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=1), 1.0, atol=1e-5)


def test_deterministic_without_dropout(tiny_params, rng):
    ids, mask = _batch(rng)
    a = encode(tiny_params, ids, mask, TINY)
    b = encode(tiny_params, ids, mask, TINY)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dropout_changes_output(tiny_params, rng):
    ids, mask = _batch(rng)
    a = encode(tiny_params, ids, mask, TINY, dropout_key=jax.random.key(1))
    b = encode(tiny_params, ids, mask, TINY, dropout_key=jax.random.key(2))
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_padding_invariance(tiny_params, rng):
    # The same text padded to different static lengths must embed identically.
    ids, _ = _batch(rng, b=2, s=8)
    mask = jnp.ones((2, 8), jnp.int32)
    out8 = encode(tiny_params, ids, mask, TINY)
    ids16 = jnp.pad(ids, ((0, 0), (0, 8)))
    mask16 = jnp.pad(mask, ((0, 0), (0, 8)))
    out16 = encode(tiny_params, ids16, mask16, TINY)
    np.testing.assert_allclose(np.asarray(out8), np.asarray(out16), atol=1e-5)


def test_gradients_nonzero_everywhere(tiny_params, rng):
    ids, mask = _batch(rng)

    def loss(p):
        return jnp.sum(encode(p, ids, mask, TINY) ** 2)

    grads = jax.grad(loss)(tiny_params)
    flat = jax.tree.leaves(jax.tree.map(lambda g: float(jnp.abs(g).sum()), grads))
    # position table rows beyond seq len have zero grad; all weight matrices must train
    n_zero = sum(1 for g in flat if g == 0.0)
    assert n_zero == 0, f"{n_zero} param tensors have zero gradient"


def test_checkpoint_roundtrip(tiny_params, tmp_path, rng):
    tok = WordPieceTokenizer.train(["organic milk bread"], vocab_size=200, min_frequency=1)
    save_tower(tmp_path, tiny_params, TINY, tok)
    params2, cfg2, tok2 = load_tower(tmp_path)
    assert cfg2 == TINY
    assert tok2 is not None and tok2.vocab == tok.vocab
    ids, mask = _batch(rng)
    np.testing.assert_allclose(
        np.asarray(encode(tiny_params, ids, mask, TINY)),
        np.asarray(encode(params2, ids, mask, cfg2)),
        atol=1e-6,
    )


def test_parity_with_hf_bert(tmp_path, rng):
    """Our tower must reproduce transformers' BertModel + ST mean-pool + norm."""
    torch = pytest.importorskip("torch")
    from transformers import BertConfig, BertModel

    hf_cfg = BertConfig(
        vocab_size=100,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=64,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf_model = BertModel(hf_cfg).eval()
    model_dir = tmp_path / "hf"
    model_dir.mkdir()
    (model_dir / "config.json").write_text(hf_cfg.to_json_string())
    torch.save(hf_model.state_dict(), model_dir / "pytorch_model.bin")

    params, cfg, _ = load_tower(model_dir)
    cfg = dataclasses.replace(cfg, compute_dtype="float32")

    ids_np = rng.integers(1, 100, size=(3, 12)).astype(np.int64)
    lengths = np.array([12, 7, 4])
    mask_np = (np.arange(12)[None, :] < lengths[:, None]).astype(np.int64)

    with torch.no_grad():
        hf_out = hf_model(
            input_ids=torch.tensor(ids_np), attention_mask=torch.tensor(mask_np)
        ).last_hidden_state.numpy()
    m = mask_np[..., None].astype(np.float32)
    pooled = (hf_out * m).sum(1) / np.maximum(m.sum(1), 1e-9)
    expected = pooled / np.maximum(np.linalg.norm(pooled, axis=1, keepdims=True), 1e-12)

    ours = encode(
        params, jnp.asarray(ids_np, jnp.int32), jnp.asarray(mask_np, jnp.int32), cfg
    )
    np.testing.assert_allclose(np.asarray(ours), expected, atol=2e-5)


@pytest.mark.parametrize("prefix", ["", "bert.", "0.auto_model."])
def test_hf_loader_handles_prefixes(tmp_path, rng, prefix):
    """sentence-transformers checkpoints wrap BERT weights under module
    prefixes; the loader must resolve all observed variants."""
    torch = pytest.importorskip("torch")
    from transformers import BertConfig, BertModel

    from instacart_next_order_recommendation_tpu.models.hf_loader import load_hf_tower

    hf_cfg = BertConfig(
        vocab_size=50,
        hidden_size=16,
        num_hidden_layers=1,
        num_attention_heads=2,
        intermediate_size=32,
        max_position_embeddings=32,
    )
    torch.manual_seed(0)
    model = BertModel(hf_cfg)
    sd = {prefix + k: v for k, v in model.state_dict().items()}
    model_dir = tmp_path / f"hf_{prefix.strip('.') or 'bare'}"
    model_dir.mkdir()
    (model_dir / "config.json").write_text(hf_cfg.to_json_string())
    torch.save(sd, model_dir / "pytorch_model.bin")

    params, cfg, _ = load_hf_tower(model_dir)
    assert cfg.hidden_size == 16
    assert params["embeddings"]["word"].shape == (50, 16)
    assert params["layers"]["ffn_w1"].shape == (1, 16, 32)


def test_seq_beyond_position_table_raises(tiny_params, rng):
    """XLA clamps OOB gathers silently; encode must fail loudly instead."""
    s = TINY.max_position + 16
    ids = jnp.asarray(rng.integers(4, TINY.vocab_size, size=(2, s)), jnp.int32)
    mask = jnp.ones((2, s), jnp.int32)
    with pytest.raises(ValueError, match="position table"):
        encode(tiny_params, ids, mask, TINY)
