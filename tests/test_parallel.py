"""Mesh/sharding tests: TP param specs and dp-vs-dpxtp numerical equivalence."""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from instacart_next_order_recommendation_tpu.models import (
    MINILM_L6,
    encode,
    init_params,
)
from instacart_next_order_recommendation_tpu.ops import mnrl_loss
from instacart_next_order_recommendation_tpu.parallel import (
    MeshConfig,
    build_mesh,
    param_shardings,
)

TINY = dataclasses.replace(
    MINILM_L6,
    vocab_size=256,
    hidden_size=64,
    num_layers=2,
    num_heads=4,
    intermediate_size=128,
    max_position=64,
    compute_dtype="float32",
)


def test_mesh_shapes():
    mesh = build_mesh(MeshConfig())
    assert mesh.shape == {"data": 8, "model": 1}
    mesh = build_mesh(MeshConfig(data_parallel=4, model_parallel=2))
    assert mesh.shape == {"data": 4, "model": 2}


def test_invalid_mesh_raises():
    with pytest.raises(ValueError):
        build_mesh(MeshConfig(model_parallel=3))  # does not divide 8... 3*? -> invalid


def test_param_shardings_tp_layout():
    mesh = build_mesh(MeshConfig(data_parallel=4, model_parallel=2))
    shardings = param_shardings(mesh, TINY)
    assert shardings["layers"]["ffn_w1"].spec == P(None, None, "model")
    assert shardings["layers"]["ffn_w2"].spec == P(None, "model", None)
    assert shardings["layers"]["q_w"].spec == P(None, None, "model")
    assert shardings["embeddings"]["word"].spec == P()
    # replicated mesh -> everything replicated
    mesh1 = build_mesh(MeshConfig(data_parallel=8, model_parallel=1))
    shardings1 = param_shardings(mesh1, TINY)
    assert shardings1["layers"]["ffn_w1"].spec == P()


def test_tp_must_divide():
    mesh = build_mesh(MeshConfig(data_parallel=1, model_parallel=8))
    bad = dataclasses.replace(TINY, intermediate_size=100)
    with pytest.raises(ValueError):
        param_shardings(mesh, bad)


def _loss_fn(params, batch, config):
    a_ids, a_mask, p_ids, p_mask = batch
    qa = encode(params, a_ids, a_mask, config)
    qp = encode(params, p_ids, p_mask, config)
    return mnrl_loss(qa, qp, scale=30.0)


def test_dp_vs_dp_tp_equivalence(rng):
    """The same forward/loss under dp8 and dp4xtp2 must agree numerically."""
    params = init_params(TINY, jax.random.key(0))
    b, s = 16, 16
    ids = jnp.asarray(rng.integers(5, 256, (b, s)), jnp.int32)
    mask = jnp.ones((b, s), jnp.int32)
    batch = (ids, mask, ids[::-1], mask)

    losses = []
    for dp, mp in ((8, 1), (4, 2)):
        mesh = build_mesh(MeshConfig(data_parallel=dp, model_parallel=mp))
        p_shard = param_shardings(mesh, TINY)
        dat = NamedSharding(mesh, P("data"))
        placed = jax.device_put(params, p_shard)
        placed_batch = tuple(jax.device_put(x, dat) for x in batch)
        fn = jax.jit(
            partial(_loss_fn, config=TINY),
            in_shardings=(p_shard, (dat,) * 4),
            out_shardings=NamedSharding(mesh, P()),
        )
        losses.append(float(fn(placed, placed_batch)))
    assert losses[0] == pytest.approx(losses[1], rel=1e-5)


def test_tp_grads_match_single_device(rng):
    """Gradients under dp4xtp2 match unsharded single-computation gradients."""
    params = init_params(TINY, jax.random.key(1))
    b, s = 8, 16
    ids = jnp.asarray(rng.integers(5, 256, (b, s)), jnp.int32)
    mask = jnp.ones((b, s), jnp.int32)
    batch = (ids, mask, jnp.flip(ids, 0), mask)

    ref_grads = jax.grad(partial(_loss_fn, batch=batch, config=TINY))(params)

    mesh = build_mesh(MeshConfig(data_parallel=4, model_parallel=2))
    p_shard = param_shardings(mesh, TINY)
    dat = NamedSharding(mesh, P("data"))
    placed = jax.device_put(params, p_shard)
    placed_batch = tuple(jax.device_put(x, dat) for x in batch)
    fn = jax.jit(
        lambda p, bt: jax.grad(partial(_loss_fn, batch=bt, config=TINY))(p),
        in_shardings=(p_shard, (dat,) * 4),
        out_shardings=p_shard,
    )
    tp_grads = fn(placed, placed_batch)
    flat_ref = jax.tree.leaves(ref_grads)
    flat_tp = jax.tree.leaves(tp_grads)
    for a, b_ in zip(flat_ref, flat_tp):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), atol=2e-4)


def test_encode_tp_shardmap_matches_plain(rng):
    """encode(model_axis=...) against local Megatron shards inside shard_map
    reproduces the plain replicated forward exactly."""
    from jax import shard_map

    from instacart_next_order_recommendation_tpu.parallel import param_specs

    params = init_params(TINY, jax.random.key(5))
    ids = jnp.asarray(rng.integers(5, 256, (8, 16)), jnp.int32)
    mask = (jnp.arange(16)[None, :] < 12).astype(jnp.int32) * jnp.ones((8, 1), jnp.int32)

    ref = encode(params, ids, mask, TINY)

    mesh = build_mesh(MeshConfig(data_parallel=2, model_parallel=4))
    p_specs = param_specs(TINY, tensor_parallel=True)

    def local_fwd(p, i, m):
        return encode(p, i, m, TINY, model_axis="model")

    fn = jax.jit(
        shard_map(
            local_fwd,
            mesh=mesh,
            in_specs=(p_specs, P("data"), P("data")),
            out_specs=P("data"),
            check_vma=False,
        )
    )
    placed = jax.device_put(params, param_shardings(mesh, TINY))
    out = fn(placed, ids, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_tp_region_grads(rng):
    """tp_enter/tp_exit gradients: a column->row parallel pair inside
    shard_map matches the unsharded matmul chain's gradients."""
    from jax import shard_map

    from instacart_next_order_recommendation_tpu.parallel import tp_enter, tp_exit

    mesh = build_mesh(MeshConfig(data_parallel=1, model_parallel=8))
    x = jnp.asarray(rng.normal(size=(4, 16)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(16, 32)), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(32, 16)), jnp.float32)

    def ref_loss(x, w1, w2):
        return jnp.sum(jnp.tanh(x @ w1) @ w2)

    ref_grads = jax.grad(ref_loss, argnums=(0, 1, 2))(x, w1, w2)

    def local_loss(x, w1, w2):
        y = tp_exit(jnp.tanh(tp_enter(x, "model") @ w1) @ w2, "model")
        return jnp.sum(y)

    fn = jax.jit(
        shard_map(
            lambda *a: jax.grad(local_loss, argnums=(0, 1, 2))(*a),
            mesh=mesh,
            in_specs=(P(), P(None, "model"), P("model", None)),
            out_specs=(P(), P(None, "model"), P("model", None)),
            check_vma=False,
        )
    )
    got = fn(x, w1, w2)
    for g_ref, g_tp in zip(ref_grads, got):
        # psum reduction order across the 8 virtual devices is not
        # deterministic on the CPU backend; tolerate f32 reassociation.
        np.testing.assert_allclose(
            np.asarray(g_tp), np.asarray(g_ref), rtol=2e-5, atol=1e-4
        )


def test_shardmap_tp_step_matches_gspmd_step(rng):
    """One optimizer step of the dp x tp shard_map path (Megatron TP against
    local shards) equals the GSPMD tp step."""
    import optax

    import instacart_next_order_recommendation_tpu.train.trainer as tm

    params = jax.tree.map(np.asarray, init_params(TINY, jax.random.key(7)))
    ids = jnp.asarray(rng.integers(5, 256, (16, 16)), jnp.int32)
    mask = jnp.ones((16, 16), jnp.int32)
    batch = (ids, mask, jnp.flip(ids, 0), mask)
    key = jax.random.key(0)

    results = {}
    for mode in ("shard_map", "gspmd"):
        cfg = tm.TrainConfig(
            {"model_parallel": 2, "learning_rate": 1e-3, "train_step_mode": mode}
        )
        trainer = tm.TwoTowerTrainer(cfg)
        tx = optax.adamw(1e-3)
        (got_mode, step), p_shard = trainer._make_train_step(
            dataclasses.replace(TINY, hidden_dropout=0.0), tx
        )
        assert got_mode == mode
        placed = jax.device_put(params, p_shard)
        opt_state = jax.jit(tx.init)(placed)
        new_params, _, loss = step(placed, opt_state, batch, key)
        results[mode] = (jax.tree.map(np.asarray, new_params), float(loss))

    assert results["shard_map"][1] == pytest.approx(results["gspmd"][1], rel=1e-5)
    for a, b in zip(
        jax.tree.leaves(results["shard_map"][0]), jax.tree.leaves(results["gspmd"][0])
    ):
        np.testing.assert_allclose(a, b, atol=4e-5)  # atol headroom: CPU FMA ordering varies across host models (2.2e-5 seen)


def test_train_step_mode_validated():
    import instacart_next_order_recommendation_tpu.train.trainer as tm

    with pytest.raises(ValueError, match="train_step_mode"):
        tm.TrainConfig({"train_step_mode": "shardmap"})


def test_opt_state_specs_layout():
    """Adam moments inherit the param partition specs; counts replicate."""
    import optax

    from instacart_next_order_recommendation_tpu.parallel import (
        opt_state_specs,
        param_specs,
    )

    params = init_params(TINY, jax.random.key(0))
    tx = optax.adamw(1e-3)
    specs = opt_state_specs(
        jax.eval_shape(tx.init, params), param_specs(TINY, tensor_parallel=True)
    )
    adam_state = specs[0]
    assert adam_state.mu["layers"]["ffn_w1"] == P(None, None, "model")
    assert adam_state.nu["layers"]["o_w"] == P(None, "model", None)
    assert adam_state.mu["embeddings"]["word"] == P()
    assert adam_state.count == P()


def test_shardmap_step_matches_gspmd_step(rng, monkeypatch):
    """One optimizer step via the shard_map path equals the GSPMD path."""
    import optax

    import instacart_next_order_recommendation_tpu.train.trainer as tm

    # Host copy: the train step donates its inputs, so each mode gets a
    # fresh device placement.
    params = jax.tree.map(np.asarray, init_params(TINY, jax.random.key(3)))
    ids = jnp.asarray(rng.integers(5, 256, (16, 16)), jnp.int32)
    mask = jnp.ones((16, 16), jnp.int32)
    batch = (ids, mask, jnp.flip(ids, 0), mask)
    key = jax.random.key(0)

    results = {}
    for mode, mp in (("shard_map", 1), ("gspmd", 2)):
        cfg = tm.TrainConfig({"model_parallel": mp, "learning_rate": 1e-3})
        trainer = tm.TwoTowerTrainer(cfg)
        tx = optax.adamw(1e-3)
        (got_mode, step), p_shard = trainer._make_train_step(
            dataclasses.replace(TINY, hidden_dropout=0.0), tx
        )
        assert got_mode == mode
        placed = jax.device_put(params, p_shard)
        opt_state = jax.jit(tx.init)(placed)
        new_params, _, loss = step(placed, opt_state, batch, key)
        results[mode] = (jax.tree.map(np.asarray, new_params), float(loss))

    assert results["shard_map"][1] == pytest.approx(results["gspmd"][1], rel=1e-5)
    for a, b in zip(
        jax.tree.leaves(results["shard_map"][0]), jax.tree.leaves(results["gspmd"][0])
    ):
        np.testing.assert_allclose(a, b, atol=4e-5)  # atol headroom: CPU FMA ordering varies across host models (2.2e-5 seen)
