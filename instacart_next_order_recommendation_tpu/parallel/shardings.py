"""Parameter sharding rules for the tower over the (data, model) mesh.

MiniLM-class towers replicate (22M params — replication is faster than the
collectives TP would add). Larger towers (mpnet-base-class and up) can shard
over the ``model`` axis with the standard Megatron layout:

- attention QKV projections column-parallel (heads split across devices),
  output projection row-parallel;
- FFN w1 column-parallel, w2 row-parallel;
- embedding tables replicated (the gather is cheap relative to an all-gather
  of the hidden states at these sizes).

Under ``jax.jit`` the rules are plain ``NamedSharding`` annotations on the
param pytree — XLA inserts the (all-reduce) collectives on the row-parallel
matmul outputs automatically.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from instacart_next_order_recommendation_tpu.models.encoder import Params, TowerConfig
from instacart_next_order_recommendation_tpu.parallel.mesh import MODEL_AXIS

# PartitionSpecs per stacked-layer param (leading axis = layer).
_TP_LAYER_SPECS = {
    "q_w": P(None, None, MODEL_AXIS),
    "q_b": P(None, MODEL_AXIS),
    "k_w": P(None, None, MODEL_AXIS),
    "k_b": P(None, MODEL_AXIS),
    "v_w": P(None, None, MODEL_AXIS),
    "v_b": P(None, MODEL_AXIS),
    "o_w": P(None, MODEL_AXIS, None),
    "o_b": P(),
    "attn_ln_scale": P(),
    "attn_ln_bias": P(),
    "ffn_w1": P(None, None, MODEL_AXIS),
    "ffn_b1": P(None, MODEL_AXIS),
    "ffn_w2": P(None, MODEL_AXIS, None),
    "ffn_b2": P(),
    "ffn_ln_scale": P(),
    "ffn_ln_bias": P(),
}


def param_specs(config: TowerConfig, tensor_parallel: bool) -> Params:
    """PartitionSpec pytree matching the param tree layout."""
    if not tensor_parallel:
        rep = P()
        return {
            "embeddings": {k: rep for k in ("word", "position", "token_type", "ln_scale", "ln_bias")},
            "layers": {k: rep for k in _TP_LAYER_SPECS},
        }
    return {
        "embeddings": {
            k: P() for k in ("word", "position", "token_type", "ln_scale", "ln_bias")
        },
        "layers": dict(_TP_LAYER_SPECS),
    }


def _path_key(entry) -> str | None:
    for attr in ("key", "name", "idx"):
        if hasattr(entry, attr):
            return str(getattr(entry, attr))
    return None


def opt_state_specs(opt_state_shapes, param_spec_tree: Params):
    """PartitionSpec pytree for an optax state, shaped like the state itself.

    Optimizer moments (adam mu/nu, MultiSteps accumulators, ...) mirror the
    param tree, so each state leaf whose trailing key path matches a param
    path inherits that param's spec; everything else (step counts, empty
    states) replicates. Used to pass the optimizer state through shard_map
    with the same layout as the tensor-parallel params.

    Args:
        opt_state_shapes: ``jax.eval_shape(tx.init, params)`` result (or the
            state itself — only the tree structure is used).
        param_spec_tree: PartitionSpec pytree from :func:`param_specs`.
    """
    import jax.tree_util as jtu

    param_leaves = jtu.tree_flatten_with_path(
        param_spec_tree, is_leaf=lambda x: isinstance(x, P)
    )[0]
    by_path = {
        tuple(_path_key(e) for e in path): spec for path, spec in param_leaves
    }
    max_depth = max((len(p) for p in by_path), default=0)

    def leaf_spec(path, _leaf):
        keys = tuple(_path_key(e) for e in path)
        for k in range(min(len(keys), max_depth), 0, -1):
            spec = by_path.get(keys[-k:])
            if spec is not None:
                return spec
        return P()

    flat, treedef = jtu.tree_flatten_with_path(opt_state_shapes)
    return jtu.tree_unflatten(treedef, [leaf_spec(p, l) for p, l in flat])


def param_shardings(mesh: Mesh, config: TowerConfig) -> Params:
    """NamedSharding pytree; TP engages when the mesh has a model axis > 1."""
    tp = mesh.shape[MODEL_AXIS] > 1
    if tp and config.intermediate_size % mesh.shape[MODEL_AXIS] != 0:
        raise ValueError(
            f"model_parallel={mesh.shape[MODEL_AXIS]} must divide "
            f"intermediate_size={config.intermediate_size}"
        )
    if tp and (config.hidden_size // config.num_heads) * (
        config.num_heads // mesh.shape[MODEL_AXIS]
    ) * mesh.shape[MODEL_AXIS] != config.hidden_size:
        raise ValueError("model_parallel must divide num_heads")
    specs = param_specs(config, tp)
    return jax.tree.map(lambda spec: NamedSharding(mesh, spec), specs,
                        is_leaf=lambda x: isinstance(x, P))
