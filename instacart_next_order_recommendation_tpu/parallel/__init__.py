"""Device-mesh bootstrap and collective helpers."""

from instacart_next_order_recommendation_tpu.parallel.mesh import (
    MeshConfig,
    build_mesh,
    data_sharding,
    replicated_sharding,
)
from instacart_next_order_recommendation_tpu.parallel.shardings import (
    opt_state_specs,
    param_shardings,
    param_specs,
)
from instacart_next_order_recommendation_tpu.parallel.tp import tp_enter, tp_exit

__all__ = [
    "MeshConfig",
    "build_mesh",
    "data_sharding",
    "replicated_sharding",
    "opt_state_specs",
    "param_shardings",
    "param_specs",
    "tp_enter",
    "tp_exit",
]
