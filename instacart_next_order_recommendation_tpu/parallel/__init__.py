"""Device-mesh bootstrap and collective helpers."""

from instacart_next_order_recommendation_tpu.parallel.mesh import (
    MeshConfig,
    build_mesh,
    data_sharding,
    replicated_sharding,
)
from instacart_next_order_recommendation_tpu.parallel.shardings import (
    param_shardings,
    param_specs,
)

__all__ = [
    "MeshConfig",
    "build_mesh",
    "data_sharding",
    "replicated_sharding",
    "param_shardings",
    "param_specs",
]
