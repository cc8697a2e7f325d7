"""Mesh bootstrap: one global ``jax.sharding.Mesh`` with ``data`` and ``model`` axes.

The reference has no explicit parallelism (training is single-process; the only
multi-device awareness is a device count feeding warmup math,
/root/reference/src/training/train_sbert.py:213-217). The TPU-native design is
explicit: a 2-D logical mesh where

- the ``data`` axis carries data parallelism, cross-device in-batch negatives
  (all-gather), and the row-sharded catalog index;
- the ``model`` axis is available for tensor parallelism of the FFN / embedding
  table on larger towers (MiniLM-class towers replicate over it).

All sharding is expressed via ``NamedSharding``/``PartitionSpec`` so XLA emits
the collectives (psum / all_gather) over ICI — no hand-written comm code in the
training path.
"""

from __future__ import annotations

import dataclasses
import logging
import os

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Logical mesh shape. ``data_parallel=None`` means "use all devices"."""

    data_parallel: int | None = None
    model_parallel: int = 1


def maybe_initialize_distributed() -> None:
    """Initialize jax.distributed for multi-host runs when coordinator env is set.

    Single-host runs (including this repo's tests and benches) skip it.

    On TPU pods / Slurm / Open MPI, ``JAX_COORDINATOR_ADDRESS`` alone is
    enough (jax auto-detects process count/id). On bare multi-process
    launches (scripts/launch_multihost.py's localhost CPU mesh, or a
    hand-rolled pod bootstrap) there is nothing to auto-detect, so
    ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID`` are honored explicitly.

    Gate on env/client state ONLY — calling any device-touching jax API
    (e.g. ``jax.process_count()``) here would initialize the XLA backend
    first, after which ``jax.distributed.initialize`` always raises and
    every host would silently train as an independent single-process run.
    """
    if not os.getenv("JAX_COORDINATOR_ADDRESS"):
        return
    if jax.distributed.is_initialized():
        return  # already initialized (idempotent across trainer/evaluator)
    num_processes = os.getenv("JAX_NUM_PROCESSES")
    process_id = os.getenv("JAX_PROCESS_ID")
    try:
        jax.distributed.initialize(
            num_processes=int(num_processes) if num_processes else None,
            process_id=int(process_id) if process_id else None,
        )
    except Exception as exc:
        # Fail LOUDLY: the coordinator env was set, so the operator asked
        # for a multi-process run. Degrading to single-process here would
        # make every host believe it is process 0 — on a shared filesystem
        # they would then all pass the trainer's process-0 write gate and
        # corrupt one output tree, and the "distributed" job would silently
        # train N independent models.
        raise RuntimeError(
            "JAX_COORDINATOR_ADDRESS is set but jax.distributed.initialize "
            "failed (check JAX_NUM_PROCESSES / JAX_PROCESS_ID on "
            "non-autodetected launches)"
        ) from exc


def build_mesh(config: MeshConfig | None = None) -> Mesh:
    """Build the global device mesh, degrading gracefully to a single chip.

    With ``data_parallel=None`` the data axis absorbs every device not used by
    the model axis, so the same code runs on 1 chip, 1 host, or a pod slice.
    """
    config = config or MeshConfig()
    n_devices = jax.device_count()
    mp = max(1, config.model_parallel)
    if n_devices % mp != 0:
        raise ValueError(f"model_parallel={mp} does not divide device count {n_devices}")
    dp = config.data_parallel if config.data_parallel is not None else n_devices // mp
    if dp * mp > n_devices:
        raise ValueError(
            f"mesh shape ({dp}, {mp}) needs {dp * mp} devices, have {n_devices}"
        )
    devices = mesh_utils.create_device_mesh((dp, mp), devices=jax.devices()[: dp * mp])
    return Mesh(devices, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, *trailing_axes: str | None) -> NamedSharding:
    """Sharding with the leading axis over ``data`` and given trailing axes."""
    return NamedSharding(mesh, P(DATA_AXIS, *trailing_axes))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (used for MiniLM-class tower params)."""
    return NamedSharding(mesh, P())


def shard_batch_spec() -> P:
    """PartitionSpec for [batch, ...] arrays: shard batch over the data axis."""
    return P(DATA_AXIS)


def pad_to_multiple(n: int, multiple: int) -> int:
    """Round ``n`` up to a multiple (for even sharding of batches/catalogs)."""
    return int(np.ceil(n / multiple) * multiple)
