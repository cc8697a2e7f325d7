"""Test configuration: run JAX on a virtual 8-device CPU mesh.

This environment's site hook pins JAX_PLATFORMS to the TPU plugin, so env vars
alone don't switch the backend — the config updates below must run before the
first backend use (pytest imports conftest before collecting test modules).
"""

import os
import tempfile

os.environ.setdefault("ITOR_NUM_CPU_DEVICES", "8")
# Hermetic XLA compilation cache: $HOME may be a persistent volume mounted on
# rotating hosts, and stale XLA:CPU AOT entries compiled on a different CPU
# model mis-execute (observed as numerical drift in sharding-equivalence
# tests). Point the cache at a per-run tmp dir so tests never read old entries.
os.environ["ITOR_COMPILATION_CACHE"] = tempfile.mkdtemp(prefix="itor_xla_test_")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", int(os.environ["ITOR_NUM_CPU_DEVICES"]))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng() -> np.random.Generator:
    return np.random.default_rng(42)
