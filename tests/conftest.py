"""Test configuration: run JAX on a virtual 8-device CPU mesh.

This environment's site hook pins JAX_PLATFORMS to the TPU plugin, so env vars
alone don't switch the backend — the config updates below must run before the
first backend use (pytest imports conftest before collecting test modules).
"""

import os

os.environ.setdefault("ITOR_NUM_CPU_DEVICES", "8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", int(os.environ["ITOR_NUM_CPU_DEVICES"]))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng() -> np.random.Generator:
    return np.random.default_rng(42)
