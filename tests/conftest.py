"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The env vars must be set before the first ``import jax`` anywhere in the test
process, so this conftest sets them at import time (pytest imports conftest
before collecting test modules).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
existing = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in existing:
    os.environ["XLA_FLAGS"] = (
        existing + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng() -> np.random.Generator:
    return np.random.default_rng(42)
