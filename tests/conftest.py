"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Must set the XLA flags before jax initializes (hence top of conftest)."""

import os

# Force-assign (not setdefault): the machine profile's sitecustomize pins
# JAX_PLATFORMS to the TPU plugin at interpreter start; tests must run on the
# virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
