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
# persistent compilation cache: repeat suite runs skip recompiles (the
# 1-core host pays ~10-100 s per big XLA program otherwise)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/aide_jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
