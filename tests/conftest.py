"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so data-parallel sharding,
psum reductions and halo exchange are exercised without TPU hardware —
the standard JAX substitute for a fake multi-device backend.  Must be
set before jax initialises its backends.
"""

import os

# Force CPU even when a TPU platform (axon) is configured in the parent
# environment: the sharding tests need 8 virtual devices.  Real-TPU
# execution is covered by tests/test_tpu_smoke.py in a subprocess.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: repeat test runs skip XLA recompiles.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# The axon TPU plugin overrides JAX_PLATFORMS at import time, so the env
# var alone is not enough — force the platform through the config API.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
