"""Test configuration: run the whole suite on a virtual 8-device CPU mesh.

JAX programs are backend-portable; everything tested here compiles and runs
identically on TPU. Sharding tests need multiple devices, so we force the
host platform to expose 8 virtual CPU devices.

Note: this environment's sitecustomize imports jax and registers a TPU
plugin at interpreter startup and pins JAX_PLATFORMS, so env-var overrides
are ineffective — we must use jax.config.update. XLA_FLAGS is still read
lazily at first backend initialization, so setting it here (before any
jax.devices() call) works.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
