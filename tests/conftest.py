"""Test configuration: force an 8-device virtual CPU mesh before JAX import.

Tests exercise the multi-chip sharding paths on virtual CPU devices (the
driver dry-runs the real multi-chip path separately); benchmarks run on real
TPU hardware via bench.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# this image's jax defaults to the 'axon' TPU-tunnel platform regardless of
# JAX_PLATFORMS; force the virtual-device CPU backend for tests explicitly
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_cpu_devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs
