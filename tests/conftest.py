"""Test configuration: force an 8-device virtual CPU mesh before JAX import.

Tests exercise the multi-chip sharding paths on virtual CPU devices (the
driver dry-runs the real multi-chip path separately); benchmarks run on real
TPU hardware via bench.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "collective_call_terminate_timeout" not in _flags:
    # 8 virtual devices time-slice this box's CPU cores, so a device can reach
    # a collective well after the first arrival and trip the in-process
    # watchdog (xla::internal::AwaitAndLogIfStuck -> SIGABRT).  Heavy
    # pipelines no longer shard on the CPU backend (parallel/atlas.py
    # sharding_enabled), so only small dedicated shard tests rendezvous here;
    # give them generous-but-bounded timeouts.
    _flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
               " --xla_cpu_collective_call_terminate_timeout_seconds=900")
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

# this image's jax defaults to the 'axon' TPU-tunnel platform regardless of
# JAX_PLATFORMS; force the virtual-device CPU backend for tests explicitly
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# persistent compile cache: XLA:CPU compiles (3D convs especially) dominate
# suite wall-clock on this box, and the CLI tests spawn subprocesses that
# would otherwise recompile everything from scratch.  min_compile_time 0
# caches even sub-0.5s programs — hundreds of them add up (see bench.py).
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_test_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_cpu_devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs
