"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware (single chip) is reserved for bench.py; tests validate
numerics and multi-chip sharding on the CPU backend with 8 virtual devices.
The clean-environment re-exec lives in the repo-root conftest.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent compilation cache: the build host has a single CPU core; cache
# XLA compiles across pytest runs.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
