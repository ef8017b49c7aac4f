"""Test configuration: force an 8-virtual-device CPU mesh before jax import.

All sharding tests run on this virtual mesh; the real TPU is only used by
bench.py and the driver's compile checks.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

import numpy as np
import pytest

# persistent XLA compilation cache — test graphs are large and this host is
# single-core; caching makes reruns fast
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE_SRC = "/root/reference/src"


@pytest.fixture(scope="session")
def reference_src():
    """Path to the upstream reference for golden-parity tests; skip if absent."""
    if not os.path.isdir(REFERENCE_SRC):
        pytest.skip("reference source not available")
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)
    return REFERENCE_SRC


@pytest.fixture
def rng():
    return np.random.default_rng(0)
