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
