"""Test configuration.

In this image the axon TPU plugin force-registers itself (JAX_PLATFORMS is
pinned to 'axon' via /root/.axon_site), so tests run on the real TPU chip.
Matmul precision is forced to f32 ('highest') so numeric parity tolerances
against the torch reference hold; production paths use the default bf16
MXU precision. Multi-device sharding is tested in a subprocess with a
cleared PYTHONPATH (see test_multichip.py), which yields an 8-virtual-CPU
mesh.
"""

import os
import sys

import numpy as np
import pytest

# persistent XLA compilation cache — test graphs are large; caching makes
# reruns fast
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_matmul_precision", "highest")

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
