"""Pallas crop kernel: bit-exactness vs the XLA gather path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from strive_tpu.maps import synthetic_map_store, get_map_crop
from strive_tpu.maps.crop_kernel import KERNEL_AVAILABLE, get_map_crop_kernel

pytestmark = pytest.mark.skipif(
    not KERNEL_AVAILABLE,
    reason="Mosaic dynamic-gather crashes this toolchain's compiler "
           "(see crop_kernel.py docstring / PERF.md)",
)


@pytest.fixture(scope="module")
def store():
    return synthetic_map_store(num_maps=2, size_px=2048, channels=4, seed=3)


def _compare(store, pos, mapix, bounds, L=256, W=256):
    ref = get_map_crop(store.raster, store.dx, pos, mapix, bounds, L=L, W=W,
                       packed=store.packed)
    got = get_map_crop_kernel(store.raster, store.dx, pos, mapix, bounds,
                              L=L, W=W, packed=store.packed)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_kernel_matches_xla_interior(store, rng):
    N = 8
    pos = jnp.asarray(np.concatenate([
        rng.uniform(150, 350, (N, 2)),
        np.stack([np.cos(h := rng.uniform(-np.pi, np.pi, N)),
                  np.sin(h)], -1),
    ], axis=1).astype(np.float32))
    mapix = jnp.asarray(rng.integers(0, 2, N).astype(np.int32))
    _compare(store, pos, mapix, (-17.0, -38.5, 60.0, 38.5))


def test_kernel_matches_xla_map_edges(store, rng):
    # agents near/off the map edges exercise the off-map -> pixel(0,0) path
    N = 8
    xy = np.array([[1.0, 1.0], [510.0, 510.0], [1.0, 510.0], [510.0, 1.0],
                   [-20.0, 50.0], [600.0, 50.0], [50.0, 600.0], [256.0, 2.0]])
    h = rng.uniform(-np.pi, np.pi, N)
    pos = jnp.asarray(np.concatenate(
        [xy, np.stack([np.cos(h), np.sin(h)], -1)], axis=1
    ).astype(np.float32))
    mapix = jnp.asarray(np.zeros(N, np.int32))
    _compare(store, pos, mapix, (-17.0, -38.5, 60.0, 38.5))


def test_kernel_in_jit_and_grad_context(store, rng):
    """The kernel is used under stop_gradient inside jitted losses."""
    N = 4
    pos = jnp.asarray(np.concatenate([
        rng.uniform(150, 350, (N, 2)),
        np.tile([1.0, 0.0], (N, 1)),
    ], axis=1).astype(np.float32))
    mapix = jnp.zeros(N, jnp.int32)

    @jax.jit
    def f(p):
        crop = get_map_crop_kernel(
            store.raster, store.dx, jax.lax.stop_gradient(p), mapix,
            (-17.0, -38.5, 60.0, 38.5), packed=store.packed)
        return jnp.sum(crop) + jnp.sum(p)

    g = jax.grad(f)(pos)
    np.testing.assert_allclose(np.asarray(g), 1.0)
