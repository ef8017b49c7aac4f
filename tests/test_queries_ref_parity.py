"""Golden parity for map crops and occupancy queries vs the reference torch
implementations (``nuscenes_utils.py:205-390``), run directly on random
rasters/poses.

- ``get_map_crop`` vs ``get_map_obs``: EXACT (same round + OOB->pixel(0,0) +
  NaN-pose semantics).
- ``check_on_layer`` / ``get_coll_point``: tolerance parity — we sample the
  car footprint on a static grid instead of the reference's batch-derived
  dynamic grid (PARITY.md structural deviation 2), so fractions/points agree
  to grid-sampling noise.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp


@pytest.fixture(scope="module")
def rmod(reference_src):
    import tg_shim

    tg_shim.install()
    np.int = int
    np.float = float
    import datasets.nuscenes_utils as rnutils

    return rnutils


@pytest.fixture(scope="module")
def raster():
    rng = np.random.default_rng(7)
    M, C, H, W = 2, 3, 160, 200
    r = np.zeros((M, C, H, W), np.uint8)
    for m in range(M):
        for c in range(C):
            for _ in range(6):
                y = rng.integers(0, H - 30)
                x = rng.integers(0, W - 30)
                r[m, c, y : y + int(rng.integers(8, 30)),
                  x : x + int(rng.integers(8, 30))] = 1
    dx = np.array([[0.25, 0.25], [0.5, 0.5]], np.float32)
    return r, dx


def _poses(n, seed, span=40.0):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-5.0, span, size=(n, 2))
    h = rng.uniform(-np.pi, np.pi, size=n)
    return np.concatenate(
        [xy, np.cos(h)[:, None], np.sin(h)[:, None]], axis=1
    ).astype(np.float32)


BOUNDS = [-6.0, -10.0, 14.0, 10.0]


def test_crop_exact_parity(rmod, raster):
    from strive_tpu.maps.queries import get_map_crop

    r, dx = raster
    pos = _poses(9, 3)
    pos[7] = np.nan  # reference: NaN frame reads pixel (0, 0)
    pos[8, :2] = [500.0, 500.0]  # fully off-map
    mapixes = np.array([0, 1] * 4 + [0])

    ref = rmod.get_map_obs(
        torch.from_numpy(r.astype(np.float32)), torch.from_numpy(dx),
        torch.from_numpy(pos), torch.from_numpy(mapixes), BOUNDS,
        L=64, W=96).numpy()
    ours = np.asarray(get_map_crop(
        jnp.asarray(r), jnp.asarray(dx), jnp.asarray(pos),
        jnp.asarray(mapixes), BOUNDS, L=64, W=96))
    np.testing.assert_array_equal(ours, ref)


def test_check_on_layer_tolerance_parity(rmod, raster):
    from strive_tpu.maps.queries import check_on_layer

    r, dx = raster
    T = 16
    pos = _poses(T, 11)
    lw = np.tile(np.array([[4.5, 2.0]], np.float32), (T, 1))
    mapixes = np.zeros(T, np.int64)

    drivable = r[:, 0].astype(np.float32)
    ref = rmod.check_on_layer(
        torch.from_numpy(drivable), torch.from_numpy(dx),
        torch.from_numpy(pos), torch.from_numpy(lw),
        torch.from_numpy(mapixes)).numpy()
    ours = np.asarray(check_on_layer(
        jnp.asarray(r[:, 0]), jnp.asarray(dx), jnp.asarray(pos),
        jnp.asarray(lw), jnp.asarray(mapixes)))
    # static 20x8 grid vs the reference's dynamic footprint grid
    np.testing.assert_allclose(ours, ref, atol=0.12)


def test_get_coll_point_tolerance_parity(rmod, raster):
    from strive_tpu.maps.queries import get_coll_point

    r, dx = raster
    T = 24
    pos = _poses(T, 5, span=30.0)
    lw = np.tile(np.array([[4.5, 2.0]], np.float32), (T, 1))
    mapixes = np.zeros(T, np.int64)

    drivable = r[:, 0].astype(np.float32)
    ref = rmod.get_coll_point(
        torch.from_numpy(drivable), torch.from_numpy(dx),
        torch.from_numpy(pos), torch.from_numpy(lw),
        torch.from_numpy(mapixes)).numpy()
    pt, valid, frac = get_coll_point(
        jnp.asarray(r[:, 0]), jnp.asarray(dx), jnp.asarray(pos),
        jnp.asarray(lw), jnp.asarray(mapixes))
    pt, valid = np.asarray(pt), np.asarray(valid)
    # NaN pattern (fully on/off road -> invalid) must broadly agree;
    # borderline footprints can flip with the grid resolution
    ref_valid = ~np.isnan(ref).any(-1)
    assert (ref_valid == valid).mean() >= 0.8, (ref_valid, valid)
    both = ref_valid & valid
    assert both.any()
    np.testing.assert_allclose(pt[both], ref[both], atol=1.0)
