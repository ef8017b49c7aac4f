import numpy as np
import jax.numpy as jnp

from strive_tpu.maps import (
    MapStore,
    synthetic_map_store,
    get_map_crop,
    check_on_layer,
    check_line_layer,
    get_coll_point,
)


def make_store(arr, pix_per_m=4.0):
    """arr: (M, C, H, W) uint8."""
    M = arr.shape[0]
    dx = np.full((M, 2), 1.0 / pix_per_m, np.float32)
    return MapStore(raster=jnp.asarray(arr.astype(np.uint8)), dx=jnp.asarray(dx))


def test_crop_constant_map():
    arr = np.ones((1, 2, 128, 128), np.uint8)
    arr[:, :, 0, 0] = 0  # out-of-bounds sentinel
    store = make_store(arr)
    pos = jnp.array([[16.0, 16.0, 1.0, 0.0]])
    crop = get_map_crop(store.raster, store.dx, pos, jnp.array([0]),
                        bounds=(-4, -4, 4, 4), L=32, W=32)
    assert crop.shape == (1, 2, 32, 32)
    np.testing.assert_allclose(np.asarray(crop), 1.0)


def test_crop_out_of_bounds_reads_origin():
    arr = np.ones((1, 1, 64, 64), np.uint8)
    arr[0, 0, 0, 0] = 0
    store = make_store(arr)
    # crop centered far outside the map
    pos = jnp.array([[1000.0, 1000.0, 1.0, 0.0]])
    crop = get_map_crop(store.raster, store.dx, pos, jnp.array([0]),
                        bounds=(-4, -4, 4, 4), L=16, W=16)
    np.testing.assert_allclose(np.asarray(crop), 0.0)


def test_crop_orientation():
    # half-plane map: drivable only where y >= 8m (row >= 32 @ 4px/m)
    arr = np.zeros((1, 1, 128, 128), np.uint8)
    arr[0, 0, 32:, :] = 1
    store = make_store(arr)
    # agent at y=8m facing +x: left side (w>0) is +y -> drivable
    pos = jnp.array([[16.0, 8.0, 1.0, 0.0]])
    crop = np.asarray(
        get_map_crop(store.raster, store.dx, pos, jnp.array([0]),
                     bounds=(-4, -4, 4, 4), L=17, W=17)
    )[0, 0]
    # W axis spans w in [-4, 4]; w>0 corresponds to +y (drivable)
    assert crop[8, -1] == 1.0  # far left of car (+y)
    assert crop[8, 0] == 0.0   # far right of car (-y)


def test_crop_map_selection():
    arr = np.zeros((2, 1, 64, 64), np.uint8)
    arr[1] = 1
    store = make_store(arr)
    pos = jnp.tile(jnp.array([[8.0, 8.0, 1.0, 0.0]]), (2, 1))
    crop = np.asarray(
        get_map_crop(store.raster, store.dx, pos, jnp.array([0, 1]),
                     bounds=(-2, -2, 2, 2), L=8, W=8)
    )
    assert crop[0].max() == 0.0 and crop[1].min() == 1.0


def test_check_on_layer_fractions():
    arr = np.zeros((1, 1, 256, 256), np.uint8)
    arr[0, 0, :, 128:] = 1  # drivable for x >= 32m
    store = make_store(arr)
    cars = jnp.array(
        [
            [48.0, 32.0, 1.0, 0.0],  # fully inside drivable
            [8.0, 32.0, 1.0, 0.0],   # fully outside
            [32.0, 32.0, 0.0, 1.0],  # straddling the edge sideways
        ]
    )
    lw = jnp.tile(jnp.array([[4.8, 2.0]]), (3, 1))
    frac = np.asarray(
        check_on_layer(store.drivable(), store.dx, cars, lw, jnp.array([0, 0, 0]))
    )
    assert frac[0] == 1.0
    assert frac[1] == 0.0
    assert 0.3 < frac[2] < 0.7


def test_get_coll_point():
    arr = np.zeros((1, 1, 256, 256), np.uint8)
    arr[0, 0, :, 128:] = 1
    store = make_store(arr)
    cars = jnp.array(
        [
            [33.0, 32.0, 1.0, 0.0],  # nose over the boundary (partially off)
            [48.0, 32.0, 1.0, 0.0],  # fully on
            [8.0, 32.0, 1.0, 0.0],   # fully off
        ]
    )
    lw = jnp.tile(jnp.array([[4.8, 2.0]]), (3, 1))
    pt, valid, frac = get_coll_point(
        store.drivable(), store.dx, cars, lw, jnp.array([0, 0, 0])
    )
    valid = np.asarray(valid)
    assert valid.tolist() == [True, False, False]
    pt = np.asarray(pt)
    # collision point should be behind the car center (x < 33) on the off-road side
    assert pt[0, 0] < 33.0
    f = np.asarray(frac)
    assert 0.0 < f[0] < 1.0 and f[1] == 0.0 and f[2] == 1.0


def test_check_line_layer():
    arr = np.ones((1, 1, 256, 256), np.uint8)
    arr[0, 0, :, 100:110] = 0  # non-drivable wall at x in [25, 27.5]m
    store = make_store(arr)
    start = jnp.array([[5.0, 32.0], [5.0, 32.0]])
    end = jnp.array([[60.0, 32.0], [20.0, 32.0]])
    hit = np.asarray(
        check_line_layer(store.drivable(), store.dx, start, end, jnp.array([0, 0]))
    )
    assert hit.tolist() == [True, False]


def test_synthetic_store_shapes():
    store = synthetic_map_store(num_maps=2, size_px=128, channels=3)
    assert store.raster.shape == (2, 3, 128, 128)
    assert store.M == 2 and store.C == 3
    assert set(np.unique(np.asarray(store.raster))) <= {0, 1}
