"""Reproduce + bisect the r3 footprint-kernel mis-gather (VERDICT r3 weak #1).

Shapes from tests/test_crop_kernel.py::test_footprint_kernel_grad_context:
P=48 cars, grid (39,16), store seed 3 / 2048px -> kr,kc=(4,3), G=8.
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from strive_tpu.maps import synthetic_map_store
from strive_tpu.maps import crop_kernel
from strive_tpu.maps.queries import gen_car_coords, _pixel_lookup, COLL_POINT_GRID

store = synthetic_map_store(num_maps=2, size_px=2048, channels=4, seed=3)
drv = store.drivable()

rng = np.random.default_rng(8)
B, NA, T = 2, 4, 6
traj = rng.uniform(100, 400, (B, NA, T, 4)).astype(np.float32)
lw = np.stack([rng.uniform(3, 6, (B, NA)),
               rng.uniform(1.5, 2.5, (B, NA))], -1).astype(np.float32)
P = B * NA * T
cars = jnp.asarray(traj.reshape(P, 4))
lwf = jnp.asarray(np.broadcast_to(lw[:, :, None, :], (B, NA, T, 2)).reshape(P, 2))
mapix = jnp.zeros(P, jnp.int32)

L, W = COLL_POINT_GRID
print(f"P={P} grid={L}x{W} kr,kc={crop_kernel.footprint_kernel_blocks(store.min_dx_m)}")

# XLA reference path
xys = gen_car_coords(cars[:, :2], cars[:, 2:4], L, W, ls=lwf[:, 0], ws=lwf[:, 1])
ref = _pixel_lookup(drv, store.dx, xys, mapix).astype(np.float32)
ref = np.asarray((jnp.asarray(ref).astype(jnp.int32) & 1).astype(jnp.float32))

orig_tpp = crop_kernel._tiles_per_program

for G in (8, 4, 2, 1):
    crop_kernel._tiles_per_program = lambda T, G=G: G if T % G == 0 else 1
    got, _ = jax.jit(lambda c: crop_kernel.get_footprint_vals_kernel(
        store.packed, drv.shape[-2:], store.dx, c, lwf, mapix,
        (L, W), store.min_dx_m, bit=0))(cars)
    got = np.asarray(got)
    bad = got != ref
    print(f"G={G}: wrong samples {bad.sum()}/{bad.size}, "
          f"cars affected {np.unique(np.nonzero(bad)[0]).size}/{P}")
    if bad.sum():
        ci = np.unique(np.nonzero(bad)[0])[:5]
        for c in ci:
            rows = np.unique(np.nonzero(bad[c])[0])
            print(f"  car {c}: bad rows {rows[:10]}")

crop_kernel._tiles_per_program = orig_tpp
