"""Bisect the footprint mis-gather: is it host index math or the kernel gather?"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from strive_tpu.maps import synthetic_map_store
from strive_tpu.maps import crop_kernel
from strive_tpu.maps.crop_kernel import (BR, BC, footprint_kernel_blocks,
                                         _crop_onehot)
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
kr, kc = footprint_kernel_blocks(store.min_dx_m)
Mm, Hp, Wp = store.packed.shape
MH = Mm * Hp
H_real, W_real = drv.shape[-2:]

# ---- replicate get_footprint_vals_kernel's host-side index math on device,
# then gather with PLAIN XLA take using those indices + windows --------------
def host_math(cars):
    xys = gen_car_coords(cars[:, :2], cars[:, 2:4], L, W, ls=lwf[:, 0], ws=lwf[:, 1])
    d = store.dx[mapix]
    px = jnp.round(xys[..., 0] / d[:, 0, None, None]).astype(jnp.int32)
    py = jnp.round(xys[..., 1] / d[:, 1, None, None]).astype(jnp.int32)
    outside = (px < 0) | (px >= W_real) | (py < 0) | (py >= H_real)
    pya = mapix.astype(jnp.int32)[:, None, None] * Hp + py
    big = jnp.int32(1 << 30)
    py_min = jnp.min(jnp.where(outside, big, pya), axis=(1, 2))
    px_min = jnp.min(jnp.where(outside, big, px), axis=(1, 2))
    py_min = jnp.where(py_min == big, 0, py_min)
    px_min = jnp.where(px_min == big, 0, px_min)
    rb = jnp.clip(py_min // BR, 0, MH // BR - kr)
    cb = jnp.clip(px_min // BC, 0, Wp // BC - kc)
    ly = jnp.clip(pya - rb[:, None, None] * BR, 0, kr * BR - 1)
    lx = jnp.clip(px - cb[:, None, None] * BC, 0, kc * BC - 1)
    return xys, px, py, outside, pya, rb, cb, ly, lx

xys, px, py, outside, pya, rb, cb, ly, lx = jax.jit(host_math)(cars)
xys, px, py, outside, pya, rb, cb, ly, lx = map(
    np.asarray, (xys, px, py, outside, pya, rb, cb, ly, lx))

flat = np.asarray(store.packed).reshape(MH, Wp)

# expected value AT THE KERNEL'S OWN INDICES (window-local)
exp_window = flat[rb[:, None, None] * BR + ly, cb[:, None, None] * BC + lx]
# expected value at the TRUE global indices (XLA path semantics, pre-outside)
pyc = np.where(outside, 0, py)
pxc = np.where(outside, 0, px)
exp_global = np.asarray(drv)[np.zeros_like(pyc), pyc, pxc]  # mapix all 0
origin = np.asarray(store.packed)[0, 0, 0]
exp_window_o = np.where(outside, origin, exp_window)

# check 1: does the window even contain the right pixels?
glob_r = rb[:, None, None] * BR + ly
glob_c = cb[:, None, None] * BC + lx
idx_bad = ((glob_r != pya) | (glob_c != px)) & ~outside
print("index-math bad (window misses true pixel):", idx_bad.sum(), "/", idx_bad.size)

# check 2: run the actual kernel and compare vs exp_window
pts = L * W
ptsf = -(-pts // BC) * BC
pad = ptsf - pts
ly_f = jnp.pad(jnp.asarray(ly).reshape(P, pts), ((0, 0), (0, pad)))
lx_f = jnp.pad(jnp.asarray(lx).reshape(P, pts), ((0, 0), (0, pad)))
vals = jax.jit(lambda lyf, lxf, rbj, cbj: _crop_onehot(
    jnp.asarray(store.packed).reshape(MH, Wp),
    lyf[None, :, None, :], lxf[None, :, None, :],
    rbj[None, :], cbj[None, :], kr, kc))(ly_f, lx_f, jnp.asarray(rb), jnp.asarray(cb))
vals = np.asarray(vals)[0, :, 0, :pts].reshape(P, L, W)
kern_bad = vals != exp_window
print("kernel gather bad (vs its own indices):", kern_bad.sum(), "/", kern_bad.size)
if kern_bad.sum():
    c, r, w = np.nonzero(kern_bad)
    for i in range(min(8, len(c))):
        cc, rr, ww = c[i], r[i], w[i]
        print(f"  car {cc} pt ({rr},{ww}): ly={ly[cc,rr,ww]} lx={lx[cc,rr,ww]} "
              f"rb={rb[cc]} cb={cb[cc]} got={vals[cc,rr,ww]} exp={exp_window[cc,rr,ww]}")
    # distribution of bad ly/lx
    print("bad ly range:", ly[kern_bad].min(), ly[kern_bad].max())
    print("bad lx range:", lx[kern_bad].min(), lx[kern_bad].max())
    print("good ly range:", ly[~kern_bad].min(), ly[~kern_bad].max())
    print("good lx range:", lx[~kern_bad].min(), lx[~kern_bad].max())
