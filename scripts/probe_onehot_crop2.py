"""Probe 6: full one-hot crop kernel with PIPELINED quadrant blocks.

No manual DMA (crashes this Mosaic), no gather ops (crash), no dynamic
lane slicing (crashes). Uses only verified-working constructs:
  - scalar-prefetch index_map block selection (4 views of the raster),
  - in-kernel concat + dynamic SUBLANE slice (verified working),
  - broadcasted_iota compare + MXU matmul + masked reduce.

Grid (N, T): one program per 32x32 crop tile.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BR = 64    # block rows
BC = 128   # block cols (must be multiple of 128)
TILE = 32
PTS = TILE * TILE


def timeit(fn, *args, n=30, warmup=5):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def _kernel(rb_ref, cb_ref, ly_ref, lx_ref,
            tl_ref, tr_ref, bl_ref, br_ref, out_ref, win):
    # assemble the 2x2 window in scratch (static stores only)
    win[0:BR, 0:BC] = tl_ref[:]
    win[0:BR, BC:2 * BC] = tr_ref[:]
    win[BR:2 * BR, 0:BC] = bl_ref[:]
    win[BR:2 * BR, BC:2 * BC] = br_ref[:]
    wt = win[:].astype(jnp.int32).astype(jnp.bfloat16)       # (128, 256)
    ly = ly_ref[0, 0]                                        # (1, 1024)
    lx = lx_ref[0, 0]
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (2 * BR, PTS), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (2 * BC, PTS), 0)
    onehot = (iota_r == ly).astype(jnp.bfloat16)             # (128, 1024)
    rows = jax.lax.dot_general(
        wt, onehot, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (256, 1024)
    val = jnp.sum(jnp.where(iota_c == lx, rows, 0.0), axis=0,
                  keepdims=True)                             # (1, 1024)
    out_ref[0, 0] = val


def crop_onehot(flat, ly, lx, rb, cb):
    """:param flat: (MH, W) uint8 raster; ly/lx: (N, T, 1, PTS) int32
    window-local indices (relative to the 2x2 block window origin);
    rb/cb: (N, T) int32 BLOCK indices of the window's top-left block.
    :return: (N, T, 1, PTS) float32 byte values."""
    N, T = rb.shape

    def spec_q(dr, dc):
        return pl.BlockSpec(
            (BR, BC),
            lambda a, t, rb, cb, dr=dr, dc=dc: (rb[a, t] + dr, cb[a, t] + dc),
            memory_space=pltpu.VMEM)

    idx_spec = pl.BlockSpec((1, 1, 1, PTS), lambda a, t, *_: (a, t, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N, T),
        in_specs=[idx_spec, idx_spec,
                  spec_q(0, 0), spec_q(0, 1), spec_q(1, 0), spec_q(1, 1)],
        out_specs=pl.BlockSpec((1, 1, 1, PTS), lambda a, t, *_: (a, t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2 * BR, 2 * BC), jnp.uint8)],
    )
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((N, T, 1, PTS), jnp.float32),
        grid_spec=grid_spec,
    )(rb, cb, ly, lx, flat, flat, flat, flat)


def tileize(idx, N, L, W):
    tr, tc = L // TILE, W // TILE
    return (idx.reshape(N, tr, TILE, tc, TILE)
            .transpose(0, 1, 3, 2, 4)
            .reshape(N, tr * tc, 1, PTS))


def untileize(vals, N, L, W):
    tr, tc = L // TILE, W // TILE
    return (vals.reshape(N, tr, tc, TILE, TILE)
            .transpose(0, 1, 3, 2, 4)
            .reshape(N, L, W))


def kernel_crop(flat, py, px, mapix, outside, H, Wp, N, L, W):
    MH = flat.shape[0]
    big = jnp.int32(1 << 30)
    py_t = tileize(py, N, L, W)
    px_t = tileize(px, N, L, W)
    o_t = tileize(outside.astype(jnp.int32), N, L, W) > 0
    # absolute rows in the flattened raster
    pya = mapix.astype(jnp.int32)[:, None, None, None] * H + py_t
    py_min = jnp.min(jnp.where(o_t, big, pya), axis=(2, 3))
    px_min = jnp.min(jnp.where(o_t, big, px_t), axis=(2, 3))
    py_min = jnp.where(py_min == big, 0, py_min)
    px_min = jnp.where(px_min == big, 0, px_min)
    # block indices; clamp so rb+1 / cb+1 stay in range
    rb = jnp.clip(py_min // BR, 0, MH // BR - 2)
    cb = jnp.clip(px_min // BC, 0, Wp // BC - 2)
    ly = jnp.clip(pya - rb[:, :, None, None] * BR, 0, 2 * BR - 1)
    lx = jnp.clip(px_t - cb[:, :, None, None] * BC, 0, 2 * BC - 1)
    vals = crop_onehot(flat, ly, lx, rb, cb)
    vals = untileize(vals, N, L, W).astype(jnp.int32)
    origin = flat[mapix * H, 0].astype(jnp.int32)
    return jnp.where(outside, origin[:, None, None], vals)


def main():
    rng = np.random.default_rng(0)
    M, H, Wp = 2, 1024, 1152  # Wp multiple of 128
    N, L, W = 32, 256, 256
    packed = jnp.asarray(rng.integers(0, 256, (M, H, Wp)).astype(np.uint8))
    flat = packed.reshape(M * H, Wp)

    theta = rng.uniform(0, 2 * np.pi, N)
    cx = rng.uniform(200, 900, N)
    cy = rng.uniform(200, 800, N)
    ii, jj = np.meshgrid(np.arange(L), np.arange(W), indexing="ij")
    scale = 0.302 / 0.25
    px = np.round(cx[:, None, None] + scale * (
        (ii - L / 2) * np.cos(theta)[:, None, None]
        - (jj - W / 2) * np.sin(theta)[:, None, None])).astype(np.int32)
    py = np.round(cy[:, None, None] + scale * (
        (ii - L / 2) * np.sin(theta)[:, None, None]
        + (jj - W / 2) * np.cos(theta)[:, None, None])).astype(np.int32)
    outside = (px < 0) | (px >= Wp) | (py < 0) | (py >= H)
    px = np.where(outside, 0, px)
    py = np.where(outside, 0, py)
    mapix = rng.integers(0, M, N).astype(np.int32)

    px_j, py_j = jnp.asarray(px), jnp.asarray(py)
    mapix_j, outside_j = jnp.asarray(mapix), jnp.asarray(outside)

    @jax.jit
    def xla_path(flat, py, px, mapix):
        base = mapix.astype(jnp.int32)[:, None, None] * (H * Wp)
        return jnp.take(flat.reshape(-1), base + py * Wp + px, mode="clip")

    kfn = jax.jit(functools.partial(kernel_crop, H=H, Wp=Wp, N=N, L=L, W=W))

    ref = np.asarray(xla_path(flat, py_j, px_j, mapix_j))
    try:
        got = np.asarray(kfn(flat, py_j, px_j, mapix_j, outside_j))
    except Exception as e:
        print("KERNEL FAILED:")
        print(type(e).__name__, str(e)[:2000])
        return 1
    match = np.array_equal(ref, got)
    print(f"bit-exact: {match}")
    if not match:
        bad = np.argwhere(ref != got)
        print(f"  {len(bad)} mismatches of {ref.size}; first: {bad[:3]}")
        for b in bad[:3]:
            print(f"  at {b}: ref={ref[tuple(b)]} got={got[tuple(b)]}")

    t_xla = timeit(xla_path, flat, py_j, px_j, mapix_j)
    t_k = timeit(kfn, flat, py_j, px_j, mapix_j, outside_j)
    n_elem = N * L * W
    print(f"XLA   : {t_xla*1e3:8.3f} ms   {n_elem/t_xla/1e9:7.2f} G elem/s")
    print(f"kernel: {t_k*1e3:8.3f} ms   {n_elem/t_k/1e9:7.2f} G elem/s")
    print(f"speedup: {t_xla/t_k:.1f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
