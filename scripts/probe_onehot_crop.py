"""Probe 5: rotated-crop gather via one-hot MXU matmuls (NO gather ops).

The r1 Pallas kernel died because this toolchain's Mosaic crashes on any
dynamic-gather op. This probe tests a formulation built only from ops the
toolchain supports: dynamic-slice DMA (HBM->VMEM), broadcasted_iota,
compares, and matmuls.

Per 32x32 crop tile:
  1. DMA a (64, 192) uint8 window from the packed raster at the tile's
     bbox origin (rows aligned 8, cols aligned 128) — double buffered;
  2. row gather as a matmul: outT (192, 1024) = win^T (192,64) @ onehot
     rows (64, 1024), with onehot[r, p] = (ly[p] == r) built by iota
     compare (points stay LANE-major end to end: no relayouts);
  3. column pick: val[p] = sum_c outT[c, p] * (c == lx[p]).

Checks bit-exactness vs the XLA take path and times both.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN_R = 64
WIN_C = 192
TILE = 32
PTS = TILE * TILE  # 1024


def timeit(fn, *args, n=30, warmup=5):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def _kernel(row0_ref, col0_ref, ly_ref, lx_ref, flat_ref, out_ref, win, sem):
    a = pl.program_id(0)
    nt = ly_ref.shape[1]

    def dma(slot, t):
        return pltpu.make_async_copy(
            flat_ref.at[pl.ds(row0_ref[a, t], WIN_R),
                        pl.ds(col0_ref[a, t], WIN_C)],
            win.at[slot],
            sem.at[slot],
        )

    dma(0, 0).start()
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (WIN_R, PTS), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (WIN_C, PTS), 0)

    def body(t, _):
        slot = jax.lax.rem(t, 2)

        @pl.when(t + 1 < nt)
        def _():
            dma(jax.lax.rem(t + 1, 2), t + 1).start()

        dma(slot, t).wait()
        w16 = win[slot].astype(jnp.int32).astype(jnp.bfloat16)  # (64, 192)
        ly = ly_ref[0, t]                              # (1, 1024)
        lx = lx_ref[0, t]
        onehot = (iota_r == ly).astype(jnp.bfloat16)   # (64, 1024)
        # contract win rows (dim 0) with onehot rows (dim 0) -> (192, 1024)
        rows = jax.lax.dot_general(
            w16, onehot, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        val = jnp.sum(jnp.where(iota_c == lx, rows, 0.0), axis=0,
                      keepdims=True)                   # (1, 1024)
        out_ref[0, t] = val
        return ()

    jax.lax.fori_loop(0, nt, body, ())


def crop_onehot(flat, ly, lx, row0, col0):
    """:param flat: (M*H, W) uint8; ly/lx: (N, T, 1, PTS) int32 window-local
    indices; row0/col0: (N, T) int32 aligned window origins.
    :return: (N, T, 1, PTS) float32 gathered byte values."""
    N, T = row0.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, T, 1, PTS), lambda a, *_: (a, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, 1, PTS), lambda a, *_: (a, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, T, 1, PTS), lambda a, *_: (a, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, WIN_R, WIN_C), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((N, T, 1, PTS), jnp.float32),
        grid_spec=grid_spec,
    )(row0, col0, ly, lx, flat)


def tileize(idx, N, L, W):
    """(N, L, W) -> (N, T, 1, PTS) tile-major."""
    tr, tc = L // TILE, W // TILE
    return (idx.reshape(N, tr, TILE, tc, TILE)
            .transpose(0, 1, 3, 2, 4)
            .reshape(N, tr * tc, 1, PTS))


def untileize(vals, N, L, W):
    tr, tc = L // TILE, W // TILE
    return (vals.reshape(N, tr, tc, TILE, TILE)
            .transpose(0, 1, 3, 2, 4)
            .reshape(N, L, W))


def main():
    rng = np.random.default_rng(0)
    M, H, Wp = 2, 1024, 1024
    N, L, W = 32, 256, 256
    packed = jnp.asarray(rng.integers(0, 256, (M, H, Wp)).astype(np.uint8))
    flat = packed.reshape(M * H, Wp)

    # synthetic rotated-grid indices like the real crop: per agent a random
    # center + heading, 0.3 m crop step on a 0.25 m/px raster
    theta = rng.uniform(0, 2 * np.pi, N)
    cx = rng.uniform(200, 800, N)
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

    px_j = jnp.asarray(px)
    py_j = jnp.asarray(py)
    mapix_j = jnp.asarray(mapix)
    outside_j = jnp.asarray(outside)

    @jax.jit
    def xla_path(flat, py, px, mapix):
        base = mapix.astype(jnp.int32)[:, None, None] * (H * Wp)
        return jnp.take(flat.reshape(-1), base + py * Wp + px, mode="clip")

    @jax.jit
    def kernel_path(flat, py, px, mapix, outside):
        big = jnp.int32(1 << 30)
        py_t = tileize(py, N, L, W)
        px_t = tileize(px, N, L, W)
        o_t = tileize(outside.astype(jnp.int32), N, L, W) > 0
        py_min = jnp.min(jnp.where(o_t, big, py_t), axis=(2, 3))
        px_min = jnp.min(jnp.where(o_t, big, px_t), axis=(2, 3))
        py_min = jnp.where(py_min == big, 0, py_min)
        px_min = jnp.where(px_min == big, 0, px_min)
        y0 = jnp.clip(py_min & ~7, 0, H - WIN_R)
        x0 = jnp.clip(px_min & ~127, 0, Wp - WIN_C)
        ly = jnp.clip(py_t - y0[:, :, None, None], 0, WIN_R - 1)
        lx = jnp.clip(px_t - x0[:, :, None, None], 0, WIN_C - 1)
        row0 = mapix.astype(jnp.int32)[:, None] * H + y0
        vals = crop_onehot(flat, ly, lx, row0, x0)
        vals = untileize(vals, N, L, W).astype(jnp.int32)
        origin = flat[mapix * H, 0].astype(jnp.int32)
        return jnp.where(outside, origin[:, None, None], vals)

    ref = np.asarray(xla_path(flat, py_j, px_j, mapix_j))
    try:
        got = np.asarray(kernel_path(flat, py_j, px_j, mapix_j, outside_j))
    except Exception as e:
        print("KERNEL FAILED TO COMPILE/RUN:")
        print(type(e).__name__, str(e)[:3000])
        return 1
    match = np.array_equal(ref, got)
    print(f"bit-exact: {match}")
    if not match:
        bad = np.argwhere(ref != got)
        print(f"  {len(bad)} mismatches; first: {bad[:5]}")
        for b in bad[:5]:
            print(f"  ref={ref[tuple(b)]} got={got[tuple(b)]}")

    t_xla = timeit(xla_path, flat, py_j, px_j, mapix_j)
    t_k = timeit(kernel_path, flat, py_j, px_j, mapix_j, outside_j)
    n_elem = N * L * W
    print(f"XLA   : {t_xla*1e3:8.3f} ms   {n_elem/t_xla/1e9:7.2f} G elem/s")
    print(f"kernel: {t_k*1e3:8.3f} ms   {n_elem/t_k/1e9:7.2f} G elem/s")
    print(f"speedup: {t_xla/t_k:.1f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
