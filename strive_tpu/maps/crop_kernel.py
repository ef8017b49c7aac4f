"""Pallas TPU kernel for the rotated map-crop gather.

The per-rollout-step crop is THE hot op (98% of decode+grad time — see
scripts/ablate_hotpath.py): XLA lowers the arbitrary (py, px) gather from
the HBM raster to a ~0.1 G elem/s scalar path whose speed additionally
varies 1000x with operand layout. This kernel is deterministic:

1. outside the kernel (plain XLA, elementwise): compute the reference's
   exact pixel indices (round + clamp to (0,0) when off-map), the crop's
   bounding box, and a tile-aligned window origin per agent;
2. per-agent grid program: one strided DMA pulls a (512, 640) uint8 window
   from the bit-packed raster HBM -> VMEM (origins aligned to the (32, 128)
   uint8 tile so the DMA is legal; the window covers the crop's <=436 px
   bbox plus alignment slack);
3. in-kernel gather in 512-sample chunks using Mosaic's same-shape
   ``take_along_axis`` (out[s, j] = win[idx[s, j], j]): a row gather then a
   column pick;
4. outside: unpack channel bits and substitute the map's (0,0) value for
   off-map samples (reference ``nuscenes_utils.py:260-263`` semantics).

STATUS: EXPERIMENTAL / DISABLED. The current toolchain's Mosaic backend
crashes (tpu_compile_helper exit 1) on ANY dynamic-gather op — even a
standalone same-shape take_along_axis kernel — so this path cannot compile
here. See PERF.md for the full investigation; the model uses the XLA
gather path. Re-enable by flipping KERNEL_AVAILABLE when the toolchain's
gather lowering works (tests/test_crop_kernel.py validates bit-exactness).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .queries import gen_car_coords

KERNEL_AVAILABLE = False  # Mosaic dynamic-gather broken in this toolchain

WIN_R = 512   # window rows (>= 436 bbox + 31 align slack)
WIN_C = 640   # window cols (>= 436 bbox + 127 align slack)
CHUNK = 512   # samples gathered per inner iteration (= 2 output rows)


def kernel_supported(bounds, dx_m, map_shape, L=256, W=256):
    """Static check that the crop bbox fits the kernel window."""
    import math

    diag = math.hypot(bounds[2] - bounds[0], bounds[3] - bounds[1])
    bbox_px = diag / dx_m + 2
    M, H, Wp = map_shape
    return (bbox_px + 32 <= WIN_R and bbox_px + 128 <= WIN_C
            and H % 32 == 0 and H >= WIN_R and Wp >= WIN_C
            and (L * W) % CHUNK == 0 and CHUNK % W == 0)


def _crop_kernel(row0_ref, col0_ref, ly_ref, lx_ref, raster_ref, out_ref,
                 win_u8, win_i32, sem):
    a = pl.program_id(0)
    cp = pltpu.make_async_copy(
        raster_ref.at[pl.ds(row0_ref[a], WIN_R), pl.ds(col0_ref[a], WIN_C)],
        win_u8,
        sem,
    )
    cp.start()
    cp.wait()
    win_i32[:] = win_u8[:].astype(jnp.int32)

    L, W = out_ref.shape[1], out_ref.shape[2]
    # VMEM slice offsets in the sublane dim must be multiples of 8, so the
    # loop reads 8 output rows at a time and gathers them in CHUNK-sample
    # sub-chunks at static offsets (Mosaic's gather needs indices shaped
    # exactly like the (WIN_R, WIN_C) operand, i.e. CHUNK == WIN_R samples)
    rows_per_iter = 8
    samples_per_iter = rows_per_iter * W  # 2048
    n_sub = samples_per_iter // CHUNK     # 4
    n_iters = L // rows_per_iter

    def body(c, _):
        r0 = c * rows_per_iter
        ly8 = ly_ref[0, pl.ds(r0, rows_per_iter), :].reshape(samples_per_iter)
        lx8 = lx_ref[0, pl.ds(r0, rows_per_iter), :].reshape(samples_per_iter)
        parts = []
        for s in range(n_sub):
            ly = jax.lax.slice(ly8, (s * CHUNK,), ((s + 1) * CHUNK,))
            lx = jax.lax.slice(lx8, (s * CHUNK,), ((s + 1) * CHUNK,))
            idx_rows = jnp.broadcast_to(ly[:, None], (CHUNK, WIN_C))
            rows = jnp.take_along_axis(win_i32[:], idx_rows, axis=0)
            idx_cols = jnp.broadcast_to(lx[:, None], (CHUNK, WIN_C))
            picked = jnp.take_along_axis(rows, idx_cols, axis=1)
            parts.append(picked[:, 0:1])
        vals = jnp.concatenate(parts, axis=0)  # (samples_per_iter, 1)
        out_ref[0, pl.ds(r0, rows_per_iter), :] = vals.reshape(
            rows_per_iter, W)
        return ()

    jax.lax.fori_loop(0, n_iters, body, ())


def crop_gather_pallas(packed, ly, lx, row0, col0):
    """Gather packed-bit crops through the kernel.

    :param packed: (M, H, W) uint8 bit-packed raster
    :param ly: (N, L, W) int32 window-local rows in [0, WIN_R)
    :param lx: (N, L, W) int32 window-local cols in [0, WIN_C)
    :param row0: (N,) int32 32-aligned window origin rows in the flattened
        (M*H, W) raster; col0: (N,) 128-aligned origin columns
    :return: (N, L, W) int32 packed values
    """
    N, L, W = ly.shape
    M, H, Wp = packed.shape
    flat = packed.reshape(M * H, Wp)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, L, W), lambda a, *_: (a, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, W), lambda a, *_: (a, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, L, W), lambda a, *_: (a, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((WIN_R, WIN_C), jnp.uint8),
            pltpu.VMEM((WIN_R, WIN_C), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _crop_kernel,
        out_shape=jax.ShapeDtypeStruct((N, L, W), jnp.int32),
        grid_spec=grid_spec,
    )(row0, col0, ly, lx, flat)


def get_map_crop_kernel(raster, dx, pos, mapixes, bounds, L=256, W=256,
                        dtype=jnp.float32, packed=None, num_channels=None):
    """Drop-in replacement for queries.get_map_crop using the Pallas path.

    Semantics identical to the reference ``get_map_obs``
    (``nuscenes_utils.py:234-264``): round-to-nearest integer sampling,
    off-map samples read the map's pixel (0, 0).
    """
    assert packed is not None, "kernel path requires the bit-packed raster"
    Mm, H, Wp = packed.shape
    C = num_channels if num_channels is not None else raster.shape[1]
    N = pos.shape[0]

    xys = gen_car_coords(pos[:, :2], pos[:, 2:4], L, W, bounds=bounds)
    xys = jnp.where(jnp.isnan(xys), 0.0, xys)
    d = dx[mapixes]
    px = jnp.round(xys[..., 0] / d[:, 0, None, None]).astype(jnp.int32)
    py = jnp.round(xys[..., 1] / d[:, 1, None, None]).astype(jnp.int32)
    outside = (px < 0) | (px >= Wp) | (py < 0) | (py >= H)
    px = jnp.where(outside, 0, px)
    py = jnp.where(outside, 0, py)

    # per-agent window origin: cover the index bbox, tile-aligned, in-range.
    # off-map samples were remapped to (0,0) and would drag the bbox to the
    # origin — exclude them from the min (they're fixed up afterwards)
    big = jnp.int32(1 << 30)
    py_min = jnp.min(jnp.where(outside, big, py).reshape(N, -1), axis=1)
    px_min = jnp.min(jnp.where(outside, big, px).reshape(N, -1), axis=1)
    py_min = jnp.where(py_min == big, 0, py_min)
    px_min = jnp.where(px_min == big, 0, px_min)
    y0 = jnp.clip(py_min & ~31, 0, jnp.maximum(H - WIN_R, 0))
    x0 = jnp.clip(px_min & ~127, 0, jnp.maximum(Wp - WIN_C, 0))
    ly = jnp.clip(py - y0[:, None, None], 0, WIN_R - 1)
    lx = jnp.clip(px - x0[:, None, None], 0, WIN_C - 1)
    in_window = ((py - y0[:, None, None] == ly)
                 & (px - x0[:, None, None] == lx))

    m = mapixes.astype(jnp.int32)
    row0 = m * H + y0  # stays 32-aligned when H % 32 == 0 (kernel_supported)
    vals = crop_gather_pallas(packed, ly, lx, row0, x0)

    origin_val = packed[m, 0, 0].astype(jnp.int32)  # (N,)
    vals = jnp.where(in_window, vals, origin_val[:, None, None])

    shifts = jnp.arange(C, dtype=jnp.int32)[None, :, None, None]
    obs = (vals[:, None, :, :] >> shifts) & 1
    return obs.astype(dtype)
