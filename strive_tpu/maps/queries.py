"""Map crop sampling and occupancy queries.

TPU-native reimplementation of reference ``datasets/nuscenes_utils.py``:
``gen_car_coords`` (:205-232), ``get_map_obs`` (:234-264), ``check_on_layer``
(:266-298), ``check_line_layer`` (:300-332), ``get_coll_point`` (:334-390).

Semantics preserved exactly:
- rotated meter-space grid, round-to-nearest pixel, **integer gather** (no
  bilinear filtering),
- out-of-bounds samples read the map at pixel (0, 0),
- world x is scaled by dx[m, 0] and y by dx[m, 1] (see MapStore docstring),
- rows are indexed with pixel-y and columns with pixel-x.

Deviation (documented): the reference sizes its footprint grids dynamically
from the *batch mean* vehicle size (``nuscenes_utils.py:277-280,351-354``),
which is a data-dependent shape. Under jit we use static grid sizes chosen
to match the reference's typical resolution (car ≈ 4.8x2.0 m at 4 px/m →
20x8; get_coll_point uses half-pixel spacing → 39x16). The footprint grid is
still scaled per-vehicle exactly like the reference's ls/ws path, so the
estimated on-road fractions agree to within grid-sampling noise.

These are gather-bound ops; the index math is fused by XLA and the gather
runs from HBM. (A Pallas crop kernel can slot in behind `get_map_crop`
without changing callers.)
"""

from __future__ import annotations

import jax.numpy as jnp

# static footprint grid sizes (see module docstring)
ON_LAYER_GRID = (20, 8)
COLL_POINT_GRID = (39, 16)
LINE_SAMPLES = 128


def gen_car_coords(xy, h, L, W, bounds=None, ls=None, ws=None):
    """World-space sample grid aligned with each agent.

    :param xy: (B, 2) centers
    :param h: (B, 2) heading unit vectors (hx, hy)
    :param L, W: grid resolution
    :param bounds: [low_l, low_w, high_l, high_w] meters, or
    :param ls, ws: (B,) per-agent footprint extents
    :return: (B, L, W, 2) world xy coords

    Matches reference ``nuscenes_utils.py:205-232`` (without the redundant
    channel axis — all channels share coordinates).
    """
    B = h.shape[0]
    if bounds is not None:
        lwise = jnp.linspace(bounds[0], bounds[2], L)[None, :, None]
        wwise = jnp.linspace(bounds[1], bounds[3], W)[None, None, :]
        lwise = jnp.broadcast_to(lwise, (B, L, W))
        wwise = jnp.broadcast_to(wwise, (B, L, W))
    else:
        lwise = jnp.linspace(-1.0, 1.0, L)[None, :, None] * (ls / 2.0)[:, None, None]
        wwise = jnp.linspace(-1.0, 1.0, W)[None, None, :] * (ws / 2.0)[:, None, None]
        lwise = jnp.broadcast_to(lwise, (B, L, W))
        wwise = jnp.broadcast_to(wwise, (B, L, W))
    hcos = h[:, 0][:, None, None]
    hsin = h[:, 1][:, None, None]
    gx = lwise * hcos - wwise * hsin + xy[:, 0][:, None, None]
    gy = lwise * hsin + wwise * hcos + xy[:, 1][:, None, None]
    return jnp.stack([gx, gy], axis=-1)


def _pixel_lookup(maps, dx, xys, mapixes):
    """Gather map values at world coords.

    :param maps: (M, H, W) single-layer rasters
    :param dx: (M, 2)
    :param xys: (B, ..., 2) world coords
    :param mapixes: (B,) int map index per batch element
    :return: (B, ...) gathered uint8 values
    """
    M, H, W = maps.shape
    d = dx[mapixes]  # (B, 2)
    extra = (1,) * (xys.ndim - 2)
    px = jnp.round(xys[..., 0] / d[:, 0].reshape((-1,) + extra)).astype(jnp.int32)
    py = jnp.round(xys[..., 1] / d[:, 1].reshape((-1,) + extra)).astype(jnp.int32)
    outside = (px < 0) | (px >= W) | (py < 0) | (py >= H)
    px = jnp.where(outside, 0, px)
    py = jnp.where(outside, 0, py)
    m = mapixes.reshape((-1,) + extra).astype(jnp.int32)
    flat_idx = (m * H + py) * W + px
    return jnp.take(maps.reshape(-1), flat_idx, mode="clip")


def get_map_crop(raster, dx, pos, mapixes, bounds, L=256, W=256,
                 dtype=jnp.float32, packed=None, num_channels=None,
                 min_dx=None, layout="nchw"):
    """Oriented local map crop around each pose.

    :param raster: (M, C, H, W) uint8
    :param pos: (B, 4) UNNORMALIZED (x, y, hx, hy)
    :param mapixes: (B,) int
    :param bounds: [low_l, low_w, high_l, high_w] meters
    :param packed: optional (M, H, W) uint8 bit-packed raster (bit c =
        channel c). When given, one gather per pixel instead of C — the
        crop gather is the rollout's dominant HBM traffic.
    :param min_dx: optional static (host float) smallest meters-per-pixel;
        when given with ``packed``, the Pallas one-hot crop kernel is used
        if it supports the configuration (bit-exact, ~100x faster).
    :param layout: 'nchw' (reference layout, default) or 'nhwc'
        (channels-last, skips a relayout when feeding the NHWC CNN)
    :return: (B, C, L, W) in ``dtype`` ((B, L, W, C) for 'nhwc')

    Matches reference ``get_map_obs`` (``nuscenes_utils.py:234-264``)
    including the nan-pose -> pixel(0,0) guard.
    """
    if packed is not None and min_dx is not None:
        from . import crop_kernel

        if crop_kernel.KERNEL_AVAILABLE and crop_kernel.kernel_supported(
                bounds, min_dx, packed.shape, L, W):
            kr, kc = crop_kernel.kernel_blocks(bounds, min_dx, L, W)
            return crop_kernel.get_map_crop_kernel(
                raster, dx, pos, mapixes, bounds, L=L, W=W, dtype=dtype,
                packed=packed, num_channels=num_channels, kr=kr, kc=kc,
                layout=layout)
    # OOB is defined by the REAL raster extent (packed may carry kernel-
    # alignment padding); indexing strides follow the array actually read
    Mm, C, H, Wp = raster.shape
    if packed is not None:
        _, Hs, Ws = packed.shape  # storage dims (possibly padded)
        if num_channels is not None:
            C = num_channels
    else:
        Hs, Ws = H, Wp
    xys = gen_car_coords(pos[:, :2], pos[:, 2:4], L, W, bounds=bounds)
    xys = jnp.where(jnp.isnan(xys), 0.0, xys)

    d = dx[mapixes]  # (B, 2)
    px = jnp.round(xys[..., 0] / d[:, 0, None, None]).astype(jnp.int32)
    py = jnp.round(xys[..., 1] / d[:, 1, None, None]).astype(jnp.int32)
    outside = (px < 0) | (px >= Wp) | (py < 0) | (py >= H)
    px = jnp.where(outside, 0, px)
    py = jnp.where(outside, 0, py)
    spatial = py * Ws + px  # (B, L, W)

    if packed is not None:
        base = mapixes.astype(jnp.int32)[:, None, None] * (Hs * Ws)
        bits = jnp.take(packed.reshape(-1), base + spatial, mode="clip")
        if layout == "nhwc":
            shifts = jnp.arange(C, dtype=jnp.uint8)[None, None, None, :]
            obs = (bits[..., None] >> shifts) & jnp.uint8(1)
        else:
            shifts = jnp.arange(C, dtype=jnp.uint8)[None, :, None, None]
            obs = (bits[:, None, :, :] >> shifts) & jnp.uint8(1)
        return obs.astype(dtype)

    # gather all channels with one flat take: (B, L, W) spatial index shared
    # across channels, offset per (map, channel)
    chan_base = (mapixes.astype(jnp.int32)[:, None] * C
                 + jnp.arange(C, dtype=jnp.int32)[None, :]) * (H * Wp)  # (B, C)
    flat_idx = chan_base[:, :, None, None] + spatial[:, None, :, :]
    obs = jnp.take(raster.reshape(-1), flat_idx, mode="clip")
    if layout == "nhwc":
        obs = obs.transpose(0, 2, 3, 1)
    return obs.astype(dtype)


def check_on_layer(drivables, dx, cars, lw, mapixes, grid=ON_LAYER_GRID):
    """Fraction of each car footprint on layer==1.

    :param drivables: (M, H, W)
    :param cars: (B, 4) (x, y, hx, hy) UNNORMALIZED
    :param lw: (B, 2)
    :return: (B,) float in [0, 1]

    Matches reference ``nuscenes_utils.py:266-298`` (static grid; see module
    docstring).
    """
    L, W = grid
    xys = gen_car_coords(cars[:, :2], cars[:, 2:4], L, W, ls=lw[:, 0], ws=lw[:, 1])
    pix = _pixel_lookup(drivables, dx, xys, mapixes)
    return jnp.sum(pix.astype(jnp.float32), axis=(1, 2)) / (L * W)


def check_line_layer(drivables, dx, start, end, mapixes, num_samples=LINE_SAMPLES):
    """True where the segment start->end crosses a 0 (non-drivable) pixel.

    Matches reference ``nuscenes_utils.py:300-332`` with a static sample
    count (the reference derives it from the longest segment in the batch).
    """
    B = start.shape[0]
    w = jnp.linspace(0.0, 1.0, num_samples)[None, :, None]
    pts = start[:, None, :] * (1.0 - w) + end[:, None, :] * w  # (B, S, 2)
    pix = _pixel_lookup(drivables, dx, pts, mapixes)
    return jnp.sum(pix == 0, axis=-1) > 0


def get_coll_point(drivables, dx, cars, lw, mapixes, grid=COLL_POINT_GRID,
                   packed=None, min_dx=None):
    """Mean position of non-drivable pixels inside each car footprint.

    Matches reference ``nuscenes_utils.py:334-390`` but NaN-free: returns

    :param packed: optional (M, H', W') bit-packed raster; with ``min_dx``
        (static host float) routes the footprint gather through the Pallas
        one-hot kernel (bit-exact, kills the 6 ms/iter XLA scalar-gather
        path in the env-collision loss — PERF.md r3)
    :return coll_pt: (B, 2) world coords (zeros where invalid)
    :return valid: (B,) True only for cars *partially* off-road
    :return offroad_frac: (B,) fraction of footprint off-road
    """
    L, W = grid
    if packed is not None and min_dx is not None:
        from . import crop_kernel

        if (crop_kernel.KERNEL_AVAILABLE
                and crop_kernel.footprint_supported(min_dx, packed.shape)):
            pix, xys_world = crop_kernel.get_footprint_vals_kernel(
                packed, drivables.shape[-2:], dx, cars, lw, mapixes,
                (L, W), min_dx, bit=0)
            return _coll_point_from_pix(pix, xys_world, L, W)
    xys_world = gen_car_coords(cars[:, :2], cars[:, 2:4], L, W,
                               ls=lw[:, 0], ws=lw[:, 1])
    pix = _pixel_lookup(drivables, dx, xys_world, mapixes)
    return _coll_point_from_pix(pix, xys_world, L, W)


def _coll_point_from_pix(pix, xys_world, L, W):
    non_drivable = (pix == 0).astype(jnp.float32)[..., None]  # (B, L, W, 1)
    num_nd = jnp.sum(non_drivable, axis=(1, 2))  # (B, 1)
    coll_pt = jnp.sum(xys_world * non_drivable, axis=(1, 2)) / jnp.maximum(num_nd, 1.0)
    total = float(L * W)
    valid = (num_nd[:, 0] > 0) & (num_nd[:, 0] < total)
    return coll_pt, valid, num_nd[:, 0] / total
