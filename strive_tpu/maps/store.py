"""Rasterized map store.

The reference pre-rasterizes all 4 nuScenes maps into one padded uint8
tensor resident on device (``datasets/map_env.py:79-166``). We keep the same
layout — ``raster (M, C, maxH, maxW)`` uint8 in HBM plus a per-map
meters-per-pixel table ``dx (M, 2)`` — as a jit-traversable pytree.

Channel layout (reference ``map_env.py:63-77``): all road-type layers
(drivable_area / road_segment / lane) are collapsed into channel 0; every
other requested layer gets its own channel in order.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

# default observation bounds [low_l, low_w, high_l, high_w] in meters
# (reference utils/config.py:56-57)
DEFAULT_BOUNDS = (-17.0, -38.5, 60.0, 38.5)

NUSC_MAP_SIZES = {  # meters (H, W); reference map_env.py:14-19
    "singapore-onenorth": (2025.0, 1585.6),
    "singapore-hollandvillage": (2922.9, 2808.3),
    "singapore-queenstown": (3687.1, 3228.6),
    "boston-seaport": (2118.1, 2979.5),
}

ROAD_LAYERS = ("drivable_area", "road_segment", "lane")
DEFAULT_LAYERS = ("drivable_area", "carpark_area", "road_divider", "lane_divider")


def layer_channel_map(layers=DEFAULT_LAYERS):
    """Layer name -> crop channel index (reference map_env.py:70-77)."""
    road = [l for l in layers if l in ROAD_LAYERS]
    other = [l for l in layers if l not in ROAD_LAYERS]
    cmap = {l: 0 for l in road}
    for i, l in enumerate(other):
        cmap[l] = (1 if road else 0) + i
    return cmap


def num_channels(layers=DEFAULT_LAYERS):
    road = [l for l in layers if l in ROAD_LAYERS]
    other = [l for l in layers if l not in ROAD_LAYERS]
    return (1 if road else 0) + len(other)


@struct.dataclass
class MapStore:
    """Packed rasterized maps + resolution table.

    ``dx[m] = (meters/pixel along H, meters/pixel along W)``. Following the
    reference exactly (``nuscenes_utils.py:254``), world x is divided by
    ``dx[m, 0]`` and world y by ``dx[m, 1]`` — harmless because both entries
    are ~1/pix_per_m.

    ``packed`` holds the channels bit-packed into one byte per pixel
    (bit c = channel c). The per-rollout-step crop gather reads ``packed``
    and unpacks on-chip — 1/C the HBM gather traffic of the (M, C, H, W)
    layout, which dominates rollout time. Channel count must be <= 8.
    """

    raster: jnp.ndarray  # (M, C, H, W) uint8
    dx: jnp.ndarray      # (M, 2) float32
    packed: Optional[jnp.ndarray] = None  # (M, H', W') uint8 bitfield,
    #   H'/W' zero-padded to the crop kernel's block grid (64/128)
    map_names: Tuple[str, ...] = struct.field(pytree_node=False, default=())
    # static smallest meters-per-pixel; enables the Pallas crop kernel
    # (its window-size bound must be known at trace time)
    min_dx_m: Optional[float] = struct.field(pytree_node=False, default=None)

    @property
    def M(self):
        return self.raster.shape[0]

    @property
    def C(self):
        return self.raster.shape[1]

    def drivable(self):
        """(M, H, W) road layer (channel 0)."""
        return self.raster[:, 0]

    def with_packed(self):
        """Return a copy with the bit-packed raster + static min_dx set."""
        new = self
        if new.packed is None:
            new = new.replace(packed=pack_raster(new.raster))
        if new.min_dx_m is None:
            try:
                new = new.replace(min_dx_m=float(np.min(np.asarray(new.dx))))
            except Exception:
                pass  # dx is a tracer; kernel stays disabled
        return new


def pack_raster(raster, align=(64, 128)):
    """(M, C, H, W) binary uint8 -> (M, H', W') uint8 bitfield.

    H'/W' are zero-padded up to multiples of ``align`` so the crop kernel's
    block grid is legal; padding never changes crop values (out-of-bounds is
    judged against the REAL raster extent before indexing).
    """
    M, C, H, W = raster.shape
    assert C <= 8, "bit-packing supports at most 8 channels"
    shifts = jnp.asarray([1 << c for c in range(C)], jnp.uint8)
    packed = jnp.sum(
        raster.astype(jnp.uint8) * shifts[None, :, None, None], axis=1,
        dtype=jnp.uint8,
    )
    ah, aw = align
    Hp = -(-H // ah) * ah
    Wp = -(-W // aw) * aw
    if (Hp, Wp) != (H, W):
        packed = jnp.pad(packed, ((0, 0), (0, Hp - H), (0, Wp - W)))
    return packed


def synthetic_map_store(num_maps=2, size_px=512, channels=3, pix_per_m=4.0,
                        seed=0) -> MapStore:
    """Small procedurally generated maps for tests and benchmarks.

    Channel 0 is a 'drivable' grid of roads; other channels hold sparse
    divider-like stripes. Deterministic per seed.
    """
    rng = np.random.default_rng(seed)
    rasters = np.zeros((num_maps, channels, size_px, size_px), np.uint8)
    for m in range(num_maps):
        driv = np.zeros((size_px, size_px), np.uint8)
        # horizontal + vertical road bands
        n_bands = 4
        band_w = size_px // 10
        for _ in range(n_bands):
            r = int(rng.integers(0, size_px - band_w))
            driv[r : r + band_w, :] = 1
            c = int(rng.integers(0, size_px - band_w))
            driv[:, c : c + band_w] = 1
        # a big open square so simple scenes fit fully on-road
        driv[size_px // 4 : 3 * size_px // 4, size_px // 4 : 3 * size_px // 4] = 1
        rasters[m, 0] = driv
        for c in range(1, channels):
            stripes = np.zeros((size_px, size_px), np.uint8)
            for _ in range(3):
                r = int(rng.integers(0, size_px - 2))
                stripes[r : r + 2, :] = 1
            rasters[m, c] = stripes & driv
    dx = np.full((num_maps, 2), 1.0 / pix_per_m, np.float32)
    names = tuple(f"synthetic-{i}" for i in range(num_maps))
    return MapStore(raster=jnp.asarray(rasters), dx=jnp.asarray(dx),
                    map_names=names).with_packed()


def upsample_store(store: MapStore, factor: int) -> MapStore:
    """Nearest-neighbor upsample for hi-res qualitative rendering.

    The reference re-rasterizes at 8 px/m for eval_adv_gen's qualitative
    output (``eval_adv_gen.py:683``); without the devkit we upsample the
    existing raster instead (same content, finer pixels). ``dx`` shrinks by
    ``factor`` so world-coordinate queries stay correct.
    """
    if factor <= 1:
        return store
    r = np.asarray(store.raster)
    r = np.repeat(np.repeat(r, factor, axis=-2), factor, axis=-1)
    dx = np.asarray(store.dx) / float(factor)
    mdx = None if store.min_dx_m is None else store.min_dx_m / float(factor)
    return MapStore(raster=jnp.asarray(r), dx=jnp.asarray(dx),
                    map_names=store.map_names,
                    min_dx_m=mdx).with_packed()
