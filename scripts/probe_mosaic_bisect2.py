"""Bisect round 2: can the auto-pipeline replace manual DMA?

(a) scalar-prefetch-dependent index_map (data-driven block choice)
(b) multiple in_specs viewing the SAME array at different offsets
(c) dynamic sublane-start VMEM read
(d) dynamic lane-start VMEM read
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_variant(name, fn):
    try:
        out = fn()
        jax.block_until_ready(out)
        ok = bool(out[0]) if hasattr(out, "__getitem__") else True
        print(f"PASS  {name}  (correct={ok})")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"FAIL  {name}: {type(e).__name__}: {msg}")
        return False


def v_prefetch_indexmap():
    # grid (G,), block (64, 128) selected by prefetched block indices
    H, W = 1024, 1024
    x = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
    G = 4
    rb = jnp.array([3, 0, 7, 2], jnp.int32)
    cb = jnp.array([1, 5, 0, 4], jnp.int32)

    def k(rb_ref, cb_ref, blk_ref, o_ref):
        o_ref[0] = jnp.sum(blk_ref[:], dtype=jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((64, 128), lambda g, rb, cb: (rb[g], cb[g]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1,), lambda g, *_: (g,),
                               memory_space=pltpu.SMEM),
    )
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((G,), jnp.int32),
        grid_spec=grid_spec,
    )(rb, cb, x)
    want = jnp.stack([
        jnp.sum(x[r * 64:(r + 1) * 64, c * 128:(c + 1) * 128], dtype=jnp.int32)
        for r, c in zip(rb, cb)])
    return [bool(jnp.array_equal(out, want))]


def v_same_array_two_specs():
    H, W = 1024, 1024
    x = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
    G = 2
    rb = jnp.array([3, 0], jnp.int32)

    def k(rb_ref, a_ref, b_ref, o_ref):
        o_ref[0] = jnp.sum(a_ref[:], dtype=jnp.int32) - jnp.sum(
            b_ref[:], dtype=jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((64, 128), lambda g, rb: (rb[g], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 128), lambda g, rb: (rb[g] + 1, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1,), lambda g, *_: (g,),
                               memory_space=pltpu.SMEM),
    )
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((G,), jnp.int32),
        grid_spec=grid_spec,
    )(rb, x, x)
    want = jnp.stack([
        jnp.sum(x[r * 64:(r + 1) * 64, :128], dtype=jnp.int32)
        - jnp.sum(x[(r + 1) * 64:(r + 2) * 64, :128], dtype=jnp.int32)
        for r in rb])
    return [bool(jnp.array_equal(out, want))]


def v_dyn_sublane_read():
    x = jnp.arange(256 * 128, dtype=jnp.float32).reshape(256, 128)
    off = jnp.array([[64]], jnp.int32)

    def k(off_ref, x_ref, o_ref):
        r = off_ref[0, 0]
        o_ref[:] = x_ref[pl.ds(r, 64), :]

    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(off, x)
    return [bool(jnp.array_equal(out, x[64:128]))]


def v_dyn_sublane_read_unaligned():
    x = jnp.arange(256 * 128, dtype=jnp.float32).reshape(256, 128)
    off = jnp.array([[37]], jnp.int32)

    def k(off_ref, x_ref, o_ref):
        r = off_ref[0, 0]
        o_ref[:] = x_ref[pl.ds(r, 64), :]

    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(off, x)
    return [bool(jnp.array_equal(out, x[37:101]))]


def v_dyn_lane_read():
    x = jnp.arange(64 * 512, dtype=jnp.float32).reshape(64, 512)
    off = jnp.array([[128]], jnp.int32)

    def k(off_ref, x_ref, o_ref):
        c = off_ref[0, 0]
        o_ref[:] = x_ref[:, pl.ds(c, 128)]

    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(off, x)
    return [bool(jnp.array_equal(out, x[:, 128:256]))]


def v_prefetch_indexmap_u8():
    # like (a) but uint8 operand, 4D array (the real raster layout)
    M, H, W = 2, 1024, 1024
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, (M * H, W)).astype(np.uint8))
    G = 4
    rb = jnp.array([3, 17, 7, 31], jnp.int32)
    cb = jnp.array([1, 5, 0, 4], jnp.int32)

    def k(rb_ref, cb_ref, blk_ref, o_ref):
        o_ref[0] = jnp.sum(blk_ref[:].astype(jnp.int32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((32, 128), lambda g, rb, cb: (rb[g], cb[g]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1,), lambda g, *_: (g,),
                               memory_space=pltpu.SMEM),
    )
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((G,), jnp.int32),
        grid_spec=grid_spec,
    )(rb, cb, x)
    want = jnp.stack([
        jnp.sum(x[r * 32:(r + 1) * 32, c * 128:(c + 1) * 128].astype(jnp.int32))
        for r, c in zip(rb, cb)])
    return [bool(jnp.array_equal(out, want))]


def main():
    variants = [
        ("prefetch_indexmap", v_prefetch_indexmap),
        ("prefetch_indexmap_u8", v_prefetch_indexmap_u8),
        ("same_array_two_specs", v_same_array_two_specs),
        ("dyn_sublane_read_aligned", v_dyn_sublane_read),
        ("dyn_sublane_read_unaligned", v_dyn_sublane_read_unaligned),
        ("dyn_lane_read", v_dyn_lane_read),
    ]
    for name, fn in variants:
        try_variant(name, fn)


if __name__ == "__main__":
    main()
