"""Bisect round 3: which construct in the quadrant kernel crashes."""

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
        msg = str(e).split("\n")[0][:140]
        print(f"FAIL  {name}: {type(e).__name__}: {msg}")
        return False


def v_u8_scratch_store_read():
    x = jnp.arange(64 * 128, dtype=jnp.int32).astype(jnp.uint8).reshape(64, 128)

    def k(x_ref, o_ref, win):
        win[0:64, 0:128] = x_ref[:]
        win[0:64, 128:256] = x_ref[:]
        win[64:128, 0:128] = x_ref[:]
        win[64:128, 128:256] = x_ref[:]
        o_ref[:] = win[0:64, :].astype(jnp.int32)

    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((64, 256), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((128, 256), jnp.uint8)],
    )(x)
    want = jnp.concatenate([x, x], axis=1).astype(jnp.int32)
    return [bool(jnp.array_equal(out, want))]


def v_u8_dyn_sublane_read():
    x = jnp.arange(128 * 256, dtype=jnp.int32).astype(jnp.uint8).reshape(128, 256)
    off = jnp.array([[24]], jnp.int32)

    def k(off_ref, x_ref, o_ref):
        r = off_ref[0, 0]
        o_ref[:] = x_ref[pl.ds(r, 64), :].astype(jnp.int32)

    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((64, 256), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(off, x)
    return [bool(jnp.array_equal(out, x[24:88].astype(jnp.int32)))]


def v_u8_dyn_sublane_read_32aligned():
    x = jnp.arange(128 * 256, dtype=jnp.int32).astype(jnp.uint8).reshape(128, 256)
    off = jnp.array([[32]], jnp.int32)

    def k(off_ref, x_ref, o_ref):
        r = off_ref[0, 0]
        o_ref[:] = x_ref[pl.ds(r, 64), :].astype(jnp.int32)

    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((64, 256), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(off, x)
    return [bool(jnp.array_equal(out, x[32:96].astype(jnp.int32)))]


def v_i32_dyn_sublane_scratch():
    # convert u8->i32 into scratch FIRST, then dyn-slice the i32 scratch
    x = jnp.arange(128 * 256, dtype=jnp.int32).astype(jnp.uint8).reshape(128, 256)
    off = jnp.array([[24]], jnp.int32)

    def k(off_ref, x_ref, o_ref, w32):
        w32[:] = x_ref[:].astype(jnp.int32)
        r = off_ref[0, 0]
        o_ref[:] = w32[pl.ds(r, 64), :]

    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((64, 256), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((128, 256), jnp.int32)],
    )(off, x)
    return [bool(jnp.array_equal(out, x[24:88].astype(jnp.int32)))]


def v_4d_idx_block():
    x = jnp.arange(2 * 3 * 1 * 1024, dtype=jnp.int32).reshape(2, 3, 1, 1024)

    def k(x_ref, o_ref):
        o_ref[0, 0] = x_ref[0, 0] * 2

    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((2, 3, 1, 1024), jnp.int32),
        grid=(2, 3),
        in_specs=[pl.BlockSpec((1, 1, 1, 1024), lambda a, t: (a, t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, 1, 1024), lambda a, t: (a, t, 0, 0),
                               memory_space=pltpu.VMEM),
    )(x)
    return [bool(jnp.array_equal(out, x * 2))]


def main():
    for name, fn in [
        ("u8_scratch_store_read", v_u8_scratch_store_read),
        ("u8_dyn_sublane_read", v_u8_dyn_sublane_read),
        ("u8_dyn_sublane_read_32aligned", v_u8_dyn_sublane_read_32aligned),
        ("i32_dyn_sublane_scratch", v_i32_dyn_sublane_scratch),
        ("4d_idx_block", v_4d_idx_block),
    ]:
        try_variant(name, fn)


if __name__ == "__main__":
    main()
