"""Bisect which Pallas construct crashes this toolchain's Mosaic backend.

Each variant is a minimal standalone kernel; run all, print pass/fail.
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
        print(f"PASS  {name}")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"FAIL  {name}: {type(e).__name__}: {msg}")
        return False


def v_trivial():
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    x = jnp.ones((128, 128), jnp.float32)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


def v_iota_compare_matmul():
    def k(idx_ref, w_ref, o_ref):
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (64, 1024), 0)
        onehot = (iota_r == idx_ref[:]).astype(jnp.bfloat16)
        o_ref[:] = jax.lax.dot_general(
            w_ref[:], onehot, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    idx = jnp.zeros((1, 1024), jnp.int32)
    w = jnp.ones((64, 192), jnp.bfloat16)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((192, 1024), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(idx, w)


def v_u8_convert():
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:].astype(jnp.int32).astype(jnp.bfloat16).astype(
            jnp.float32)

    x = jnp.ones((64, 192), jnp.uint8)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((64, 192), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


def v_dma_static():
    def k(h_ref, o_ref, win, sem):
        cp = pltpu.make_async_copy(h_ref.at[pl.ds(0, 64), pl.ds(0, 192)],
                                   win, sem)
        cp.start()
        cp.wait()
        o_ref[:] = win[:].astype(jnp.int32)

    x = jnp.ones((1024, 1024), jnp.uint8)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((64, 192), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((64, 192), jnp.uint8),
                        pltpu.SemaphoreType.DMA],
    )(x)


def v_dma_dynamic():
    def k(r0_ref, c0_ref, h_ref, o_ref, win, sem):
        cp = pltpu.make_async_copy(
            h_ref.at[pl.ds(r0_ref[0], 64), pl.ds(c0_ref[0], 192)], win, sem)
        cp.start()
        cp.wait()
        o_ref[:] = win[:].astype(jnp.int32)

    x = jnp.ones((1024, 1024), jnp.uint8)
    r0 = jnp.array([8], jnp.int32)
    c0 = jnp.array([128], jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((64, 192), lambda a, *_: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((64, 192), jnp.uint8),
                        pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((64, 192), jnp.int32),
        grid_spec=grid_spec,
    )(r0, c0, x)


def v_fori_when_rem():
    def k(x_ref, o_ref):
        def body(t, _):
            slot = jax.lax.rem(t, 2)

            @pl.when(slot == 0)
            def _():
                o_ref[pl.ds(t * 8, 8), :] = x_ref[pl.ds(t * 8, 8), :] * 2.0

            @pl.when(slot == 1)
            def _():
                o_ref[pl.ds(t * 8, 8), :] = x_ref[pl.ds(t * 8, 8), :] * 3.0

            return ()

        jax.lax.fori_loop(0, 16, body, ())

    x = jnp.ones((128, 128), jnp.float32)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


def v_dyn_outer_index():
    # dynamic index on an OUTER (non-tiled) dim of a VMEM ref inside fori
    def k(x_ref, o_ref):
        def body(t, _):
            o_ref[0, t] = x_ref[0, t] * 2.0
            return ()

        jax.lax.fori_loop(0, 4, body, ())

    x = jnp.ones((1, 4, 1, 1024), jnp.float32)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((1, 4, 1, 1024), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


def v_dma_dyn_in_fori():
    # double-buffered dynamic-offset DMA inside fori (the probe5 pattern)
    def k(r0_ref, c0_ref, h_ref, o_ref, win, sem):
        a = pl.program_id(0)
        nt = 4

        def dma(slot, t):
            return pltpu.make_async_copy(
                h_ref.at[pl.ds(r0_ref[a, t], 64), pl.ds(c0_ref[a, t], 192)],
                win.at[slot], sem.at[slot])

        dma(0, 0).start()

        def body(t, _):
            slot = jax.lax.rem(t, 2)

            @pl.when(t + 1 < nt)
            def _():
                dma(jax.lax.rem(t + 1, 2), t + 1).start()

            dma(slot, t).wait()
            o_ref[0, t] = jnp.sum(win[slot].astype(jnp.int32))
            return ()

        jax.lax.fori_loop(0, nt, body, ())

    x = jnp.ones((1024, 1024), jnp.uint8)
    r0 = jnp.zeros((1, 4), jnp.int32)
    c0 = jnp.zeros((1, 4), jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 4), lambda a, *_: (0, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.VMEM((2, 64, 192), jnp.uint8),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((1, 4), jnp.int32),
        grid_spec=grid_spec,
    )(r0, c0, x)


def main():
    variants = [
        ("trivial", v_trivial),
        ("iota_compare_matmul", v_iota_compare_matmul),
        ("u8_convert", v_u8_convert),
        ("dma_static", v_dma_static),
        ("dma_dynamic_prefetch", v_dma_dynamic),
        ("fori_when_rem", v_fori_when_rem),
        ("dyn_outer_index", v_dyn_outer_index),
        ("dma_dyn_in_fori", v_dma_dyn_in_fori),
    ]
    for name, fn in variants:
        try_variant(name, fn)


if __name__ == "__main__":
    main()
