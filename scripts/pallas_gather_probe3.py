"""Probe 3: pin down the fast-gather conditions + fix the Pallas DMA.

- stage-2 take speed vs window size (pow2 or not, padded-flat variant)
- Pallas window-DMA with a flattened (M*H, W) raster ref
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


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


N, L, W = 32, 256, 256
H = Wp = 2048
M = 2


def main():
    rng = np.random.default_rng(0)

    for WIN in (512, 576, 640):
        wins = jnp.asarray(
            rng.integers(0, 16, (N, WIN, WIN)).astype(np.int32))
        idx = jnp.asarray(
            rng.integers(0, WIN * WIN, (N, L, W)).astype(np.int32))

        def take_flat(wins, idx):
            return jax.vmap(
                lambda w, i: jnp.take(w.reshape(-1), i, mode="clip")
            )(wins, idx)

        t = timeit(jax.jit(take_flat), wins, idx)
        print(f"take WIN={WIN}: {t*1e3:7.2f} ms ({N*L*W/t/1e9:5.2f} G/s)")

        if WIN * WIN != 1 << (WIN * WIN - 1).bit_length():
            pad = (1 << (WIN * WIN - 1).bit_length()) - WIN * WIN

            def take_padded(wins, idx, pad=pad):
                def one(w, i):
                    wf = jnp.pad(w.reshape(-1), (0, pad))
                    return jnp.take(wf, i, mode="clip")
                return jax.vmap(one)(wins, idx)

            t = timeit(jax.jit(take_padded), wins, idx)
            print(f"take WIN={WIN} padflat: {t*1e3:7.2f} ms "
                  f"({N*L*W/t/1e9:5.2f} G/s)")

    # u8 stage2 at 512
    wins8 = jnp.asarray(rng.integers(0, 16, (N, 512, 512)).astype(np.uint8))
    idx = jnp.asarray(rng.integers(0, 512 * 512, (N, L, W)).astype(np.int32))
    t = timeit(jax.jit(lambda w, i: jax.vmap(
        lambda a, b: jnp.take(a.reshape(-1), b, mode="clip"))(w, i)),
        wins8, idx)
    print(f"take WIN=512 u8: {t*1e3:7.2f} ms ({N*L*W/t/1e9:5.2f} G/s)")

    # Pallas DMA from flattened raster
    WIN = 512
    raster = jnp.asarray(rng.integers(0, 16, (M * H, Wp)).astype(np.uint8))
    y0 = jnp.asarray(rng.integers(0, H - WIN, N).astype(np.int32))
    x0 = jnp.asarray(rng.integers(0, Wp - WIN, N).astype(np.int32))
    mapix = jnp.asarray(rng.integers(0, M, N).astype(np.int32))

    def dma_kernel(y0r, x0r, mr, rr, outr, sem):
        a = pl.program_id(0)
        cp = pltpu.make_async_copy(
            rr.at[pl.ds(mr[a] * H + y0r[a], WIN), pl.ds(x0r[a], WIN)],
            outr.at[0],
            sem,
        )
        cp.start()
        cp.wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(N,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, WIN, WIN), lambda a, *_: (a, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    f = jax.jit(lambda: pl.pallas_call(
        dma_kernel,
        out_shape=jax.ShapeDtypeStruct((N, WIN, WIN), raster.dtype),
        grid_spec=grid_spec,
    )(y0, x0, mapix, raster))
    try:
        wins = f()
        ref = jax.vmap(lambda m, yy, xx: jax.lax.dynamic_slice(
            raster, (m * H + yy, xx), (WIN, WIN)))(mapix, y0, x0)
        ok = bool(jnp.all(wins == ref))
        t = timeit(f)
        print(f"pallas DMA extract WIN=512 u8: {t*1e3:7.2f} ms correct={ok}")
    except Exception as e:
        print(f"pallas DMA: FAILED {str(e)[:300]}")

    def extract_vmap():
        return jax.vmap(lambda m, yy, xx: jax.lax.dynamic_slice(
            raster, (m * H + yy, xx), (WIN, WIN)))(mapix, y0, x0)

    t = timeit(jax.jit(extract_vmap))
    print(f"vmap dslice extract WIN=512 u8: {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
