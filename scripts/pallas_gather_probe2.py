"""Stage-1 probe: fast per-agent window extraction from the big raster.

Stage 2 (take from materialized (N, WIN, WIN) windows) measured 95 G elem/s;
the question is how to extract windows quickly: vmapped dynamic_slice vs a
Pallas DMA kernel with scalar-prefetched offsets, and u8-vs-i32 stage-2.
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


WIN = 640
N = 32
H = Wp = 2048
M = 2
L = W = 256


def main():
    rng = np.random.default_rng(0)
    raster_u8 = jnp.asarray(rng.integers(0, 16, (M, H, Wp)).astype(np.uint8))
    raster_i32 = raster_u8.astype(jnp.int32)
    y0 = jnp.asarray(rng.integers(0, H - WIN, N).astype(np.int32))
    x0 = jnp.asarray(rng.integers(0, Wp - WIN, N).astype(np.int32))
    mapix = jnp.asarray(rng.integers(0, M, N).astype(np.int32))
    lidx = jnp.asarray(rng.integers(0, WIN * WIN, (N, L, W)).astype(np.int32))

    def extract_vmap(raster):
        def one(m, yy, xx):
            return jax.lax.dynamic_slice(raster[m], (yy, xx), (WIN, WIN))
        return jax.vmap(one)(mapix, y0, x0)

    # Pallas: grid over agents; DMA the window HBM -> VMEM output
    def dma_kernel(y0_ref, x0_ref, m_ref, raster_ref, out_ref, sem):
        a = pl.program_id(0)
        cp = pltpu.make_async_copy(
            raster_ref.at[m_ref[a], pl.ds(y0_ref[a], WIN),
                          pl.ds(x0_ref[a], WIN)],
            out_ref,
            sem,
        )
        cp.start()
        cp.wait()

    def extract_pallas(raster):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(N,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((1, WIN, WIN),
                                   lambda a, *_: (a, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA],
        )
        f = pl.pallas_call(
            lambda y0r, x0r, mr, rr, outr, sem: dma_kernel(
                y0r, x0r, mr, rr, outr.at[0], sem),
            out_shape=jax.ShapeDtypeStruct((N, WIN, WIN), raster.dtype),
            grid_spec=grid_spec,
        )
        return jax.jit(lambda: f(y0, x0, mapix, raster))

    def take_stage(wins):
        return jax.vmap(lambda w, i: jnp.take(w.reshape(-1), i, mode="clip"))(
            wins, lidx)

    for name, raster in [("u8", raster_u8), ("i32", raster_i32)]:
        try:
            t = timeit(jax.jit(lambda r=raster: extract_vmap(r)))
            print(f"extract vmap dslice {name}: {t*1e3:7.2f} ms")
        except Exception as e:
            print(f"extract vmap {name}: FAILED {str(e)[:120]}")
        try:
            f = extract_pallas(raster)
            wins = f()
            ref = extract_vmap(raster)
            ok = bool(jnp.all(wins == ref))
            t = timeit(f)
            print(f"extract pallas DMA {name}: {t*1e3:7.2f} ms correct={ok}")
        except Exception as e:
            print(f"extract pallas {name}: FAILED {str(e)[:200]}")

    wins_u8 = extract_vmap(raster_u8)
    wins_i32 = extract_vmap(raster_i32)
    t = timeit(jax.jit(take_stage), wins_u8)
    print(f"stage2 take u8:  {t*1e3:7.2f} ms ({N*L*W/t/1e9:.2f} G elem/s)")
    t = timeit(jax.jit(take_stage), wins_i32)
    print(f"stage2 take i32: {t*1e3:7.2f} ms ({N*L*W/t/1e9:.2f} G elem/s)")

    def fused(raster):
        wins = extract_vmap(raster)
        return take_stage(wins)

    t = timeit(jax.jit(lambda: fused(raster_i32)))
    print(f"fused extract+take i32: {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
