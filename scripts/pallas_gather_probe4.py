"""Probe 4: why is take fast on host-created windows but slow on
device-computed ones? Test fused extract+take with layout-normalization
tricks (optimization_barrier, explicit copy, 1-D operand)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


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
WIN = 512


def main():
    rng = np.random.default_rng(0)
    raster = jnp.asarray(rng.integers(0, 16, (M * H, Wp)).astype(np.int32))
    y0 = jnp.asarray(rng.integers(0, H - WIN, N).astype(np.int32))
    x0 = jnp.asarray(rng.integers(0, Wp - WIN, N).astype(np.int32))
    mapix = jnp.asarray(rng.integers(0, M, N).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, WIN * WIN, (N, L, W)).astype(np.int32))

    def extract():
        return jax.vmap(lambda m, yy, xx: jax.lax.dynamic_slice(
            raster, (m * H + yy, xx), (WIN, WIN)))(mapix, y0, x0)

    def take(wins, i):
        return jax.vmap(lambda w, ii: jnp.take(w.reshape(-1), ii,
                                               mode="clip"))(wins, i)

    # 0: two separate jits, wins computed on device
    wins_dev = jax.jit(extract)()
    t = timeit(jax.jit(take), wins_dev, idx)
    print(f"take on device-computed wins: {t*1e3:7.2f} ms")

    # 1: take on host round-tripped wins
    wins_host = jnp.asarray(np.asarray(wins_dev))
    t = timeit(jax.jit(take), wins_host, idx)
    print(f"take on host-roundtrip wins:  {t*1e3:7.2f} ms")

    # 2: fused
    t = timeit(jax.jit(lambda i: take(extract(), i)), idx)
    print(f"fused:                        {t*1e3:7.2f} ms")

    # 3: fused + optimization barrier
    def fused_barrier(i):
        wins = jax.lax.optimization_barrier(extract())
        return take(wins, i)

    t = timeit(jax.jit(fused_barrier), idx)
    print(f"fused + opt barrier:          {t*1e3:7.2f} ms")

    # 4: fused via flat copy (reshape to (N, WIN*WIN) with explicit copy)
    def fused_flat(i):
        wins = extract().reshape(N, WIN * WIN)
        wins = jax.lax.optimization_barrier(wins)
        return jax.vmap(lambda w, ii: jnp.take(w, ii, mode="clip"))(wins, i)

    t = timeit(jax.jit(fused_flat), idx)
    print(f"fused flat + barrier:         {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
