"""Probe: does Mosaic support (and vectorize) arbitrary VMEM gathers?

Minimal Pallas kernel: load a window into VMEM, gather 256x256 arbitrary
elements from it. Compares against XLA's take.
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


def main():
    rng = np.random.default_rng(0)
    WIN = 512
    L = W = 256
    N = 32  # agents

    win = jnp.asarray(rng.integers(0, 16, (N, WIN, WIN)).astype(np.int32))
    idx = jnp.asarray(
        rng.integers(0, WIN * WIN, (N, L, W)).astype(np.int32))

    # variant 1: flat take inside kernel
    def k_take_flat(win_ref, idx_ref, out_ref):
        w = win_ref[:].reshape(-1)
        out_ref[:] = jnp.take(w, idx_ref[:], mode="clip")

    # variant 2: row/col split with take_along_axis twice is not exact;
    # instead: gather rows then gather within rows
    def k_two_stage(win_ref, idx_ref, out_ref):
        py = idx_ref[:] // WIN  # (L, W)
        px = idx_ref[:] % WIN
        w = win_ref[:]
        # stage 1: for each output element, grab its row via take along axis 0
        rows = jnp.take_along_axis(
            w[:, None, :].repeat(1, axis=1), py.reshape(1, -1, 1), axis=0
        )
        out_ref[:] = jnp.take_along_axis(
            rows[0], px.reshape(-1, 1), axis=1
        ).reshape(L, W)

    def make(kernel):
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, W), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        return jax.jit(jax.vmap(f))

    def xla_take(win, idx):
        return jax.vmap(lambda w, i: jnp.take(w.reshape(-1), i, mode="clip"))(
            win, idx)

    t = timeit(jax.jit(xla_take), win, idx)
    print(f"xla take:      {t*1e3:7.2f} ms ({N*L*W/t/1e9:.2f} G elem/s)")

    for name, kern in [("pl flat take", k_take_flat),
                       ("pl two-stage", k_two_stage)]:
        try:
            fn = make(kern)
            out = fn(win, idx)
            ref = xla_take(win, idx)
            ok = bool(jnp.all(out == ref))
            t = timeit(fn, win, idx)
            print(f"{name}: {t*1e3:7.2f} ms ({N*L*W/t/1e9:.2f} G elem/s) "
                  f"correct={ok}")
        except Exception as e:
            msg = str(e).split(chr(10))[0][:200]
            print(f"{name}: FAILED {type(e).__name__}: {msg}")


if __name__ == "__main__":
    main()
