"""Measure alternative formulations of the rotated-crop gather on TPU.

The crop gather dominates rollout time (~98%); this probes which XLA
gather lowering is fastest: flat 1-D take on uint8, int32 table, 3-D
advanced indexing, per-agent windowed gather after dynamic_slice.
"""

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


def main():
    N, L, W = 32, 256, 256
    H = Wp = 2048
    M = 2
    rng = np.random.default_rng(0)
    packed_u8 = jnp.asarray(rng.integers(0, 16, (M, H, Wp)).astype(np.uint8))
    packed_i32 = packed_u8.astype(jnp.int32)
    packed_f32 = packed_u8.astype(jnp.float32)

    py = jnp.asarray(rng.integers(0, H, (N, L, W)).astype(np.int32))
    px = jnp.asarray(rng.integers(0, Wp, (N, L, W)).astype(np.int32))
    mapix = jnp.asarray(rng.integers(0, M, N).astype(np.int32))

    def flat_u8(py, px):
        flat_idx = (mapix[:, None, None] * H + py) * Wp + px
        return jnp.take(packed_u8.reshape(-1), flat_idx, mode="clip")

    def flat_i32(py, px):
        flat_idx = (mapix[:, None, None] * H + py) * Wp + px
        return jnp.take(packed_i32.reshape(-1), flat_idx, mode="clip")

    def flat_f32(py, px):
        flat_idx = (mapix[:, None, None] * H + py) * Wp + px
        return jnp.take(packed_f32.reshape(-1), flat_idx, mode="clip")

    def adv_idx(py, px):
        return packed_u8[mapix[:, None, None], py, px]

    def row_then_col(py, px):
        # gather rows per (agent, i): uses the fact that each output row
        # needs <= L distinct raster rows
        flat_rows = packed_u8.reshape(M * H, Wp)
        rows = jnp.take(flat_rows, mapix[:, None, None] * H + py[:, :, 0:1],
                        axis=0, mode="clip")  # WRONG shape probe; skip
        return rows

    def windowed(py, px):
        # per-agent dynamic_slice of a 640x640 window, then local gather
        y0 = jnp.clip(jnp.min(py.reshape(N, -1), 1), 0, H - 640)
        x0 = jnp.clip(jnp.min(px.reshape(N, -1), 1), 0, Wp - 640)

        def one(m, yy, xx, pyl, pxl):
            win = jax.lax.dynamic_slice(packed_u8[m], (yy, xx), (640, 640))
            idx = jnp.clip(pyl - yy, 0, 639) * 640 + jnp.clip(pxl - xx, 0, 639)
            return jnp.take(win.reshape(-1), idx, mode="clip")

        return jax.vmap(one)(mapix, y0, x0, py, px)

    for name, fn in [("flat_u8", flat_u8), ("flat_i32", flat_i32),
                     ("flat_f32", flat_f32), ("adv_idx", adv_idx),
                     ("windowed", windowed)]:
        try:
            t = timeit(jax.jit(fn), py, px)
            elems = N * L * W
            print(f"{name}: {t*1e3:7.2f} ms  ({elems/t/1e9:.2f} G elem/s)")
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
