"""Micro-profile of the rollout hot path: crop gather, CNN, GNN, decode,
grad step. Run on the TPU to see where adversarial-optimization time goes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    from strive_tpu.maps import synthetic_map_store
    from strive_tpu.maps.queries import get_map_crop
    from strive_tpu.model.cnn import MapEncoder
    from strive_tpu.model.interaction import SceneInteractionNet
    from strive_tpu.model.traffic_model import NormConfig, TrafficModel
    from strive_tpu.normalize import att_normalizer_for, state_normalizer_for
    from strive_tpu.data.synthetic import synthetic_scene_list
    from strive_tpu.scene import pad_scene_arrays

    B, NA, PT, FT = 4, 8, 4, 12
    N = B * NA
    store = synthetic_map_store(num_maps=2, size_px=2048, channels=4)
    rng = np.random.default_rng(0)
    pos = jnp.asarray(
        np.concatenate(
            [rng.uniform(100, 400, (N, 2)), rng.normal(size=(N, 2))], axis=1
        ).astype(np.float32)
    )
    mapix = jnp.asarray(rng.integers(0, 2, N).astype(np.int32))
    bounds = (-17.0, -38.5, 60.0, 38.5)

    crop_unpacked = jax.jit(lambda p: get_map_crop(
        store.raster, store.dx, p, mapix, bounds))
    crop_packed = jax.jit(lambda p: get_map_crop(
        store.raster, store.dx, p, mapix, bounds, packed=store.packed,
                     min_dx=store.min_dx_m))
    t_up = timeit(crop_unpacked, pos)
    t_p = timeit(crop_packed, pos)
    print(f"crop {N} agents 256x256x4: XLA-gather path {t_up*1e3:.1f} ms, "
          f"one-hot kernel path {t_p*1e3:.1f} ms")

    enc = MapEncoder(64)
    crop = crop_packed(pos)
    ep = enc.init(jax.random.PRNGKey(0), crop)
    cnn = jax.jit(lambda c: enc.apply(ep, c))
    print(f"map CNN {N} crops: {timeit(cnn, crop)*1e3:.1f} ms")

    gnn = SceneInteractionNet(128, 2)
    x = jnp.asarray(rng.normal(size=(B, NA, 162)).astype(np.float32))
    gpos = jnp.asarray(rng.normal(size=(B, NA, 4)).astype(np.float32))
    sem = jnp.zeros((B, NA, 2))
    mask = jnp.ones((B, NA), bool)
    gp = gnn.init(jax.random.PRNGKey(0), x, gpos, sem, mask)
    g = jax.jit(lambda xx: gnn.apply(gp, xx, gpos, sem, mask))
    print(f"interaction net: {timeit(g, x)*1e3:.1f} ms")

    cats = ("car", "truck")
    norm = NormConfig.from_normalizers(state_normalizer_for(cats),
                                       att_normalizer_for(cats))
    model = TrafficModel(npast=PT, nfuture=FT, map_obs_size_pix=256,
                         nclasses=2, norm=norm)
    scenes = synthetic_scene_list(num_scenes=B, num_maps=2, map_size_px=2048,
                                  PT=PT, FT=FT, min_agents=NA, max_agents=NA)
    scene = pad_scene_arrays(scenes, NA, 2)
    key = jax.random.PRNGKey(0)
    params = model.init(key, scene, store, key, method="forward")
    emb = jax.jit(lambda p, s: model.apply(p, s, store, method="embed"))(
        params, scene)
    z = emb["prior_out"][0]

    dec = jax.jit(lambda zz: model.apply(
        params, zz, emb, scene, store, method="decode_embedding")
        ["future_pred"])
    t_dec = timeit(dec, z, n=5)
    print(f"decode rollout (FT={FT}): {t_dec*1e3:.1f} ms  "
          f"({B*NA*FT/t_dec:.0f} agent-steps/s)")

    def loss(zz):
        fp = model.apply(params, zz, emb, scene, store,
                         method="decode_embedding")["future_pred"]
        return jnp.sum(fp ** 2)

    gradfn = jax.jit(jax.grad(loss))
    t_g = timeit(gradfn, z, n=5)
    print(f"decode + grad: {t_g*1e3:.1f} ms")


if __name__ == "__main__":
    main()
