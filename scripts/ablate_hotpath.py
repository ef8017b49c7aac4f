"""Diagnostic: how much of the adv-optim iteration is the in-loop map
re-encode (crop gather + CNN)? Times a full grad step with and without it.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import strive_tpu.model.traffic_model as tm
    from strive_tpu.maps import synthetic_map_store
    from strive_tpu.model.traffic_model import NormConfig, TrafficModel
    from strive_tpu.normalize import att_normalizer_for, state_normalizer_for
    from strive_tpu.data.synthetic import synthetic_scene_list
    from strive_tpu.scene import pad_scene_arrays

    B, NA, PT, FT = 4, 8, 4, 12
    cats = ("car", "truck")
    norm = NormConfig.from_normalizers(state_normalizer_for(cats),
                                       att_normalizer_for(cats))
    store = synthetic_map_store(num_maps=2, size_px=2048, channels=4)
    scenes = synthetic_scene_list(num_scenes=B, num_maps=2, map_size_px=2048,
                                  PT=PT, FT=FT, min_agents=NA, max_agents=NA)
    scene = pad_scene_arrays(scenes, NA, 2)
    key = jax.random.PRNGKey(0)

    def measure(label):
        model = TrafficModel(npast=PT, nfuture=FT, map_obs_size_pix=256,
                             nclasses=2, norm=norm)
        params = model.init(key, scene, store, key, method="forward")
        emb = jax.jit(lambda p, s: model.apply(p, s, store, method="embed"))(
            params, scene)
        z0 = emb["prior_out"][0]

        def loss(z):
            fp = model.apply(params, z, emb, scene, store,
                             method="decode_embedding")["future_pred"]
            return jnp.sum(fp ** 2)

        g = jax.jit(jax.grad(loss))
        jax.block_until_ready(g(z0))
        t0 = time.time()
        for _ in range(10):
            out = g(z0)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / 10
        print(f"{label}: {dt*1e3:.1f} ms / decode+grad")
        return dt

    t_full = measure("full (map re-encode in loop)")

    # monkeypatch: freeze the map feature inside the rollout
    orig = tm._make_decode_step

    def patched(has_ext, substeps=1):
        step = orig(has_ext, substeps)

        def wrapper(mdl, carry, consts, ext_t):
            new_carry, out = step(mdl, carry, consts, ext_t)
            # reuse the initial map feature instead of the recomputed one
            return new_carry[:4] + (carry[4],), out

        return wrapper

    tm._make_decode_step = patched
    t_nomap = measure("ablated (frozen map feature)")
    tm._make_decode_step = orig

    # variant: keep the crop GATHER alive but skip the CNN — isolates
    # gather cost from conv cost
    from strive_tpu.maps.queries import get_map_crop

    def gather_only(has_ext, substeps=1):
        step = orig(has_ext, substeps)

        def wrapper(mdl, carry, consts, ext_t):
            sem, lw, z, veh_len, mask, map_idx, map_store = consts
            new_carry, out = step(mdl, carry, consts, ext_t)
            Bc, NAc = sem.shape[:2]
            pos = jax.lax.stop_gradient(new_carry[3]).reshape(Bc * NAc, 4)
            pos = pos * jnp.asarray(mdl.norm.state_std[:4]) + jnp.asarray(
                mdl.norm.state_mean[:4])
            crop = get_map_crop(map_store.raster, map_store.dx, pos,
                                jnp.repeat(map_idx, NAc), mdl.map_bounds,
                                L=256, W=256, packed=map_store.packed)
            keep_alive = jnp.mean(crop) * 0.0
            new_map = carry[4] + keep_alive
            return new_carry[:4] + (new_map,), out

        return wrapper

    tm._make_decode_step = gather_only
    t_gather = measure("XLA-gather path, no CNN (pre-kernel baseline)")
    tm._make_decode_step = orig

    print(f"in-loop map encode share: {100*(1 - t_nomap/t_full):.0f}%")
    print(f"  gather: {(t_gather - t_nomap)*1e3:.1f} ms, "
          f"CNN: {(t_full - t_gather)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
