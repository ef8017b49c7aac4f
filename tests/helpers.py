"""Shared test fixtures: tiny scenes, map stores, and model configs."""

import numpy as np
import jax
import jax.numpy as jnp

from strive_tpu.maps import synthetic_map_store
from strive_tpu.model.traffic_model import TrafficModel, NormConfig
from strive_tpu.normalize import state_normalizer_for, att_normalizer_for
from strive_tpu.scene import SceneBatch, pad_scene_arrays

TEST_CATS = ("car", "truck")


def tiny_norm_config():
    return NormConfig.from_normalizers(
        state_normalizer_for(TEST_CATS), att_normalizer_for(TEST_CATS)
    )


def make_scene(rng, B=2, NA=4, PT=4, FT=6, NC=2, na_per_scene=None,
               map_center=64.0):
    """Random normalized scene batch with agents near the map center."""
    state_norm = state_normalizer_for(TEST_CATS)
    att_norm = att_normalizer_for(TEST_CATS)
    per_scene = []
    for b in range(B):
        na = na_per_scene[b] if na_per_scene else NA - (b % 2)
        h = rng.uniform(-np.pi, np.pi, size=(na,))
        xy0 = rng.uniform(map_center - 20, map_center + 20, size=(na, 2))
        speed = rng.uniform(0, 8, size=(na, 1))

        def traj(T, start_offset):
            ts = (np.arange(T) + start_offset)[None, :, None] * 0.5
            pos = xy0[:, None, :] + ts * speed[:, None, :] * np.stack(
                [np.cos(h), np.sin(h)], -1
            )[:, None, :]
            hx = np.broadcast_to(np.cos(h)[:, None, None], (na, T, 1))
            hy = np.broadcast_to(np.sin(h)[:, None, None], (na, T, 1))
            s = np.broadcast_to(speed[:, None, :], (na, T, 1))
            hdot = np.zeros((na, T, 1))
            return np.concatenate([pos, hx, hy, s, hdot], -1).astype(np.float32)

        past = traj(PT, -PT + 1)
        future = traj(FT, 1)
        sem = np.zeros((na, NC), np.float32)
        sem[np.arange(na), rng.integers(0, NC, na)] = 1.0
        lw = np.stack(
            [rng.uniform(4, 5.5, na), rng.uniform(1.8, 2.2, na)], -1
        ).astype(np.float32)
        per_scene.append(
            {
                "past": np.asarray(state_norm.normalize(past)),
                "past_vis": np.ones((na, PT), np.float32),
                "future": np.asarray(state_norm.normalize(future)),
                "future_vis": np.ones((na, FT), np.float32),
                "past_gt": np.asarray(state_norm.normalize(past)),
                "future_gt": np.asarray(state_norm.normalize(future)),
                "sem": sem,
                "lw": np.asarray(att_norm.normalize(lw)),
                "map_idx": b % 2,
            }
        )
    return pad_scene_arrays(per_scene, NA, NC)


def tiny_model(NC=2, FT=6, PT=4, map_px=64):
    return TrafficModel(
        npast=PT,
        nfuture=FT,
        map_obs_size_pix=map_px,
        nclasses=NC,
        norm=tiny_norm_config(),
        map_bounds=(-4.0, -8.0, 12.0, 8.0),
        conv_kernels=(5, 3, 3),
        conv_strides=(2, 2, 2),
        conv_filters=(8, 8, 16),
    )


def tiny_store():
    return synthetic_map_store(num_maps=2, size_px=512, channels=3)


def init_model(seed=0, **kw):
    rng = np.random.default_rng(seed)
    scene = make_scene(rng, **{k: v for k, v in kw.items() if k in
                               ("B", "NA", "PT", "FT", "NC", "na_per_scene")})
    model = tiny_model(FT=scene.FT or 6, PT=scene.PT)
    store = tiny_store()
    key = jax.random.PRNGKey(seed)
    params = model.init(key, scene, store, key, method="forward")
    return model, params, scene, store
