"""Synthetic scene generation for tests, benchmarks, and smoke training.

Generates kinematically consistent agent trajectories on the synthetic map
store's road grid. This stands in for nuScenes when the devkit/data are
unavailable (the real ETL lives in ``strive_tpu.data.etl``); the arrays have
exactly the shapes and normalization the real pipeline produces.
"""

from __future__ import annotations

import numpy as np

from ..normalize import state_normalizer_for, att_normalizer_for


def _simulate_bicycle(x0, y0, h0, s0, a_prof, ddh_prof, dt=0.5, L=4.8):
    """Tiny host-side bicycle sim to fabricate consistent trajectories."""
    T = len(a_prof)
    xs = np.zeros((T, 6))
    x, y, h, s, hdot = x0, y0, h0, s0, 0.0
    for t in range(T):
        hdot = np.clip(hdot + ddh_prof[t] * dt, -2 * np.pi, 2 * np.pi)
        h = h + dt * abs(s) / L * hdot
        s = np.clip(s + a_prof[t] * dt, 0.0, 50.0)
        y = y + s * np.sin(h) * dt
        x = x + s * np.cos(h) * dt
        xs[t] = (x, y, np.cos(h), np.sin(h), s, hdot)
    return xs


def synthetic_scene_list(num_scenes=8, num_maps=2, map_size_px=512,
                         pix_per_m=4.0, PT=4, FT=12, NC=2, min_agents=2,
                         max_agents=8, seed=0, categories=("car", "truck")):
    """List of per-scene dicts (normalized) compatible with pad_scene_arrays."""
    rng = np.random.default_rng(seed)
    state_norm = state_normalizer_for(categories)
    att_norm = att_normalizer_for(categories)
    extent_m = map_size_px / pix_per_m
    # per-category footprint + speed profiles so multi-category runs
    # (all-cats / cyclist-attacker configs) see realistic geometry;
    # unknown categories fall back to car-like
    cat_prof = {
        "car": ((4.2, 5.5), (1.8, 2.2), 10.0),
        "truck": ((6.0, 10.0), (2.2, 2.9), 9.0),
        "motorcycle": ((1.8, 2.4), (0.6, 0.9), 10.0),
        "cyclist": ((1.5, 2.0), (0.5, 0.8), 6.0),
        "pedestrian": ((0.5, 1.0), (0.5, 1.0), 2.0),
    }
    cats = list(categories)[:NC] + ["car"] * max(0, NC - len(categories))
    scenes = []
    for i in range(num_scenes):
        na = int(rng.integers(min_agents, max_agents + 1))
        past = np.zeros((na, PT, 6), np.float32)
        fut = np.zeros((na, FT, 6), np.float32)
        cat_ix = rng.integers(0, NC, na)
        if "car" in cats:
            cat_ix[0] = cats.index("car")  # ego (agent 0) is the ego CAR
        lw = np.zeros((na, 2), np.float32)
        for a in range(na):
            (l_lo, l_hi), (w_lo, w_hi), smax = cat_prof.get(
                cats[cat_ix[a]], cat_prof["car"])
            lw[a] = (rng.uniform(l_lo, l_hi), rng.uniform(w_lo, w_hi))
            x0 = rng.uniform(0.3, 0.7) * extent_m
            y0 = rng.uniform(0.3, 0.7) * extent_m
            h0 = rng.uniform(-np.pi, np.pi)
            s0 = rng.uniform(0.0, smax)
            a_prof = rng.normal(0.3, 0.8, PT + FT)
            ddh_prof = rng.normal(0.0, 0.05, PT + FT)
            traj = _simulate_bicycle(x0, y0, h0, s0, a_prof, ddh_prof,
                                     L=float(lw[a, 0]))
            past[a] = traj[:PT]
            fut[a] = traj[PT:]
        sem = np.zeros((na, NC), np.float32)
        sem[np.arange(na), cat_ix] = 1.0
        past_n = np.asarray(state_norm.normalize(past))
        fut_n = np.asarray(state_norm.normalize(fut))
        scenes.append({
            "past": past_n,
            "past_vis": np.ones((na, PT), np.float32),
            "future": fut_n,
            "future_vis": np.ones((na, FT), np.float32),
            "past_gt": past_n.copy(),
            "future_gt": fut_n.copy(),
            "sem": sem,
            "lw": np.asarray(att_norm.normalize(lw)),
            "map_idx": int(rng.integers(0, num_maps)),
        })
    return scenes
