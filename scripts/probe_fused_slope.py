"""Decompose the FUSED closed-loop iteration at bench shapes (B=4, NA=8,
FT=12): where do the ~64 ms/iter go?

Measures, each as pipelined-dispatch slope timing (queue N dependent
calls, one device fetch — the only honest protocol on this runtime,
PERF.md r3):

  fused_real   — the production fused loop (20 iters / wall)
  fused_noop   — same loop with an identity 'planner' (returns the decoded
                 ego row): decode+VJP+losses+Adam with zero planner cost
  rollout      — TpuRulePlanner.rollout_batch standalone, chunk in {8,16}
  others_phase — the ego-independent half alone (splines + fans + circles
                 for all 31 plan steps), chunk in {8,16}

planner-inside-loop cost = fused_real - fused_noop; ego-scan+resample =
rollout - others_phase. Prints one JSON line at the end.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def slope(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.time()
    out = None
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # real D2H fence
    return (time.time() - t0) / n


def main():
    from strive_tpu.data.synthetic import synthetic_scene_list
    from strive_tpu.maps import synthetic_map_store
    from strive_tpu.maps.lanegraph import synthetic_lanegraph
    from strive_tpu.model.traffic_model import NormConfig, TrafficModel
    from strive_tpu.normalize import att_normalizer_for, state_normalizer_for
    from strive_tpu.optim.adv import run_adv_gen_optim
    from strive_tpu.planners import PLANNER_CONFIGS, PlannerConfig
    from strive_tpu.planners import tpu_planner as tpl
    from strive_tpu.scene import pad_scene_arrays

    B, NA, PT, FT = 4, 8, 4, 12
    ITERS = 20
    cats = ("car", "truck")
    state_norm = state_normalizer_for(cats)
    att_norm = att_normalizer_for(cats)
    norm = NormConfig.from_normalizers(state_norm, att_norm)
    model = TrafficModel(npast=PT, nfuture=FT, map_obs_size_pix=256,
                         nclasses=2, norm=norm)
    store = synthetic_map_store(num_maps=2, size_px=2048, channels=4,
                                pix_per_m=4.0)
    lg = synthetic_lanegraph(extent_m=512.0, spacing_m=64.0)
    lane_graphs = {name: lg for name in store.map_names}
    scenes = synthetic_scene_list(num_scenes=B, num_maps=2, map_size_px=2048,
                                  PT=PT, FT=FT, min_agents=NA, max_agents=NA)
    scene = pad_scene_arrays(scenes, NA, 2)
    key = jax.random.PRNGKey(0)
    params = model.init(key, scene, store, key, method="forward")
    emb = jax.jit(lambda p, s: model.apply(p, s, store, method="embed"))(
        params, scene)
    prior = emb["prior_out"]
    z0 = prior[0]
    weights = {
        "adv_crash": 2.0, "motion_prior": 1.0, "motion_prior_atk": 0.005,
        "coll_veh": 20.0, "coll_veh_plan": 20.0, "coll_env": 20.0,
        "init_z": 0.5, "init_z_atk": 0.05, "match_ext": 10.0,
        "motion_prior_ext": 0.0001,
    }
    pc = PlannerConfig(**PLANNER_CONFIGS["default"])
    init_state = np.asarray(state_norm.unnormalize(scene.past_gt[:, :, -1]))
    lw_un = np.asarray(att_norm.unnormalize(scene.lw))
    mask_np = np.asarray(scene.mask)
    dt = 0.5
    res = {}
    only = os.environ.get("STRIVE_PROBE_SECTIONS", "noop,fused,rollout,others")
    only = {s.strip() for s in only.split(",")}

    def run_fused(pfn, pstate):
        out = run_adv_gen_optim(
            model, params, z0, 0.05, weights, scene, store, ITERS, emb,
            "hardcode", (prior[0][:, 0], prior[1][:, 0]), prior, 2, None,
            planner_rollout_fn=pfn, closed_loop_mode="fused",
            planner_state=pstate)
        _ = np.asarray(out[4])
        return None

    # --- fused_noop: identity planner, same two-arg contract --------------
    def noop_fn(future_pred_norm, pstate):
        return future_pred_norm[:, 0]

    times = [0.0] * 3
    if "noop" in only:
        t0 = time.time()
        run_fused(noop_fn, {"dummy": jnp.zeros(1)})
        print(f"fused_noop compile {time.time()-t0:.1f}s", flush=True)
        for i in range(3):
            t0 = time.time()
            run_fused(noop_fn, {"dummy": jnp.zeros(1)})
            times[i] = time.time() - t0
        res["fused_noop_ms_per_iter"] = float(np.median(times)) / ITERS * 1e3

    # --- fused_real --------------------------------------------------------
    for chunk in (8,) if "fused" in only else ():
        tp = tpl.TpuRulePlanner(lane_graphs, store.map_names, pc,
                                others_chunk=chunk)
        tp.reset(init_state, lw_un, mask_np, np.asarray(scene.map_idx))
        pfn = tp.make_fused_fn(state_norm, dt, FT)
        t0 = time.time()
        run_fused(pfn, tp.state)
        print(f"fused_real c{chunk} compile {time.time()-t0:.1f}s",
              flush=True)
        for i in range(3):
            t0 = time.time()
            run_fused(pfn, tp.state)
            times[i] = time.time() - t0
        res[f"fused_real_c{chunk}_ms_per_iter"] = \
            float(np.median(times)) / ITERS * 1e3

    # --- rollout standalone, chunk 8 vs 16 ---------------------------------
    obs_t = np.linspace(dt, dt * FT, FT).astype(np.float32)
    rng = np.random.default_rng(0)
    other_obs = np.repeat(init_state[:, :, None, (0, 1, 2, 3)], FT, axis=2)
    # drive others forward along their heading at their speed
    spd = init_state[:, :, 4]
    hx = np.cos(np.arctan2(init_state[:, :, 3], init_state[:, :, 2]))
    hy = np.sin(np.arctan2(init_state[:, :, 3], init_state[:, :, 2]))
    for ti, t in enumerate(obs_t):
        other_obs[:, :, ti, 0] = init_state[:, :, 0] + hx * spd * t
        other_obs[:, :, ti, 1] = init_state[:, :, 1] + hy * spd * t
        other_obs[:, :, ti, 2] = hx
        other_obs[:, :, ti, 3] = hy
    for chunk in (8, 16) if "rollout" in only else ():
        tp = tpl.TpuRulePlanner(lane_graphs, store.map_names, pc,
                                others_chunk=chunk)
        tp.reset(init_state, lw_un, mask_np, np.asarray(scene.map_idx))
        ms = slope(lambda: tp.rollout_batch(other_obs, obs_t, obs_t)) * 1e3
        res[f"rollout_c{chunk}_ms"] = round(ms, 2)
        print(f"rollout c{chunk}: {ms:.1f} ms", flush=True)

    # --- others phase standalone -------------------------------------------
    cfg0 = tpl.StaticPlanCfg.from_planner_config(pc)
    Tsteps = int(round(obs_t[-1] / cfg0.dt))

    def others_only(tables, cfg, init, lw, mask, other_obs_j, obs_tj):
        def one(i, l, m, o, mi):
            i = i.at[:, 3].set(jnp.maximum(i[:, 3], 0.0))
            h0 = jnp.stack([jnp.cos(i[:, 2]), jnp.sin(i[:, 2])], -1)
            obs = jnp.concatenate(
                [jnp.concatenate([i[:, :2], h0], -1)[:, None], o], axis=1)
            ts = jnp.concatenate([jnp.zeros(1), obs_tj])
            nanrow = jnp.isnan(obs).any(-1)
            first_nan = jnp.argmax(jnp.concatenate(
                [nanrow, jnp.ones((NA, 1), bool)], 1), axis=1)
            horizon = ts[jnp.maximum(first_nan - 1, 0)]
            obs = jnp.where(nanrow[..., None], 0.0, obs)
            t_grid = cfg.dt * jnp.arange(1, Tsteps + 1, dtype=jnp.float32)
            oo = jax.vmap(lambda a: tpl._interp_cols(t_grid, ts, obs[a]))(
                jnp.arange(NA)).transpose(1, 0, 2)
            pos_prev = jnp.concatenate([i[None, :, :2], oo[:-1, :, :2]], 0)
            ohd = jnp.arctan2(oo[..., 3], oo[..., 2])
            dxy = oo[..., :2] - pos_prev
            osp = jnp.hypot(dxy[..., 0], dxy[..., 1]) / cfg.dt
            osgn = jnp.where(dxy[..., 0] * oo[..., 2]
                             + dxy[..., 1] * oo[..., 3] >= 0, 1.0, -1.0)
            later = jnp.stack([oo[..., 0], oo[..., 1], ohd,
                               jnp.maximum(osgn * osp, 0.0)], -1)
            init4 = jnp.stack([i[:, 0], i[:, 1], i[:, 2],
                               jnp.maximum(i[:, 3], 0.0)], -1)
            state_all = jnp.concatenate([init4[None], later], axis=0)
            alive_later = m[None, :] & (t_grid[:, None]
                                        <= horizon[None, :] + 1e-6)
            alive_all = jnp.concatenate([m[None], alive_later], axis=0)
            return jax.lax.map(
                lambda sa: tpl._others_step_data(sa[0], sa[1], l[1:],
                                                 tables, cfg, mi),
                (state_all[:, 1:], alive_all[:, 1:]),
                batch_size=cfg.others_chunk)

        return jax.vmap(one)(init, lw, mask, other_obs_j,
                             jnp.zeros((B,), jnp.int32))

    init4b = np.stack([init_state[..., 0], init_state[..., 1],
                       np.arctan2(init_state[..., 3], init_state[..., 2]),
                       init_state[..., 4]], -1)
    for chunk in (8, 16) if "others" in only else ():
        cfg = cfg0._replace(others_chunk=chunk)
        tp = tpl.TpuRulePlanner(lane_graphs, store.map_names, pc,
                                others_chunk=chunk)
        # tables MUST be jit arguments (constant-captured tables take the
        # slow embedded-gather path), and the output MUST be reduced to
        # scalars on-device: fetching the raw (B, T1, 26, K, 5, 3) ocirc
        # through the remote D2H tunnel costs ~80 ms and swamps the
        # compute (the r5 first-cut probe measured 111-138 ms that way)
        fn = jax.jit(lambda tabs, i, l, m, o: jax.tree_util.tree_map(
            jnp.sum, others_only(tabs, cfg, i, l, m, o, jnp.asarray(obs_t))))
        ms = slope(fn, tp.tables, jnp.asarray(init4b), jnp.asarray(lw_un),
                   jnp.asarray(mask_np), jnp.asarray(other_obs)) * 1e3
        res[f"others_c{chunk}_ms"] = round(ms, 2)
        print(f"others c{chunk}: {ms:.1f} ms", flush=True)

    for k in list(res):
        res[k] = round(res[k], 2)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
