"""Closed-loop planner benchmark: host phase-A vs fused TPU phase-B.

Times the closed-loop adversarial optimization (planner re-rolled every
Adam iteration, the reference-exact refresh) with:

- the host numpy planner between jitted chunks (phase A), and
- the device planner traced into ONE compiled loop (phase B, zero hops).

Prints steady-state iters/sec for both (median of 3 after warmup).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def main():
    from strive_tpu.data.synthetic import synthetic_scene_list
    from strive_tpu.maps import synthetic_map_store
    from strive_tpu.maps.lanegraph import synthetic_lanegraph
    from strive_tpu.model.traffic_model import init_model_params, NormConfig, TrafficModel
    from strive_tpu.normalize import att_normalizer_for, state_normalizer_for
    from strive_tpu.optim.adv import run_adv_gen_optim
    from strive_tpu.planners import PLANNER_CONFIGS, PlannerConfig, RulePlanner
    from strive_tpu.planners.host_bridge import make_planner_host_fn
    from strive_tpu.planners.tpu_planner import TpuRulePlanner
    from strive_tpu.scene import pad_scene_arrays

    B = int(os.environ.get("STRIVE_BENCH_B", "4"))
    NA = int(os.environ.get("STRIVE_BENCH_NA", "8"))
    PT, FT = 4, 12
    ITERS = int(os.environ.get("STRIVE_BENCH_ITERS", "20"))
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
    params = init_model_params(model, scene, store, key)
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

    def run_mode(mode):
        pstate = None
        if mode.startswith("tpu"):
            tp = TpuRulePlanner(
                lane_graphs, store.map_names, pc,
                others_chunk=int(os.environ.get("STRIVE_BENCH_CHUNK", "8")))
            tp.reset(init_state, lw_un, mask_np, np.asarray(scene.map_idx))
            pfn = tp.make_fused_fn(state_norm, dt, FT)
            pstate = tp.state
            # fused inlines the device planner into ONE compiled loop —
            # fastest since the r3 gather purge (PERF.md r4)
            clm = "fused" if mode == "tpu-fused" else "chunked"
        else:
            planner = RulePlanner(lane_graphs, store.map_names, pc)
            flat_states, flat_lw, batch_of = [], [], []
            for b in range(B):
                n = int(mask_np[b].sum())
                flat_states.append(init_state[b, :n])
                flat_lw.append(lw_un[b, :n])
                batch_of.extend([b] * n)
            planner.reset(np.concatenate(flat_states),
                          np.concatenate(flat_lw),
                          np.array(batch_of), B, np.asarray(scene.map_idx))
            pfn = make_planner_host_fn(planner, scene.mask, state_norm, dt,
                                       FT)
            clm = "chunked"

        def once():
            out = run_adv_gen_optim(
                model, params, z0, 0.05, weights, scene, store, ITERS, emb,
                "hardcode", (prior[0][:, 0], prior[1][:, 0]), prior, 2,
                None, planner_rollout_fn=pfn, closed_loop_mode=clm,
                planner_state=pstate,
                planner_refresh_every=int(
                    os.environ.get("STRIVE_BENCH_REFRESH", "1")))
            # block_until_ready returns before remote execution finishes on
            # this runtime (bench.py / PERF.md r3); a real device->host
            # fetch is the only honest fence.
            _ = np.asarray(out[1])

        t0 = time.time()
        once()
        compile_s = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            once()
            times.append(time.time() - t0)
        med = float(np.median(times))
        print(f"{mode:5s}: {ITERS} closed-loop iters in {med:.2f}s "
              f"({ITERS/med:.2f} it/s; first call incl. compile "
              f"{compile_s:.1f}s)")
        return ITERS / med

    modes_env = os.environ.get("STRIVE_BENCH_MODES")
    if modes_env:
        # e.g. STRIVE_BENCH_MODES=fused or host,tpu-chunked,tpu-fused
        for m in modes_env.split(","):
            m = m.strip()
            run_mode("tpu-fused" if m == "fused" else m)
        return
    host = run_mode("host")
    tpu = run_mode("tpu-chunked")
    print(f"device-planner speedup vs host: {tpu/host:.1f}x")
    if os.environ.get("STRIVE_BENCH_FUSED"):
        fused = run_mode("tpu-fused")
        print(f"fused vs chunked: {fused/tpu:.2f}x")


if __name__ == "__main__":
    main()
