"""Standalone phase-B planner rollout timing (no model, low HBM).

Measures TpuRulePlanner.rollout_batch wall time at the closed-loop bench
shape (B=4, NA=8, FT=12 -> 31 plan steps) with pipelined dispatch + one
D2H fence (the honest protocol from PERF.md r3: block_until_ready returns
early on this runtime).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from strive_tpu.data.synthetic import synthetic_scene_list
    from strive_tpu.maps import synthetic_map_store
    from strive_tpu.maps.lanegraph import synthetic_lanegraph
    from strive_tpu.normalize import att_normalizer_for, state_normalizer_for
    from strive_tpu.planners import PLANNER_CONFIGS, PlannerConfig
    from strive_tpu.planners.tpu_planner import TpuRulePlanner
    from strive_tpu.scene import pad_scene_arrays

    B = int(os.environ.get("STRIVE_BENCH_B", "4"))
    NA = int(os.environ.get("STRIVE_BENCH_NA", "8"))
    PT, FT = 4, 12
    REPS = int(os.environ.get("STRIVE_BENCH_REPS", "20"))
    cats = ("car", "truck")
    state_norm = state_normalizer_for(cats)
    att_norm = att_normalizer_for(cats)
    store = synthetic_map_store(num_maps=2, size_px=2048, channels=4,
                                pix_per_m=4.0)
    lg = synthetic_lanegraph(extent_m=512.0, spacing_m=64.0)
    lane_graphs = {name: lg for name in store.map_names}
    scenes = synthetic_scene_list(num_scenes=B, num_maps=2, map_size_px=2048,
                                  PT=PT, FT=FT, min_agents=NA, max_agents=NA)
    scene = pad_scene_arrays(scenes, NA, 2)

    pc = PlannerConfig(**PLANNER_CONFIGS["default"])
    tp = TpuRulePlanner(lane_graphs, store.map_names, pc)
    init_state = np.asarray(state_norm.unnormalize(scene.past_gt[:, :, -1]))
    lw_un = np.asarray(att_norm.unnormalize(scene.lw))
    tp.reset(init_state, lw_un, np.asarray(scene.mask),
             np.asarray(scene.map_idx))
    dt = 0.5
    obs = np.asarray(state_norm.unnormalize(scene.future_gt[..., :4]))
    obs_t = np.linspace(dt, dt * FT, FT)

    t0 = time.time()
    out = tp.rollout_batch(obs, obs_t, obs_t)
    _ = np.asarray(out)
    print(f"compile+first: {time.time() - t0:.1f}s")

    meds = []
    for _ in range(3):
        t0 = time.time()
        o = None
        for _ in range(REPS):
            o = tp.rollout_batch(obs, obs_t, obs_t)
        _ = np.asarray(o)  # one honest D2H fence after REPS dispatches
        meds.append((time.time() - t0) / REPS)
    ms = float(np.median(meds)) * 1e3
    print(f"rollout_batch (B={B}, NA={NA}, FT={FT}): {ms:.1f} ms "
          f"(median of 3 x {REPS} pipelined)")


if __name__ == "__main__":
    main()
