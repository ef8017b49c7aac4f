"""HBM ceiling study for the FUSED closed loop (VERDICT r4 item 4).

The fused adversarial optimization traces the phase-B planner into one
compiled program; its others-phase transients scale with
B x others_chunk, and B=4 x chunk=16 crashed the remote TPU worker in r3
(CLAUDE.md). Executing risky configs costs a 1h+ device outage, so this
probe never runs them: it captures the jitted ``run_full`` program via a
``cached_runner`` interception, AOT-compiles it with
``.lower(...).compile()`` and reads ``memory_analysis()`` — peak temp +
argument + output HBM — for a (B, NA, others_chunk) grid. Compile-only:
safe on the live chip.

Prints one JSON line per config:
  {"B":4,"NA":8,"chunk":8,"temp_mb":...,"arg_mb":...,"peak_mb":...}

Reference scale context: ``adv_gen_optim.py:105-175`` (the optimization),
``hardcode_goalcond_nusc.py:178-276`` (the per-iteration planner re-roll).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


class _Captured(Exception):
    pass


def build_case(B, NA, chunk, iters=20):
    from strive_tpu.data.synthetic import synthetic_scene_list
    from strive_tpu.maps import synthetic_map_store
    from strive_tpu.maps.lanegraph import synthetic_lanegraph
    from strive_tpu.model.traffic_model import NormConfig, TrafficModel
    from strive_tpu.normalize import att_normalizer_for, state_normalizer_for
    from strive_tpu.optim import adv as advmod
    from strive_tpu.planners import PLANNER_CONFIGS, PlannerConfig
    from strive_tpu.planners.tpu_planner import TpuRulePlanner
    from strive_tpu.scene import pad_scene_arrays

    PT, FT = 4, 12
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
    tp = TpuRulePlanner(lane_graphs, store.map_names, pc, others_chunk=chunk)
    init_state = np.asarray(state_norm.unnormalize(scene.past_gt[:, :, -1]))
    lw_un = np.asarray(att_norm.unnormalize(scene.lw))
    tp.reset(init_state, lw_un, np.asarray(scene.mask),
             np.asarray(scene.map_idx))
    pfn = tp.make_fused_fn(state_norm, 0.5, FT)

    # capture the jitted run_full + its exact arguments WITHOUT executing:
    # wrap cached_runner to hand the fns dict back through an exception.
    box = {}
    real = advmod.cached_runner

    def intercept(name, anchors, statics, builder):
        fns = real(name, anchors, statics, builder)
        box["fns"] = fns
        raise _Captured()

    advmod.cached_runner = intercept
    try:
        advmod.run_adv_gen_optim(
            model, params, z0, 0.05, weights, scene, store, iters, emb,
            "hardcode", (prior[0][:, 0], prior[1][:, 0]), prior, 2, None,
            planner_rollout_fn=pfn, closed_loop_mode="fused",
            planner_state=tp.state)
    except _Captured:
        pass
    finally:
        advmod.cached_runner = real

    opt_vars0 = {"tgt": z0[:, 0], "other": z0}
    args = (opt_vars0, scene, store, emb, (prior[0][:, 0], prior[1][:, 0]),
            prior, jax.lax.stop_gradient(z0), None, None, None, tp.state)
    return box["fns"]["run_full"], args


def analyze(B, NA, chunk):
    run_full, args = build_case(B, NA, chunk)
    compiled = run_full.lower(*args).compile()
    ma = compiled.memory_analysis()
    mb = 1.0 / (1024 * 1024)
    out = {
        "B": B, "NA": NA, "chunk": chunk,
        "temp_mb": round(ma.temp_size_in_bytes * mb, 1),
        "arg_mb": round(ma.argument_size_in_bytes * mb, 1),
        "out_mb": round(ma.output_size_in_bytes * mb, 1),
        "peak_mb": round((ma.temp_size_in_bytes + ma.argument_size_in_bytes
                          + ma.output_size_in_bytes) * mb, 1),
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    grid = os.environ.get(
        "STRIVE_HBM_GRID",
        "4,8,8 4,8,16 8,8,4 8,8,8 4,16,8 4,16,16 8,16,4")
    for spec in grid.split():
        B, NA, chunk = (int(v) for v in spec.split(","))
        try:
            analyze(B, NA, chunk)
        except Exception as e:  # compile OOM shows up as an error too
            print(json.dumps({"B": B, "NA": NA, "chunk": chunk,
                              "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
