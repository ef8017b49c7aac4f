"""Quantitative + qualitative evaluation of generated adversarial scenarios
(reference ``eval_adv_gen.py``).

Quant: per-scenario and aggregate metrics over the result-taxonomy dirs —
success rates, collision geometry/velocity, pre-crash plausibility
(vehicle/env collision rates among non-ego agents), latent log-likelihoods
under the saved prior, solution kinematics; optional cluster labels from a
cluster.pkl. Qual: re-render scenarios at high resolution.
"""

import csv
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from strive_tpu.data.loading import load_environment
from strive_tpu.data.scenario_json import read_adv_scenes
from strive_tpu.geometry import interp_traj
from strive_tpu.losses.common import log_normal
from strive_tpu.losses.metrics import (
    check_pairwise_veh_coll,
    check_single_veh_coll,
)
from strive_tpu.utils.config import add_base_args, get_parser
from strive_tpu.utils.logger import Logger, mkdir
from strive_tpu.viz import get_adv_coloring, render_scene

# canonical metric names (reference utils/scenario_gen.py:110-118)
METRIC_NAMES = [
    "planner_coll_atk", "planner_coll_others", "adv_success",
    "planner_coll_h", "planner_coll_ang", "veh_coll_rate", "env_coll_atk",
    "z_ll_atk", "z_ll_others", "sol_coll_others", "sol_success", "sol_z_ll",
    "sol_vel_mean", "sol_vel_max", "sol_acc_mean", "sol_acc_max",
]


def parse_cfg(argv=None):
    parser = get_parser("Evaluate adversarial scenario generation")
    parser = add_base_args(parser)
    parser.add_argument("--scenario_root", type=str, required=True,
                        help="dir containing adv_sol_success/sol_failed/"
                             "adv_failed subdirs")
    parser.add_argument("--eval_quant", action="store_true", default=False)
    parser.add_argument("--eval_qual", action="store_true", default=False)
    parser.add_argument("--cluster_pkl", type=str, default=None)
    parser.add_argument("--synth_scenes", type=int, default=4)
    return parser.parse(argv)


def scenario_metrics(sc, dt):
    """Per-scenario quant metrics from a saved JSON dict."""
    import jax.numpy as jnp

    m = {}
    fut = np.asarray(sc["scene_fut"])  # (NA, FT, >=4)
    lw = np.asarray(sc["veh_att"])
    NA, FT = fut.shape[:2]
    plan = fut[0, :, :4]
    others = fut[1:, :, :4]

    pl_i = np.asarray(interp_traj(jnp.asarray(plan)[None], 3))[0]
    ot_i = np.asarray(interp_traj(jnp.asarray(others), 3))
    coll, coll_t = check_single_veh_coll(pl_i, lw[0], ot_i, lw[1:])
    atk = sc.get("attack_agt")
    m["planner_coll_atk"] = (float(coll[atk - 1]) if atk is not None
                             and 1 <= atk <= NA - 1 else float(coll.any()))
    m["planner_coll_others"] = float(
        (coll.sum() - (coll[atk - 1] if atk else 0)) > 0)
    m["adv_success"] = m["planner_coll_atk"]

    if coll.any():
        first = int(np.argmin(coll_t))
        t = int(coll_t[first])
        atk_h = ot_i[first, t, 2:4]
        pl_h = pl_i[t, 2:4]
        cosang = np.clip(np.dot(atk_h, pl_h), -1, 1)
        m["planner_coll_h"] = float(np.degrees(np.arccos(cosang)))
        d = ot_i[first, t, :2] - pl_i[t, :2]
        d = d / max(np.linalg.norm(d), 1e-9)
        m["planner_coll_ang"] = float(np.degrees(np.arctan2(d[1], d[0])))
        crash_idx = int(t / 3)
    else:
        crash_idx = FT - 1

    # plausibility: collisions among non-ego agents BEFORE the crash
    if NA > 2 and crash_idx > 0:
        res = check_pairwise_veh_coll(others[:, :crash_idx + 1], lw[1:])
        m["veh_coll_rate"] = res["num_coll_veh"] / max(res["num_traj_veh"], 1)

    # latent likelihoods under the saved prior
    if "z_adv" in sc and "z_prior" in sc:
        z = np.asarray(sc["z_adv"])
        mu = sc["z_prior"]["mean"]
        var = sc["z_prior"]["var"]
        ll = np.asarray(log_normal(z, mu, var))
        if atk is not None and 1 <= atk < NA:
            m["z_ll_atk"] = float(ll[atk])
            m["z_ll_others"] = float(np.mean(np.delete(ll[1:], atk - 1))) \
                if NA > 2 else np.nan
        else:
            m["z_ll_others"] = float(np.mean(ll[1:]))

    # solution metrics
    if "scene_sol" in sc:
        sol = np.asarray(sc["scene_sol"])[0, :, :4]
        sol_i = np.asarray(interp_traj(jnp.asarray(sol)[None], 3))[0]
        scoll, _ = check_single_veh_coll(sol_i, lw[0], ot_i, lw[1:])
        m["sol_coll_others"] = float(scoll.any())
        m["sol_success"] = float(~scoll.any())
        vel = np.linalg.norm(np.diff(sol[:, :2], axis=0), axis=-1) / dt
        acc = np.abs(np.diff(vel)) / dt
        m["sol_vel_mean"] = float(vel.mean())
        m["sol_vel_max"] = float(vel.max())
        if len(acc):
            m["sol_acc_mean"] = float(acc.mean())
            m["sol_acc_max"] = float(acc.max())
    return m


def main(argv=None):
    cfg = parse_cfg(argv)
    cfg.out = cfg.out + "_" + str(int(time.time()))
    mkdir(cfg.out)
    Logger.init(os.path.join(cfg.out, "eval_adv_gen_log.txt"))

    taxonomy = ["adv_sol_success", "sol_failed", "adv_failed"]
    all_scenes = {}
    for t in taxonomy:
        d = os.path.join(cfg.scenario_root, t)
        all_scenes[t] = read_adv_scenes(d) if os.path.isdir(d) else []
        Logger.log(f"{t}: {len(all_scenes[t])} scenarios")

    n_total = sum(len(v) for v in all_scenes.values())
    n_adv = len(all_scenes["adv_sol_success"]) + len(all_scenes["sol_failed"])
    n_sol = len(all_scenes["adv_sol_success"])
    Logger.log("adv success rate = %f" % (n_adv / max(n_total, 1)))
    Logger.log("sol success rate (of adv successes) = %f"
               % (n_sol / max(n_adv, 1)))

    clustering = None
    if cfg.cluster_pkl:
        with open(cfg.cluster_pkl, "rb") as f:
            clustering = pickle.load(f)

    if cfg.eval_quant:
        from cluster_scenarios import compute_coll_feat

        rows, names = [], []
        for t in taxonomy:
            for sc in all_scenes[t]:
                m = scenario_metrics(sc, sc.get("dt", 0.5))
                m["taxonomy"] = t
                if clustering is not None:
                    f = compute_coll_feat(np.asarray(sc["veh_att"]),
                                          np.asarray(sc["scene_fut"]),
                                          sc.get("dt", 0.5))
                    if f is not None:
                        X = np.array(f["angvec"] + f["hvec"])[None]
                        m["cluster_label"] = int(clustering.predict(X)[0])
                rows.append(m)
                names.append(f"{t}/{sc['name']}")
        csv_path = os.path.join(cfg.out, "per_seq_results.csv")
        keys = sorted({k for r in rows for k in r})
        with open(csv_path, "w") as f:
            w = csv.writer(f)
            w.writerow(["scene"] + keys)
            for name, r in zip(names, rows):
                w.writerow([name] + [r.get(k, np.nan) for k in keys])
        Logger.log("==== aggregate quant metrics ====")
        agg = {}
        for r in rows:
            for k, v in r.items():
                if isinstance(v, float) and not np.isnan(v):
                    agg.setdefault(k, []).append(v)
        with open(os.path.join(cfg.out, "total_results.csv"), "w") as f:
            w = csv.writer(f)
            w.writerow(["metric", "mean", "count"])
            for k in sorted(agg):
                Logger.log("%s = %f (n=%d)" % (k, np.mean(agg[k]),
                                               len(agg[k])))
                w.writerow([k, np.mean(agg[k]), len(agg[k])])

    if cfg.eval_qual:
        _, store, _, _, _ = load_environment(cfg, "val")
        for t in taxonomy:
            for sc in all_scenes[t]:
                map_idx = (store.map_names.index(sc["map"])
                           if sc["map"] in store.map_names else 0)
                NA = sc["scene_past"].shape[0]
                render_scene(
                    os.path.join(cfg.out, "qual", t, sc["name"] + ".jpg"),
                    store, map_idx, sc["scene_past"],
                    sc["scene_fut"][:, :, :4], sc["veh_att"],
                    np.ones(NA, bool),
                    car_colors=get_adv_coloring(NA, sc.get("attack_agt"), 0),
                    title=f"{t}/{sc['name']}",
                )
    return all_scenes


if __name__ == "__main__":
    main()
