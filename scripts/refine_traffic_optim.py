"""Refine sampled futures to remove collisions while staying likely under
the prior (reference ``refine_traffic_optim.py``).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from strive_tpu.data.loading import load_environment
from strive_tpu.data.scenario_json import prepare_output_dict, save_scenario
from strive_tpu.losses.metrics import compute_coll_rate_veh_dense
from strive_tpu.losses.training import compute_coll_rate_env
from strive_tpu.optim import run_refine_optim
from strive_tpu.utils.checkpoint import load_state
from strive_tpu.utils.config import add_base_args, get_parser
from strive_tpu.utils.logger import Logger, mkdir
from strive_tpu.viz import render_scene

from train_traffic import build_model
from strive_tpu.model.traffic_model import init_model_params


def parse_cfg(argv=None):
    parser = get_parser("Refine sampled traffic (TPU)")
    parser = add_base_args(parser)
    parser.add_argument("--split", type=str, default="test")
    parser.add_argument("--val_size", type=int, default=400)
    parser.add_argument("--random_val", action="store_true", default=True)
    parser.add_argument("--seq_interval", type=int, default=10)
    parser.add_argument("--shuffle", action="store_true", default=False)
    parser.add_argument("--feasibility_num", type=int, default=10,
                        help="min num agents in scene")
    parser.add_argument("--samp_future_len", type=int, default=16)
    parser.add_argument("--save_future_len", type=int, default=12)
    parser.add_argument("--num_iters", type=int, default=200)
    parser.add_argument("--optim_use_lbfgs", dest="optim_use_adam",
                        action="store_false", default=True,
                        help="use LBFGS instead of Adam (reference "
                             "refine_traffic_optim.py:53-55)")
    parser.add_argument("--lr", type=float, default=0.05)
    parser.add_argument("--loss_coll_veh", type=float, default=100.0)
    parser.add_argument("--loss_coll_env", type=float, default=100.0)
    parser.add_argument("--loss_init_z", type=float, default=0.01)
    parser.add_argument("--loss_motion_prior", type=float, default=1.0)
    parser.add_argument("--viz", action="store_true", default=False)
    parser.add_argument("--save", action="store_true", default=False)
    parser.add_argument("--max_scenes", type=int, default=None)
    parser.add_argument("--synth_scenes", type=int, default=24)
    return parser.parse(argv)


def count_collisions(scene, fut, store, state_norm, att_norm):
    """(num veh-colliding agents, num env-colliding agents) for a refined
    batch (reference refine success check :322-335)."""
    env = compute_coll_rate_env(scene, fut[:, None], store, state_norm,
                                att_norm)
    n_env = int(np.asarray(env["num_coll_map"]))
    fut_un = np.asarray(state_norm.unnormalize(fut[:, None]))
    lw_un = np.asarray(att_norm.unnormalize(scene.lw))
    did = compute_coll_rate_veh_dense(fut_un, lw_un, np.asarray(scene.mask))
    return int(did.sum()), n_env


def main(argv=None):
    cfg = parse_cfg(argv)
    mkdir(cfg.out)
    Logger.init(os.path.join(cfg.out, "refine_log.txt"))
    Logger.log("Args: " + str(vars(cfg)))
    dt = 0.5

    ds, store, _, state_norm, att_norm = load_environment(cfg, cfg.split)
    from strive_tpu.normalize import effective_categories
    nc = len(effective_categories(cfg.agent_types, cfg.reduce_cats))
    model = build_model(cfg, state_norm, att_norm, nc)
    key = jax.random.PRNGKey(0)
    params = init_model_params(model, ds.get_batch([0]), store, key)
    if cfg.ckpt is not None:
        params, _, _, _ = load_state(cfg.ckpt, params, None)

    weights = {"coll_veh": cfg.loss_coll_veh, "coll_env": cfg.loss_coll_env,
               "init_z": cfg.loss_init_z, "motion_prior": cfg.loss_motion_prior}

    @jax.jit
    def sample1(params, scene, rng):
        out = model.apply(params, scene, store, 1, rng, False,
                          cfg.samp_future_len, method="sample_batched")
        return out

    @jax.jit
    def embed_fn(params, scene):
        return model.apply(params, scene, store, method="embed")

    n = len(ds) if cfg.max_scenes is None else min(len(ds), cfg.max_scenes)
    stats = {"scenes": 0, "success": 0, "failed": 0, "skipped": 0}
    pending = []
    for pos in range(n):
        scene1 = ds.get_batch([pos])
        if int(scene1.num_agents()[0]) < cfg.feasibility_num:
            stats["skipped"] += 1
            continue
        pending.append(pos)
        if len(pending) < cfg.batch_size and pos != n - 1:
            continue
        if not pending:
            continue
        batch_ids, pending = pending, []
        scene = ds.get_batch(batch_ids)
        t0 = time.time()
        key, k1 = jax.random.split(key)
        samp = sample1(params, scene, k1)
        z0 = samp["z_samp"][:, 0]
        emb = embed_fn(params, scene)
        zf, fut, _losses = run_refine_optim(
            model, params, z0, cfg.lr, weights, scene, store, cfg.num_iters,
            emb, emb["prior_out"], samp_future_len=cfg.samp_future_len,
            save_future_len=cfg.save_future_len,
            optimizer="adam" if cfg.optim_use_adam else "lbfgs",
        )
        Logger.log("refined %d scenes in %.1fs" % (scene.B,
                                                   time.time() - t0))
        for b in range(scene.B):
            sub = jax.tree_util.tree_map(lambda x: x[b : b + 1], scene)
            n_veh, n_env = count_collisions(sub, fut[b : b + 1], store,
                                            state_norm, att_norm)
            ok = (n_veh == 0) and (n_env == 0)
            stats["scenes"] += 1
            stats["success" if ok else "failed"] += 1
            result_dir = "success" if ok else "failed"
            na = int(np.asarray(scene.mask[b]).sum())
            if cfg.save:
                sc = {"past_gt": np.asarray(scene.past_gt[b, :na]),
                      "lw": np.asarray(scene.lw[b, :na]),
                      "sem": np.asarray(scene.sem[b, :na])}
                out_dict = prepare_output_dict(
                    sc, int(scene.map_idx[b]), store.map_names, dt,
                    state_norm, att_norm,
                    np.asarray(samp["future_pred"][b, 0, :na,
                                                   :cfg.save_future_len]),
                    np.asarray(fut[b, :na]),
                    adv_z=np.asarray(zf[b, :na]),
                    prior_distrib=(emb["prior_out"][0][b, :na],
                                   emb["prior_out"][1][b, :na]),
                )
                save_scenario(os.path.join(cfg.out, "scenario_results",
                                           result_dir),
                              "scene_%04d" % batch_ids[b], out_dict)
            if cfg.viz:
                render_scene(
                    os.path.join(cfg.out, "viz_results", result_dir,
                                 "scene_%04d.jpg" % batch_ids[b]),
                    store, int(scene.map_idx[b]),
                    np.asarray(state_norm.unnormalize(scene.past_gt[b, :na])),
                    np.asarray(state_norm.unnormalize(fut[b, :na])),
                    np.asarray(att_norm.unnormalize(scene.lw[b, :na])),
                    scene.mask[b, :na],
                )

    Logger.log("==== refine done ====")
    for k, v in stats.items():
        Logger.log(f"{k} = {v}")
    return stats


if __name__ == "__main__":
    main()
