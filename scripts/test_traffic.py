"""Evaluate the traffic model (reference ``test_traffic.py``): losses +
reconstruction/sampling metrics (minADE/minFDE/APD, collision rates) + viz.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from strive_tpu.data.dataset import bucketed_batch_iterator as batch_iterator
from strive_tpu.data.loading import load_environment
from strive_tpu.losses.metrics import compute_coll_rate_veh_dense
from strive_tpu.losses.training import (
    compute_coll_rate_env,
    compute_disp_err,
    compute_err,
    traffic_model_loss,
)
from strive_tpu.utils.checkpoint import load_state
from strive_tpu.utils.config import add_base_args, get_parser
from strive_tpu.utils.logger import Logger, mkdir
from strive_tpu.viz import render_rollout_video, render_scene

from train_traffic import build_model
from strive_tpu.model.traffic_model import init_model_params


def parse_cfg(argv=None):
    parser = get_parser("Test traffic model (TPU)")
    parser = add_base_args(parser)
    parser.add_argument("--split", type=str, default="test",
                        choices=["train", "val", "test"])
    parser.add_argument("--shuffle_test", action="store_true", default=False)
    parser.add_argument("--test_sample_num", type=int, default=10)
    parser.add_argument("--test_sample_future_len", type=int, default=12)
    parser.add_argument("--test_sample_viz_multi", action="store_true",
                        default=False)
    parser.add_argument("--test_sample_viz_rollout", action="store_true",
                        default=False)
    parser.add_argument("--test_sample_disp_err", action="store_true",
                        default=False)
    parser.add_argument("--test_sample_coll_rate", action="store_true",
                        default=False)
    parser.add_argument("--test_recon_viz_multi", action="store_true",
                        default=False)
    parser.add_argument("--test_recon_coll_rate", action="store_true",
                        default=False)
    parser.add_argument("--loss_kl", type=float, default=0.004)
    parser.add_argument("--loss_recon", type=float, default=1.0)
    parser.add_argument("--synth_scenes", type=int, default=24)
    return parser.parse(argv)


def main(argv=None):
    cfg = parse_cfg(argv)
    mkdir(cfg.out)
    Logger.init(os.path.join(cfg.out, "test_log.txt"))
    Logger.log("Args: " + str(vars(cfg)))

    ds, store, _, state_norm, att_norm = load_environment(cfg, cfg.split)
    from strive_tpu.normalize import effective_categories
    nc = len(effective_categories(cfg.agent_types, cfg.reduce_cats))
    model = build_model(cfg, state_norm, att_norm, nc)

    key = jax.random.PRNGKey(0)
    init_batch = ds.get_batch(list(range(min(cfg.batch_size, len(ds)))))
    params = init_model_params(model, init_batch, store, key)
    if cfg.ckpt is not None:
        params, _, epoch, _ = load_state(cfg.ckpt, params, None)
        Logger.log(f"Loaded checkpoint from epoch {epoch}")

    weights = {"recon": cfg.loss_recon, "kl": cfg.loss_kl}

    @jax.jit
    def eval_step(params, scene, rng):
        pred = model.apply(params, scene, store, rng, use_post_mean=True,
                           method="forward")
        loss_out = traffic_model_loss(scene, pred, weights, state_norm,
                                      att_norm, store)
        err = compute_err(scene, pred, state_norm)
        return {**loss_out, **err}

    @jax.jit
    def sample_step(params, scene, rng):
        return model.apply(params, scene, store, cfg.test_sample_num, rng,
                           False, cfg.test_sample_future_len,
                           method="sample_batched")

    @jax.jit
    def recon_step(params, scene):
        return model.apply(params, scene, store, method="reconstruct")

    metrics = {}

    def acc(k, v):
        metrics.setdefault(k, []).append(float(np.mean(np.asarray(v))))

    for i, scene in enumerate(batch_iterator(ds, cfg.batch_size,
                                             shuffle=cfg.shuffle_test)):
        key, k1, k2 = jax.random.split(key, 3)
        out = eval_step(params, scene, k1)
        for k in ("loss", "recon_loss", "kl_loss", "pos_err", "ang_err",
                  "z_logprob", "z_mdist"):
            acc(k, out[k])

        if (cfg.test_sample_disp_err or cfg.test_sample_coll_rate
                or cfg.test_sample_viz_multi or cfg.test_sample_viz_rollout):
            samp = sample_step(params, scene, k2)
            if cfg.test_sample_disp_err:
                derr = compute_disp_err(scene, samp["future_pred"], state_norm)
                for k, v in derr.items():
                    acc(k, v)
            if cfg.test_sample_coll_rate:
                env = compute_coll_rate_env(scene, samp["future_pred"], store,
                                            state_norm, att_norm, ego_only=True)
                acc("coll_rate_env",
                    float(env["num_coll_map"]) / max(float(env["num_traj_map"]), 1))
                fut_un = np.asarray(state_norm.unnormalize(samp["future_pred"]))
                lw_un = np.asarray(att_norm.unnormalize(scene.lw))
                did = compute_coll_rate_veh_dense(fut_un, lw_un,
                                                  np.asarray(scene.mask))
                n_traj = float(np.asarray(scene.mask).sum()
                               * samp["future_pred"].shape[1])
                acc("coll_rate_veh", did.sum() / max(n_traj, 1))
        # reconstruction-based evaluations (reference test_traffic.py:137-167)
        if cfg.test_recon_viz_multi or cfg.test_recon_coll_rate:
            recon = recon_step(params, scene)
            recon_fut = recon["future_pred"][:, None]  # 1 "sample"
            if cfg.test_recon_coll_rate:
                env = compute_coll_rate_env(scene, recon_fut, store,
                                            state_norm, att_norm,
                                            ego_only=True)
                acc("recon_coll_rate_env",
                    float(env["num_coll_map"])
                    / max(float(env["num_traj_map"]), 1))
                fut_un = np.asarray(state_norm.unnormalize(recon_fut))
                lw_un = np.asarray(att_norm.unnormalize(scene.lw))
                did = compute_coll_rate_veh_dense(fut_un, lw_un,
                                                  np.asarray(scene.mask))
                n_traj = float(np.asarray(scene.mask).sum())
                acc("recon_coll_rate_veh", did.sum() / max(n_traj, 1))
            if cfg.test_recon_viz_multi and i < 3:
                for b in range(min(scene.B, 2)):
                    render_scene(
                        os.path.join(cfg.out, "viz",
                                     f"recon_multi_{i}_{b}.jpg"), store,
                        int(scene.map_idx[b]),
                        np.asarray(state_norm.unnormalize(scene.past_gt[b])),
                        np.asarray(state_norm.unnormalize(
                            recon["future_pred"][b])),
                        np.asarray(att_norm.unnormalize(scene.lw[b])),
                        scene.mask[b], title=f"recon batch {i} scene {b}",
                        gt_future=np.asarray(state_norm.unnormalize(
                            scene.future_gt[b, :, :, :4])),
                    )

        if (cfg.test_sample_disp_err or cfg.test_sample_coll_rate
                or cfg.test_sample_viz_multi or cfg.test_sample_viz_rollout):
            if cfg.test_sample_viz_rollout and i < 3:
                # per-step rollout video of the first sample (reference
                # test_traffic.py:195-208, viz_traj=False + make_video)
                render_rollout_video(
                    os.path.join(cfg.out, "viz", f"rollout_{i}"), store,
                    int(scene.map_idx[0]),
                    np.asarray(state_norm.unnormalize(scene.past_gt[0])),
                    np.asarray(state_norm.unnormalize(
                        samp["future_pred"][0, 0])),
                    np.asarray(att_norm.unnormalize(scene.lw[0])),
                    scene.mask[0],
                )
            if cfg.test_sample_viz_multi and i < 3:
                # ALL NS samples overlaid, one color per sample (reference
                # test_traffic.py:181-193 -> viz_scene_graph)
                fut_un = np.asarray(state_norm.unnormalize(
                    samp["future_pred"][0]))  # (NS, NA, FT, 4)
                render_scene(
                    os.path.join(cfg.out, "viz", f"sample_{i}.jpg"), store,
                    int(scene.map_idx[0]),
                    np.asarray(state_norm.unnormalize(scene.past_gt[0])),
                    fut_un, np.asarray(att_norm.unnormalize(scene.lw[0])),
                    scene.mask[0],
                    title=f"sample batch {i} ({fut_un.shape[0]} samples)",
                )

    Logger.log("==== evaluation results ====")
    for k, v in sorted(metrics.items()):
        Logger.log("%s = %f" % (k, float(np.mean(v))))
    return {k: float(np.mean(v)) for k, v in metrics.items()}


if __name__ == "__main__":
    main()
