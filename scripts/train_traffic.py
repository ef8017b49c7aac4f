"""Train the CVAE traffic prior (reference ``train_traffic.py``).

Usage: python scripts/train_traffic.py --config configs/train_traffic.cfg
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from strive_tpu.data.dataset import bucketed_batch_iterator as batch_iterator
from strive_tpu.data.loading import load_environment
from strive_tpu.model.traffic_model import init_model_params, NormConfig, TrafficModel
from strive_tpu.train import Trainer, compute_kl_weight
from strive_tpu.utils.checkpoint import load_state, save_state
from strive_tpu.utils.config import add_base_args, get_parser
from strive_tpu.utils.logger import Logger, mkdir


def parse_cfg(argv=None):
    parser = get_parser("Train traffic model (TPU)")
    parser = add_base_args(parser)
    parser.add_argument("--scenario_dir", type=str, default=None)
    parser.add_argument("--data_noise_std", type=float, default=0.0)
    parser.add_argument("--epochs", type=int, default=200)
    parser.add_argument("--val_every", type=int, default=3)
    parser.add_argument("--save_every", type=int, default=3)
    parser.add_argument("--print_every", type=int, default=10)
    parser.add_argument("--lr", type=float, default=1e-5)
    parser.add_argument("--weight_decay", type=float, default=0.0)
    parser.add_argument("--loss_kl", type=float, default=0.004)
    parser.add_argument("--kl_anneal_end", type=int, default=20)
    parser.add_argument("--loss_recon", type=float, default=1.0)
    parser.add_argument("--loss_veh_coll_prior", type=float, default=0.05)
    parser.add_argument("--loss_env_coll_prior", type=float, default=0.1)
    parser.add_argument("--synth_scenes", type=int, default=24)
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="capture a jax.profiler trace of one epoch here")
    return parser.parse(argv)


def build_model(cfg, state_norm, att_norm, nc):
    norm = NormConfig.from_normalizers(state_norm, att_norm)
    return TrafficModel(
        npast=cfg.past_len, nfuture=cfg.future_len,
        map_obs_size_pix=cfg.map_obs_size_pix, nclasses=nc, norm=norm,
        map_feat_size=cfg.map_feat_size, past_feat_size=cfg.past_feat_size,
        future_feat_size=cfg.future_feat_size, latent_size=cfg.latent_size,
        output_bicycle=cfg.model_output_bicycle,
        map_bounds=tuple(cfg.map_obs_bounds),
        conv_kernels=tuple(cfg.conv_kernel_list),
        conv_strides=tuple(cfg.conv_stride_list),
        conv_filters=tuple(cfg.conv_filter_list),
        compute_dtype="bfloat16" if getattr(cfg, "bf16", False) else None,
    )


def main(argv=None):
    cfg = parse_cfg(argv)
    mkdir(cfg.out)
    Logger.init(os.path.join(cfg.out, "train_log.txt"))
    Logger.log("Args: " + str(vars(cfg)))

    wandb_run = None
    if cfg.wandb_project is not None:
        try:
            import wandb

            wandb_run = wandb.init(
                project=cfg.wandb_project, config=vars(cfg),
                mode="offline" if cfg.wandb_offline else "online",
                name=cfg.wandb_name,
            )
        except ImportError:
            Logger.log("wandb requested but not installed; continuing without")

    train_ds, store, _, state_norm, att_norm = load_environment(cfg, "train")
    val_ds, _, _, _, _ = load_environment(cfg, "val")
    from strive_tpu.normalize import effective_categories
    nc = len(effective_categories(cfg.agent_types, cfg.reduce_cats))
    model = build_model(cfg, state_norm, att_norm, nc)

    key = jax.random.PRNGKey(0)
    init_batch = train_ds.get_batch(list(range(min(cfg.batch_size,
                                                   len(train_ds)))))
    params = init_model_params(model, init_batch, store, key)
    n_params = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params))
    Logger.log("Num model params: %d" % n_params)

    loss_weights = {
        "recon": cfg.loss_recon, "kl": cfg.loss_kl,
        "coll_veh_prior": cfg.loss_veh_coll_prior,
        "coll_env_prior": cfg.loss_env_coll_prior,
    }
    trainer = Trainer(model, params, loss_weights, state_norm, att_norm,
                      lr=cfg.lr, weight_decay=cfg.weight_decay)

    ckpt_epoch, min_eval_loss = 0, float("inf")
    if cfg.ckpt is not None:
        p, o, ckpt_epoch, min_eval_loss = load_state(
            cfg.ckpt, trainer.state.params, trainer.state.opt_state
        )
        trainer.state = trainer.state.replace(params=p, opt_state=o)
        Logger.log(f"Loaded ckpt from epoch {ckpt_epoch} "
                   f"(val loss {min_eval_loss:.4f})")

    ckpts = os.path.join(cfg.out, "checkpoints")
    mkdir(ckpts)
    use_anneal = cfg.kl_anneal_end is not None and cfg.kl_anneal_end > 0
    step_counter = 0
    for epoch in range(ckpt_epoch, cfg.epochs):
        kl_w = (compute_kl_weight(epoch, cfg.kl_anneal_end, cfg.loss_kl)
                if use_anneal else cfg.loss_kl)
        if use_anneal and epoch == cfg.kl_anneal_end:
            Logger.log("KL annealing finished: resetting val loss tracking")
            min_eval_loss = float("inf")
        Logger.log(f"Epoch {epoch} (kl weight {kl_w:.6f})")
        key, k1 = jax.random.split(key)
        profiling = cfg.profile_dir is not None and epoch == ckpt_epoch + 1
        if profiling:
            jax.profiler.start_trace(cfg.profile_dir)
        m, step_counter = trainer.run_epoch(
            batch_iterator(train_ds, cfg.batch_size, shuffle=True, seed=epoch),
            store, k1, kl_w, train=True, log_every=cfg.print_every,
            wandb_run=wandb_run, step_counter=step_counter,
        )
        if profiling:
            jax.profiler.stop_trace()
            Logger.log(f"  wrote profiler trace to {cfg.profile_dir}")
        Logger.log(f"  train loss {m['loss']:.4f} recon {m['recon_loss']:.4f} "
                   f"kl {m['kl_loss']:.4f} time {m['epoch_time']:.1f}s")
        if wandb_run is not None:
            wandb_run.log({f"Train Epoch Mean {k}": v for k, v in m.items()},
                          step=step_counter)
        if epoch % cfg.val_every == 0:
            key, k2 = jax.random.split(key)
            vm, step_counter = trainer.run_epoch(
                batch_iterator(val_ds, cfg.batch_size, shuffle=False),
                store, k2, kl_w, train=False, step_counter=step_counter,
            )
            Logger.log(f"  val loss {vm['loss']:.4f}")
            if vm["loss"] < min_eval_loss:
                min_eval_loss = vm["loss"]
                save_state(ckpts, "best_eval_model", trainer.state.params,
                           trainer.state.opt_state, epoch, min_eval_loss)
                Logger.log("  new best, saved")
        if epoch % cfg.save_every == 0:
            save_state(ckpts, "epoch_%08d_model" % epoch, trainer.state.params,
                       trainer.state.opt_state, epoch, min_eval_loss)
            save_state(ckpts, "latest_model", trainer.state.params,
                       trainer.state.opt_state, epoch, min_eval_loss)
    Logger.log("Training done.")


if __name__ == "__main__":
    main()
