"""Initialization optimization: fit latents to a target future.

Reference ``utils/init_optim.py:11-68``: Adam on z minimizing
TgtMatchingLoss between the decoded (unnormalized) future and a target
trajectory on visible frames. Here the full loop is one jit, and the
jitted runner is cached across calls (one trace per shape, not per batch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..losses.adv import tgt_matching_loss
from .loop import cached_runner, run_adam_loop


def run_init_optim(model, params, cur_z, init_traj, traj_vis, lr, loss_weights,
                   scene, map_store, num_iters, embed_info, prior_distrib,
                   ext_future=None, ref_compat=True):
    """
    :param cur_z: (B, NA, D) starting latents
    :param init_traj: (B, NA, FT, 6) NORMALIZED target future (GT or planner)
    :param traj_vis: (B, NA, FT) visibility of the target
    :param loss_weights: dict with match_ext / motion_prior_ext
    :param prior_distrib: (mean, var) each (B, NA, D)
    :return: (final z, final decoded future (B, NA, FT, 4) NORMALIZED,
              loss history)
    """
    statics = (int(num_iters), float(lr),
               tuple(sorted(loss_weights.items())), bool(ref_compat),
               ext_future is None)

    def build():
        weights = dict(statics[2])
        smean = jnp.asarray(model.norm.state_mean[:4])
        sstd = jnp.asarray(model.norm.state_std[:4])

        @jax.jit
        def run(z0, tgt_unnorm, w, scene, map_store, embed_info,
                prior_distrib, ext_future):
            def loss_fn(z):
                dec = model.apply(params, z, embed_info, scene, map_store,
                                  ext_future, method="decode_embedding")
                fp = dec["future_pred"] * sstd + smean
                out = tgt_matching_loss(fp, tgt_unnorm, z, prior_distrib,
                                        weights, frame_weights=w,
                                        agent_mask=scene.mask,
                                        ref_compat=ref_compat)
                return out["loss"], out

            zf, losses = run_adam_loop(loss_fn, z0, lr, num_iters)
            dec = model.apply(params, zf, embed_info, scene, map_store,
                              ext_future, method="decode_embedding")
            return zf, dec["future_pred"], losses

        return run

    run = cached_runner("init_optim", (model, params), statics, build)
    smean = jnp.asarray(model.norm.state_mean[:4])
    sstd = jnp.asarray(model.norm.state_std[:4])
    tgt_unnorm = init_traj[..., :4] * sstd + smean
    w = traj_vis * scene.mask[:, :, None].astype(jnp.float32)
    return run(cur_z, tgt_unnorm, w, scene, map_store, embed_info,
               prior_distrib, ext_future)
