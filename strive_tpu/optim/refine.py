"""Refinement optimization: remove collisions from sampled futures while
staying likely under the prior.

Reference ``refine_traffic_optim.py:146-226``: sample one future per agent,
then Adam (or LBFGS, ``:53-55,167-173``) on z with AvoidCollLoss (buffer
0.2, extended rollout), finally decode at the save length. The jitted
runner is cached across calls (one trace per shape, not per batch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..losses.adv import avoid_coll_loss
from .loop import cached_runner, run_adam_loop, run_lbfgs_loop


def run_refine_optim(model, params, cur_z, lr, loss_weights, scene, map_store,
                     num_iters, embed_info, prior_distrib,
                     samp_future_len=16, save_future_len=12,
                     veh_coll_buffer=0.2, optimizer="adam"):
    """
    :param cur_z: (B, NA, D) latents of the sampled future
    :param optimizer: 'adam' (reference default) or 'lbfgs'
        (reference ``refine_traffic_optim.py:53-55,167-173``)
    :return: (final z, refined future (B, NA, save_future_len, 4) NORMALIZED,
              loss history)
    """
    statics = (int(num_iters), float(lr),
               tuple(sorted(loss_weights.items())),
               int(samp_future_len), int(save_future_len),
               float(veh_coll_buffer), str(optimizer))

    def build():
        weights = dict(statics[2])
        smean = jnp.asarray(model.norm.state_mean[:4])
        sstd = jnp.asarray(model.norm.state_std[:4])
        att_std = jnp.asarray(model.norm.att_std)
        att_mean = jnp.asarray(model.norm.att_mean)

        @jax.jit
        def run(z0, scene, map_store, embed_info, prior_distrib):
            lw_unnorm = scene.lw * att_std + att_mean
            init_z = jax.lax.stop_gradient(z0)

            def loss_fn(z):
                dec = model.apply(params, z, embed_info, scene, map_store,
                                  None, samp_future_len,
                                  method="decode_embedding")
                fut = dec["future_pred"] * sstd + smean
                out = avoid_coll_loss(
                    fut, z, prior_distrib,
                    lw=lw_unnorm, mask=scene.mask, mapixes=scene.map_idx,
                    drivable=map_store.drivable(), dx=map_store.dx,
                    init_z=init_z, weights=weights,
                    veh_coll_buffer=veh_coll_buffer, z_mask=scene.mask,
                    packed=map_store.packed, min_dx=map_store.min_dx_m,
                )
                return out["loss"], out

            if optimizer == "lbfgs":
                zf, losses = run_lbfgs_loop(loss_fn, z0, lr, num_iters)
            else:
                zf, losses = run_adam_loop(loss_fn, z0, lr, num_iters)
            dec = model.apply(params, zf, embed_info, scene, map_store, None,
                              save_future_len, method="decode_embedding")
            return zf, dec["future_pred"], losses

        return run

    run = cached_runner("refine_optim", (model, params), statics, build)
    return run(cur_z, scene, map_store, embed_info, prior_distrib)
