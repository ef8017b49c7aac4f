"""Refinement optimization: remove collisions from sampled futures while
staying likely under the prior.

Reference ``refine_traffic_optim.py:146-226``: sample one future per agent,
then Adam on z with AvoidCollLoss (buffer 0.2, extended rollout), finally
decode at the save length.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..losses.adv import avoid_coll_loss
from .loop import run_adam_loop


def run_refine_optim(model, params, cur_z, lr, loss_weights, scene, map_store,
                     num_iters, embed_info, prior_distrib,
                     samp_future_len=16, save_future_len=12,
                     veh_coll_buffer=0.2):
    """
    :param cur_z: (B, NA, D) latents of the sampled future
    :return: (final z, refined future (B, NA, save_future_len, 4) NORMALIZED,
              loss history)
    """
    smean = jnp.asarray(model.norm.state_mean[:4])
    sstd = jnp.asarray(model.norm.state_std[:4])
    lw_unnorm = (scene.lw * jnp.asarray(model.norm.att_std)
                 + jnp.asarray(model.norm.att_mean))
    init_z = jax.lax.stop_gradient(cur_z)

    def loss_fn(z):
        dec = model.apply(params, z, embed_info, scene, map_store, None,
                          samp_future_len, method="decode_embedding")
        fut = dec["future_pred"] * sstd + smean
        out = avoid_coll_loss(
            fut, z, prior_distrib,
            lw=lw_unnorm, mask=scene.mask, mapixes=scene.map_idx,
            drivable=map_store.drivable(), dx=map_store.dx, init_z=init_z,
            weights=loss_weights, veh_coll_buffer=veh_coll_buffer,
            z_mask=scene.mask,
        )
        return out["loss"], out

    @partial(jax.jit, static_argnums=(1,))
    def run(z0, iters):
        zf, losses = run_adam_loop(loss_fn, z0, lr, iters)
        dec = model.apply(params, zf, embed_info, scene, map_store, None,
                          save_future_len, method="decode_embedding")
        return zf, dec["future_pred"], losses

    return run(cur_z, num_iters)
