"""Solution optimization: prove the adversarial scenario is avoidable.

Reference ``utils/sol_optim.py:19-165``: re-optimize the planner-node latent
(re-initialized from the prior mean) to avoid all collisions over an
extended ``sol_future_len`` rollout, while other agents' latents match the
adversarial scenario.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..losses.adv import avoid_coll_loss, tgt_matching_loss
from ..losses.metrics import check_single_veh_coll
from ..losses.training import compute_coll_rate_env
from .loop import run_adam_loop


def run_find_solution_optim(model, params, cur_z, final_result_traj,
                            future_len, lr, loss_weights, scene, map_store,
                            num_iters, embed_info, tgt_prior_distrib,
                            other_prior_distrib, ref_compat=True):
    """
    :param cur_z: (B, NA, D) latents from the adversarial optimization
    :param final_result_traj: (B, NA, FT, 4) NORMALIZED adv scenario (slot 0
        = true planner reaction)
    :param future_len: extended rollout length (sol_future_len, default 16)
    :param loss_weights: the ``sol_*``-stripped weight dict
    :return: (final z, sol_result_traj (B, NA, FT, 4) NORMALIZED, losses)
    """
    B, NA, D = cur_z.shape
    FT = final_result_traj.shape[2]
    smean = jnp.asarray(model.norm.state_mean[:4])
    sstd = jnp.asarray(model.norm.state_std[:4])
    unnorm = lambda x: x * sstd + smean
    lw_unnorm = (scene.lw * jnp.asarray(model.norm.att_std)
                 + jnp.asarray(model.norm.att_mean))
    ego_mask = jnp.zeros((B, NA), bool).at[:, 0].set(True)
    other_mask = scene.mask & ~ego_mask

    other_match_unnorm = unnorm(final_result_traj)  # targets for non-ego

    # tgt z re-initialized from the prior mean (reference :38-39)
    tgt_z0 = tgt_prior_distrib[0][:, 0]
    tgt_init_z = jax.lax.stop_gradient(
        jnp.zeros_like(cur_z).at[:, 0].set(tgt_z0)
    )

    def loss_fn(opt_vars):
        tgt_z, other_z = opt_vars["tgt"], opt_vars["other"]
        z_for_tgt = jax.lax.stop_gradient(other_z).at[:, 0].set(tgt_z)
        z_for_other = other_z.at[:, 0].set(jax.lax.stop_gradient(tgt_z))

        # planner rollout is LONGER (sol_future_len) to avoid doomed end
        # states (reference :49-63)
        tgt_dec = model.apply(params, z_for_tgt, embed_info, scene, map_store,
                              None, future_len, method="decode_embedding")
        match_dec = model.apply(params, z_for_other, embed_info, scene,
                                map_store, None, FT, method="decode_embedding")

        z_full = jnp.zeros_like(other_z).at[:, 0].set(tgt_z)
        avoid = avoid_coll_loss(
            unnorm(tgt_dec["future_pred"]), z_full,
            (tgt_prior_distrib[0], tgt_prior_distrib[1]),
            lw=lw_unnorm, mask=scene.mask, mapixes=scene.map_idx,
            drivable=map_store.drivable(), dx=map_store.dx,
            init_z=tgt_init_z, weights=loss_weights, veh_coll_buffer=0.5,
            single_veh_idx=0, z_mask=ego_mask,
        )
        match = tgt_matching_loss(
            unnorm(match_dec["future_pred"]), other_match_unnorm,
            other_z, other_prior_distrib, loss_weights,
            frame_weights=other_mask[:, :, None].astype(jnp.float32),
            agent_mask=other_mask, ref_compat=ref_compat,
        )
        return avoid["loss"] + match["loss"], {}

    opt_vars0 = {"tgt": tgt_z0, "other": cur_z}

    @partial(jax.jit, static_argnums=(1,))
    def run(v0, iters):
        vf, losses = run_adam_loop(loss_fn, v0, lr, iters)
        z_final = vf["other"].at[:, 0].set(vf["tgt"])
        dec = model.apply(params, z_final, embed_info, scene, map_store,
                          None, FT, method="decode_embedding")
        return z_final, dec["future_pred"], losses

    z_final, sol_pred, losses = run(opt_vars0, num_iters)
    # non-ego trajectories are replaced by the adversarial scenario output
    # (reference :120-121)
    sol_result = jnp.where(ego_mask[:, :, None, None], sol_pred,
                           final_result_traj)
    return z_final, sol_result, losses


def compute_sol_success(sol_result_traj, scene, map_store, state_norm,
                        att_norm, use_map_coll=True):
    """No collision with agents (and optionally the map) => solved.

    :param sol_result_traj: (NA, FT, 4) NORMALIZED single scene
    :return: bool (reference ``utils/sol_optim.py:126-165``)
    """
    mask = np.asarray(scene.mask[0])
    n = int(mask.sum())
    fut = np.asarray(state_norm.unnormalize(sol_result_traj[:n]))
    lw_u = np.asarray(att_norm.unnormalize(scene.lw[0, :n]))
    coll, _ = check_single_veh_coll(fut[0], lw_u[0], fut[1:], lw_u[1:])
    impossible = bool(coll.sum() > 0)

    if use_map_coll and not impossible:
        env = compute_coll_rate_env(
            scene, sol_result_traj[None, None], map_store, state_norm,
            att_norm, ego_only=True,
        )
        impossible = bool(np.asarray(env["did_collide"])[0, 0, 0])
    return not impossible
