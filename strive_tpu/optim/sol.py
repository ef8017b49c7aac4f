"""Solution optimization: prove the adversarial scenario is avoidable.

Reference ``utils/sol_optim.py:19-165``: re-optimize the planner-node latent
(re-initialized from the prior mean) to avoid all collisions over an
extended ``sol_future_len`` rollout, while other agents' latents match the
adversarial scenario. The jitted runner is cached across calls (one trace
per shape, not per batch), and the iteration uses the single-decode VJP
(see adv.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..losses.adv import avoid_coll_loss, tgt_matching_loss
from ..losses.metrics import check_single_veh_coll
from ..losses.training import compute_coll_rate_env
from .loop import cached_runner, run_adam_loop_vg


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
    FT = final_result_traj.shape[2]
    statics = (int(num_iters), float(lr), int(future_len), int(FT),
               tuple(sorted(loss_weights.items())), bool(ref_compat))

    def build():
        weights = dict(statics[4])
        smean = jnp.asarray(model.norm.state_mean[:4])
        sstd = jnp.asarray(model.norm.state_std[:4])
        att_std = jnp.asarray(model.norm.att_std)
        att_mean = jnp.asarray(model.norm.att_mean)
        unnorm = lambda x: x * sstd + smean

        @jax.jit
        def run(z0_other, tgt_z0, final_result_traj, scene, map_store,
                embed_info, tgt_prior_distrib, other_prior_distrib):
            B, NA = z0_other.shape[:2]
            D = z0_other.shape[2]
            lw_unnorm = scene.lw * att_std + att_mean
            ego_mask = jnp.zeros((B, NA), bool).at[:, 0].set(True)
            other_mask = scene.mask & ~ego_mask
            other_match_unnorm = unnorm(final_result_traj)
            # tgt z re-initialized from the prior mean (reference :38-39)
            tgt_init_z = jax.lax.stop_gradient(
                jnp.zeros_like(z0_other).at[:, 0].set(tgt_z0)
            )

            def _avoid_loss(pred_ext, tgt_z):
                z_full = jnp.zeros((B, NA, D),
                                   z0_other.dtype).at[:, 0].set(tgt_z)
                return avoid_coll_loss(
                    unnorm(pred_ext), z_full,
                    (tgt_prior_distrib[0], tgt_prior_distrib[1]),
                    lw=lw_unnorm, mask=scene.mask, mapixes=scene.map_idx,
                    drivable=map_store.drivable(), dx=map_store.dx,
                    init_z=tgt_init_z, weights=weights, veh_coll_buffer=0.5,
                    single_veh_idx=0, z_mask=ego_mask,
                    packed=map_store.packed, min_dx=map_store.min_dx_m,
                )["loss"]

            def _match_loss(pred_ft, other_z):
                return tgt_matching_loss(
                    unnorm(pred_ft), other_match_unnorm,
                    other_z, other_prior_distrib, weights,
                    frame_weights=other_mask[:, :, None].astype(jnp.float32),
                    agent_mask=other_mask, ref_compat=ref_compat,
                )["loss"]

            def _dec_fn(z):
                # ONE decode at the extended sol_future_len; the FT-step
                # decode the reference runs separately (sol_optim.py:49-63)
                # is its prefix (autoregressive rollout), so both losses
                # read the same forward.
                return model.apply(params, z, embed_info, scene, map_store,
                                   None, future_len,
                                   method="decode_embedding")["future_pred"]

            def value_and_grad_fn(opt_vars):
                """Single-decode VJP (see adv.py): the reference's two
                stop_gradient-partitioned decodes share forward values; one
                jax.vjp pulled back with both loss cotangents gives
                identical gradients."""
                tgt_z, other_z = opt_vars["tgt"], opt_vars["other"]
                z = other_z.at[:, 0].set(tgt_z)
                pred, pullback = jax.vjp(_dec_fn, z)

                la, (c_avoid, g_tgt_direct) = jax.value_and_grad(
                    _avoid_loss, argnums=(0, 1))(pred, tgt_z)
                lm, (c_match_ft, g_other_direct) = jax.value_and_grad(
                    _match_loss, argnums=(0, 1))(pred[:, :, :FT], other_z)
                c_match = jnp.zeros_like(pred).at[:, :, :FT].set(c_match_ft)

                gz = jax.vmap(lambda c: pullback(c)[0])(
                    jnp.stack([c_avoid, c_match]))
                grad_tgt = gz[0][:, 0] + g_tgt_direct
                grad_other = gz[1].at[:, 0].set(0.0) + g_other_direct
                return la + lm, {"tgt": grad_tgt, "other": grad_other}

            opt_vars0 = {"tgt": tgt_z0, "other": z0_other}
            vf, losses = run_adam_loop_vg(value_and_grad_fn, opt_vars0, lr,
                                          num_iters)
            z_final = vf["other"].at[:, 0].set(vf["tgt"])
            dec = model.apply(params, z_final, embed_info, scene, map_store,
                              None, FT, method="decode_embedding")
            # non-ego trajectories are replaced by the adversarial scenario
            # output (reference :120-121)
            sol_result = jnp.where(ego_mask[:, :, None, None],
                                   dec["future_pred"], final_result_traj)
            return z_final, sol_result, losses

        return run

    run = cached_runner("sol_optim", (model, params), statics, build)
    tgt_z0 = tgt_prior_distrib[0][:, 0]
    return run(cur_z, tgt_z0, final_result_traj, scene, map_store,
               embed_info, tgt_prior_distrib, other_prior_distrib)


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
