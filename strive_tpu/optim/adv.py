"""Adversarial scenario optimization driver.

Reference ``utils/adv_gen_optim.py:39-235``. The reference's two decoder
passes with alternating ``.detach()`` (:119-130) become two decodes with
``stop_gradient``-partitioned latents inside ONE jit-compiled Adam scan;
grads reach (tgt_z, other_z) exactly as in the reference.

Open-loop mode ('ego'/replay planner) injects the recorded planner future
via ext_future. Closed-loop mode ('hardcode') re-rolls the rule-based
planner every iteration on the host (the planner is non-differentiable in
the reference too — gradients flow only through the model's internal
prediction of the ego node, reference :134-139). Two closed-loop
mechanisms:

- 'chunked' (default, works on every runtime): the optimization runs as
  jitted K-iteration chunks with the planner trajectory held fixed; the
  host planner re-rolls between chunks on the CURRENT latents, which for
  K=1 reproduces the reference's per-iteration ordering exactly.
- 'io_callback': the planner call is traced into the compiled loop (one
  host hop per iteration, no python dispatch). Unsupported by some PJRT
  runtimes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..losses.adv import adv_gen_loss, tgt_matching_loss
from ..losses.metrics import check_single_veh_coll
from .loop import run_adam_loop


def _combine_z(tgt_z, other_z):
    """Full (B, NA, D) latents: ego slot 0 from tgt_z, rest from other_z."""
    return other_z.at[:, 0].set(tgt_z)


def run_adv_gen_optim(model, params, cur_z, lr, loss_weights, scene, map_store,
                      num_iters, embed_info, planner_name, tgt_prior_distrib,
                      other_prior_distrib, feasibility_time,
                      feasibility_infront_min, planner_rollout_fn=None,
                      attack_agt_mask=None, future_len=None,
                      veh_coll_buffer=0.1, ref_compat=True,
                      closed_loop_mode="chunked", planner_refresh_every=1):
    """
    :param cur_z: (B, NA, D) initial latents (ego at slot 0)
    :param planner_name: 'ego' (open-loop replay) or 'hardcode' (closed-loop)
    :param planner_rollout_fn: for 'hardcode': host callable
        (future_pred_norm (B, NA, FT, 4)) -> planner future (B, FT, 4)
        NORMALIZED, non-differentiable (make_planner_host_fn). In
        'io_callback' mode it must already be io_callback-wrapped.
    :param closed_loop_mode: 'chunked' | 'io_callback' (see module doc)
    :param planner_refresh_every: chunked mode: planner re-roll period in
        Adam iterations (1 = reference-exact)
    :param attack_agt_mask: optional (B, NA) fixed-attacker restriction
    :return: (final z (B,NA,D), final_result_traj (B,NA,FT,4) with the TRUE
        planner at slot 0, min_agt (B,), min_t (B,), loss history,
        internal_pred (B,NA,FT,4) — the model's own final decode, whose ego
        slot is the internal planner prediction)
    """
    B, NA, D = cur_z.shape
    FT = future_len if future_len is not None else model.nfuture
    smean = jnp.asarray(model.norm.state_mean[:4])
    sstd = jnp.asarray(model.norm.state_std[:4])
    unnorm = lambda x: x * sstd + smean
    lw_unnorm = (scene.lw * jnp.asarray(model.norm.att_std)
                 + jnp.asarray(model.norm.att_mean))
    mapixes = scene.map_idx
    drivable = map_store.drivable()
    dx = map_store.dx
    init_other_z = jax.lax.stop_gradient(cur_z)

    open_loop = planner_name == "ego"
    if open_loop:
        planner_fut_norm = scene.future_gt[:, 0, :FT, :4]  # (B, FT, 4)
        ext_future = planner_fut_norm
    else:
        ext_future = None

    def loss_fn(opt_vars, planner_fut_arg=None):
        tgt_z, other_z = opt_vars["tgt"], opt_vars["other"]
        z_for_tgt = _combine_z(tgt_z, jax.lax.stop_gradient(other_z))
        z_for_other = _combine_z(jax.lax.stop_gradient(tgt_z), other_z)

        tgt_dec = model.apply(params, z_for_tgt, embed_info, scene, map_store,
                              ext_future, FT, method="decode_embedding")
        other_dec = model.apply(params, z_for_other, embed_info, scene,
                                map_store, ext_future, FT,
                                method="decode_embedding")

        if open_loop:
            planner_fut = planner_fut_norm
        elif planner_fut_arg is not None:
            planner_fut = planner_fut_arg  # chunked: fixed within the chunk
        else:
            # io_callback: planner reacts to the current non-ego rollout
            planner_fut = planner_rollout_fn(
                jax.lax.stop_gradient(tgt_dec["future_pred"])
            )

        tgt_match = tgt_matching_loss(
            unnorm(tgt_dec["future_pred"][:, 0]), unnorm(planner_fut),
            tgt_z, tgt_prior_distrib, loss_weights,
            agent_mask=scene.mask[:, 0], ref_compat=ref_compat,
        )
        # adversarial loss sees its own (internal) planner prediction in
        # closed loop, the recorded planner in open loop (reference :149)
        tgt_traj = (planner_fut if open_loop
                    else other_dec["future_pred"][:, 0])
        adv = adv_gen_loss(
            unnorm(other_dec["future_pred"]), unnorm(tgt_traj),
            other_z, other_prior_distrib,
            lw=lw_unnorm, mask=scene.mask, mapixes=mapixes, drivable=drivable,
            dx=dx, init_z=init_other_z, weights=loss_weights,
            veh_coll_buffer=veh_coll_buffer, crash_min_t=feasibility_time,
            crash_min_infront=feasibility_infront_min,
            attack_agt_mask=attack_agt_mask,
        )
        return tgt_match["loss"] + adv["loss"], {}

    opt_vars0 = {"tgt": cur_z[:, 0], "other": cur_z}

    @jax.jit
    def decode_full(v):
        z = _combine_z(v["tgt"], v["other"])
        dec = model.apply(params, z, embed_info, scene, map_store, None, FT,
                          method="decode_embedding")
        return z, dec["future_pred"]

    if open_loop or closed_loop_mode == "io_callback":
        @partial(jax.jit, static_argnums=(1,))
        def run(v0, iters):
            vf, losses = run_adam_loop(loss_fn, v0, lr, iters)
            z_final = _combine_z(vf["tgt"], vf["other"])
            final_dec = model.apply(params, z_final, embed_info, scene,
                                    map_store, None, FT,
                                    method="decode_embedding")
            return z_final, final_dec["future_pred"], losses

        z_final, final_pred, losses = run(opt_vars0, num_iters)
    else:
        # chunked closed loop: K jitted Adam steps per host planner re-roll
        tx = optax.adam(lr)
        K = max(1, int(planner_refresh_every))

        @partial(jax.jit, static_argnums=(3,))
        def chunk(v, opt_state, planner_fut, iters):
            def step(carry, _):
                vv, os = carry
                (loss, _), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(vv, planner_fut)
                updates, os = tx.update(grads, os, vv)
                vv = optax.apply_updates(vv, updates)
                return (vv, os), loss
            (v, opt_state), ls = jax.lax.scan(step, (v, opt_state), None,
                                              length=iters)
            return v, opt_state, ls

        v = opt_vars0
        opt_state = tx.init(v)
        losses = []
        done = 0
        while done < num_iters:
            k = min(K, num_iters - done)
            _, cur_pred = decode_full(v)
            planner_fut = jnp.asarray(planner_rollout_fn(cur_pred))
            v, opt_state, ls = chunk(v, opt_state, planner_fut, k)
            losses.append(np.asarray(ls))
            done += k
        losses = jnp.asarray(np.concatenate(losses))
        z_final, final_pred = decode_full(v)

    # replace ego with the TRUE planner trajectory (reference :177-193)
    if open_loop:
        planner_final = scene.future_gt[:, 0, :FT, :4]
    else:
        planner_final = jnp.asarray(
            planner_rollout_fn(jax.lax.stop_gradient(final_pred)))
    final_result = final_pred.at[:, 0].set(planner_final)

    # one more loss pass to extract attacker agent/time (reference :195-209)
    adv_final = adv_gen_loss(
        unnorm(final_pred), unnorm(planner_final),
        z_final, other_prior_distrib,
        lw=lw_unnorm, mask=scene.mask, mapixes=mapixes, drivable=drivable,
        dx=dx, init_z=init_other_z, weights=loss_weights,
        veh_coll_buffer=veh_coll_buffer, crash_min_t=feasibility_time,
        crash_min_infront=feasibility_infront_min,
        attack_agt_mask=attack_agt_mask,
    )
    return (z_final, final_result, adv_final["min_agt"], adv_final["min_t"],
            losses, final_pred)


def compute_adv_gen_success(final_result_traj, state_norm, att_norm, lw, mask,
                            attack_agt):
    """Did the attacker actually collide with the planner?

    :param final_result_traj: (NA, FT, 4) NORMALIZED single scene, slot 0 =
        true planner
    :param attack_agt: dense agent index of the attacker (>= 1)
    :return: bool

    Reference ``utils/adv_gen_optim.py:214-235``.
    """
    n = int(np.asarray(mask).sum())
    fut = np.asarray(state_norm.unnormalize(final_result_traj[:n]))
    lw_u = np.asarray(att_norm.unnormalize(lw[:n]))
    coll, coll_t = check_single_veh_coll(fut[0], lw_u[0], fut[1:], lw_u[1:])
    return bool(coll[int(attack_agt) - 1]), coll, coll_t
