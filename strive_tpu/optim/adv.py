"""Adversarial scenario optimization driver.

Reference ``utils/adv_gen_optim.py:39-235``. Two TPU-side optimizations
over the reference's structure, both gradient-exact:

- **single-decode VJP**: the reference's two decoder passes with
  alternating ``.detach()`` (:119-130) share identical forward values —
  only gradient routing differs. One ``jax.vjp`` of the decoder pulled
  back with the two loss cotangents (vmapped) yields the same gradients
  with one forward instead of two.
- **cached jitted runners**: the whole Adam loop is one compiled
  ``lax.scan``; the compiled runner is cached across driver calls (keyed
  by model/params identity + static config), so repeat batches with equal
  shapes skip Python re-tracing entirely (it dominated wall time).

Open-loop mode ('ego'/replay planner) injects the recorded planner future
via ext_future. Closed-loop mode ('hardcode') re-rolls the rule-based
planner every iteration on the host (the planner is non-differentiable in
the reference too — gradients flow only through the model's internal
prediction of the ego node, reference :134-139). Two closed-loop
mechanisms:

- 'chunked' (default, works on every runtime): the optimization runs as
  jitted K-iteration chunks with the planner trajectory held fixed; the
  planner re-rolls between chunks on the CURRENT latents, which for K=1
  reproduces the reference's per-iteration ordering exactly. The planner
  can be the host numpy phase-A port OR the device phase-B planner called
  eagerly (two-arg contract) — the device planner keeps its OWN compiled
  program this way, which on this toolchain is ~1000x faster than inlining
  it (see below).
- 'io_callback': the planner call is traced into the compiled loop (one
  host hop per iteration, no python dispatch). Unsupported by some PJRT
  runtimes.
- 'fused': ``planner_rollout_fn`` is PURE JAX (the phase-B device planner,
  ``planners/tpu_planner.py``) and traces straight into the loop — the
  whole closed-loop optimization compiles to one program with ZERO host
  hops. The r2 caveat (gathers whose operands are not jit entry
  parameters lower ~1000x slower inlined) no longer applies: the r3
  gather purge made the planner one-hot/row-read only, and fused is now
  the FASTEST closed loop (15.7 vs 12.8 it/s chunked at B=4 x NA=8,
  PERF.md r4). HBM bound still applies: keep B x others_chunk well
  under 64 in fused mode (B=4 x 16 measured fatal, CLAUDE.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..losses.adv import adv_gen_loss, tgt_matching_loss
from ..losses.metrics import check_single_veh_coll
from .loop import (cached_runner, run_adam_loop_vg,
                   run_adam_loop_vg_refresh)


def _combine_z(tgt_z, other_z):
    """Full (B, NA, D) latents: ego slot 0 from tgt_z, rest from other_z."""
    return other_z.at[:, 0].set(tgt_z)


def run_adv_gen_optim(model, params, cur_z, lr, loss_weights, scene, map_store,
                      num_iters, embed_info, planner_name, tgt_prior_distrib,
                      other_prior_distrib, feasibility_time,
                      feasibility_infront_min, planner_rollout_fn=None,
                      attack_agt_mask=None, future_len=None,
                      veh_coll_buffer=0.1, ref_compat=True,
                      closed_loop_mode="chunked", planner_refresh_every=1,
                      planner_state=None):
    """
    :param cur_z: (B, NA, D) initial latents (ego at slot 0)
    :param planner_name: 'ego' (open-loop replay) or 'hardcode' (closed-loop)
    :param planner_rollout_fn: for 'hardcode': host callable
        (future_pred_norm (B, NA, FT, 4)) -> planner future (B, FT, 4)
        NORMALIZED, non-differentiable (make_planner_host_fn). In
        'io_callback' mode it must already be io_callback-wrapped. In
        'fused' mode with ``planner_state``, the signature is
        (future_pred_norm, planner_state) -> (B, FT, 4) — the per-batch
        state is threaded through as a traced argument so ONE stable fn
        (and one compiled loop) serves every batch.
    :param planner_state: pytree of per-batch planner arrays for the fused
        two-arg contract (``TpuRulePlanner.state`` after ``reset``); None
        for host/io_callback bridges.
    :param closed_loop_mode: 'chunked' | 'io_callback' | 'fused' (module doc)
    :param planner_refresh_every: chunked mode: planner re-roll period in
        Adam iterations (1 = reference-exact)
    :param attack_agt_mask: optional (B, NA) fixed-attacker restriction
    :return: (final z (B,NA,D), final_result_traj (B,NA,FT,4) with the TRUE
        planner at slot 0, min_agt (B,), min_t (B,), loss history,
        internal_pred (B,NA,FT,4) — the model's own final decode, whose ego
        slot is the internal planner prediction)
    """
    FT = future_len if future_len is not None else model.nfuture
    open_loop = planner_name == "ego"
    has_atk_mask = attack_agt_mask is not None
    has_pstate = planner_state is not None
    # the planner fn is traced INTO the compiled loop only in
    # io_callback/fused modes; the chunked bridge calls it between jitted
    # chunks, so anchoring the runner cache on its (per-batch) identity
    # there would force a full re-trace every batch for nothing.
    traced_planner = (not open_loop
                      and closed_loop_mode in ("io_callback", "fused")
                      and planner_rollout_fn is not None)
    statics = (int(num_iters), bool(open_loop), int(FT), float(lr),
               tuple(sorted(loss_weights.items())), float(veh_coll_buffer),
               int(feasibility_time),
               None if feasibility_infront_min is None
               else float(feasibility_infront_min),
               bool(ref_compat), str(closed_loop_mode),
               int(planner_refresh_every), has_atk_mask, has_pstate)
    anchors = (model, params, planner_rollout_fn) if traced_planner \
        else (model, params)

    def build():
        weights = dict(statics[4])
        smean = jnp.asarray(model.norm.state_mean[:4])
        sstd = jnp.asarray(model.norm.state_std[:4])
        att_std = jnp.asarray(model.norm.att_std)
        att_mean = jnp.asarray(model.norm.att_mean)
        unnorm = lambda x: x * sstd + smean

        def _tgt_loss(pred, tgt_z, planner_fut, scene, tgt_prior):
            return tgt_matching_loss(
                unnorm(pred[:, 0]), unnorm(planner_fut),
                tgt_z, tgt_prior, weights,
                agent_mask=scene.mask[:, 0], ref_compat=ref_compat,
            )["loss"]

        def _adv_loss_full(pred, other_z, tgt_traj, scene, map_store,
                           other_prior, init_z, atk_mask):
            lw_unnorm = scene.lw * att_std + att_mean
            return adv_gen_loss(
                unnorm(pred), unnorm(tgt_traj),
                other_z, other_prior,
                lw=lw_unnorm, mask=scene.mask, mapixes=scene.map_idx,
                drivable=map_store.drivable(), dx=map_store.dx,
                init_z=init_z, weights=weights,
                veh_coll_buffer=veh_coll_buffer,
                crash_min_t=feasibility_time,
                crash_min_infront=feasibility_infront_min,
                attack_agt_mask=atk_mask,
                packed=map_store.packed, min_dx=map_store.min_dx_m,
            )

        def _adv_loss(*a):
            return _adv_loss_full(*a)["loss"]

        def _dec_fn(z, scene, map_store, emb, ext_future):
            return model.apply(params, z, emb, scene, map_store,
                               ext_future, FT,
                               method="decode_embedding")["future_pred"]

        def _call_planner(pred, pstate):
            if has_pstate:
                return planner_rollout_fn(pred, pstate)
            return planner_rollout_fn(pred)

        def _vg(opt_vars, planner_fut_arg, scene, map_store, emb,
                tgt_prior, other_prior, init_z, atk_mask, ext_future,
                pstate):
            """One decoder forward, two vmapped pullbacks (module doc)."""
            tgt_z, other_z = opt_vars["tgt"], opt_vars["other"]
            z = _combine_z(tgt_z, other_z)
            pred, pullback = jax.vjp(
                lambda zz: _dec_fn(zz, scene, map_store, emb, ext_future), z)
            if open_loop or planner_fut_arg is not None:
                planner_fut = planner_fut_arg
            else:
                # io_callback/fused: planner reacts to the current rollout
                planner_fut = _call_planner(
                    jax.lax.stop_gradient(pred), pstate)

            lt, (c_tgt, g_tgt_direct) = jax.value_and_grad(
                _tgt_loss, argnums=(0, 1))(pred, tgt_z, planner_fut, scene,
                                           tgt_prior)

            def _adv_of(pred_, other_z_):
                # adversarial loss sees its own (internal) planner
                # prediction in closed loop, the recorded planner in open
                # loop (reference :149)
                tgt_traj = planner_fut if open_loop else pred_[:, 0]
                return _adv_loss(pred_, other_z_, tgt_traj, scene,
                                 map_store, other_prior, init_z, atk_mask)

            la, (c_adv, g_other_direct) = jax.value_and_grad(
                _adv_of, argnums=(0, 1))(pred, other_z)

            gz = jax.vmap(lambda c: pullback(c)[0])(jnp.stack([c_tgt, c_adv]))
            # tgt_z enters the decode only at slot 0; other_z everywhere
            # BUT slot 0 (reference z partition, adv_gen_optim.py:63-71)
            grad_tgt = gz[0][:, 0] + g_tgt_direct
            grad_other = gz[1].at[:, 0].set(0.0) + g_other_direct
            return lt + la, {"tgt": grad_tgt, "other": grad_other}

        fns = {}

        @jax.jit
        def run_full(v0, scene, map_store, emb, tgt_prior, other_prior,
                     init_z, atk_mask, planner_fut, ext_future, pstate):
            k = int(statics[10])  # planner_refresh_every
            if (closed_loop_mode == "fused" and not open_loop and k > 1):
                # re-roll the planner every k-th Adam iteration inside the
                # SAME compiled program (one extra decode per super-step;
                # quality/perf trade measured in PERF.md r3)
                def refresh(v):
                    z = _combine_z(v["tgt"], v["other"])
                    pred = _dec_fn(z, scene, map_store, emb, ext_future)
                    return _call_planner(jax.lax.stop_gradient(pred),
                                         pstate)

                vf, losses = run_adam_loop_vg_refresh(
                    lambda v, fut: _vg(v, fut, scene, map_store, emb,
                                       tgt_prior, other_prior, init_z,
                                       atk_mask, ext_future, pstate),
                    refresh, v0, lr, num_iters, k)
            else:
                vf, losses = run_adam_loop_vg(
                    lambda v: _vg(v, planner_fut, scene, map_store, emb,
                                  tgt_prior, other_prior, init_z, atk_mask,
                                  ext_future, pstate),
                    v0, lr, num_iters)
            z_final = _combine_z(vf["tgt"], vf["other"])
            final_pred = _dec_fn(z_final, scene, map_store, emb, None)
            return z_final, final_pred, losses

        fns["run_full"] = run_full

        tx = optax.adam(lr)

        def chunk(v, opt_state, iters, planner_fut, scene, map_store, emb,
                  tgt_prior, other_prior, init_z, atk_mask):
            def step(carry, _):
                vv, os_ = carry
                loss, grads = _vg(vv, planner_fut, scene, map_store, emb,
                                  tgt_prior, other_prior, init_z, atk_mask,
                                  None, None)
                updates, os_ = tx.update(grads, os_, vv)
                vv = optax.apply_updates(vv, updates)
                return (vv, os_), loss
            (v, opt_state), ls = jax.lax.scan(step, (v, opt_state), None,
                                              length=iters)
            return v, opt_state, ls

        fns["chunk"] = jax.jit(chunk, static_argnums=(2,))
        fns["tx_init"] = jax.jit(tx.init)

        @jax.jit
        def decode_full(v, scene, map_store, emb):
            z = _combine_z(v["tgt"], v["other"])
            return z, _dec_fn(z, scene, map_store, emb, None)

        fns["decode_full"] = decode_full

        @jax.jit
        def final_losses(final_pred, planner_final, z_final, scene,
                         map_store, other_prior, init_z, atk_mask):
            # final pass always targets the TRUE planner (reference
            # :187-195 passes the real planner rollout as tgt)
            adv_final = _adv_loss_full(
                final_pred, z_final, planner_final, scene, map_store,
                other_prior, init_z, atk_mask)
            return adv_final["min_agt"], adv_final["min_t"]

        fns["final_losses"] = final_losses
        return fns

    fns = cached_runner("adv_optim", anchors, statics, build)

    init_other_z = jax.lax.stop_gradient(cur_z)
    atk_mask = attack_agt_mask if has_atk_mask else None
    opt_vars0 = {"tgt": cur_z[:, 0], "other": cur_z}

    if open_loop:
        planner_fut_norm = scene.future_gt[:, 0, :FT, :4]  # (B, FT, 4)
        ext_future = planner_fut_norm
    else:
        planner_fut_norm = None
        ext_future = None

    if open_loop or closed_loop_mode in ("io_callback", "fused"):
        z_final, final_pred, losses = fns["run_full"](
            opt_vars0, scene, map_store, embed_info, tgt_prior_distrib,
            other_prior_distrib, init_other_z, atk_mask, planner_fut_norm,
            ext_future, planner_state)
    else:
        # chunked closed loop: K jitted Adam steps per host planner re-roll
        v = opt_vars0
        opt_state = fns["tx_init"](v)
        losses = []
        done = 0
        K = max(1, int(planner_refresh_every))
        while done < num_iters:
            k = min(K, num_iters - done)
            _, cur_pred = fns["decode_full"](v, scene, map_store, embed_info)
            planner_fut = jnp.asarray(
                planner_rollout_fn(cur_pred, planner_state) if has_pstate
                else planner_rollout_fn(cur_pred))
            v, opt_state, ls = fns["chunk"](
                v, opt_state, k, planner_fut, scene, map_store, embed_info,
                tgt_prior_distrib, other_prior_distrib, init_other_z,
                atk_mask)
            # keep ls ON DEVICE: a per-iteration np.asarray here is a D2H
            # sync that both drains the dispatch pipeline and pays this
            # runtime's ~30 ms post-D2H sync latency every iteration
            # (PERF.md r3) — fetch once after the loop instead.
            losses.append(ls)
            done += k
        losses = jnp.concatenate(losses)
        z_final, final_pred = fns["decode_full"](v, scene, map_store,
                                                 embed_info)

    # replace ego with the TRUE planner trajectory (reference :177-193).
    # NOTE: call the CURRENT planner_rollout_fn from this call's scope, not
    # one captured in a cached runner — in chunked mode the runner outlives
    # the per-batch host bridge closure.
    if open_loop:
        planner_final = scene.future_gt[:, 0, :FT, :4]
    else:
        sg_pred = jax.lax.stop_gradient(final_pred)
        planner_final = jnp.asarray(
            planner_rollout_fn(sg_pred, planner_state) if has_pstate
            else planner_rollout_fn(sg_pred))
    final_result = final_pred.at[:, 0].set(planner_final)

    # one more loss pass to extract attacker agent/time (reference :195-209)
    min_agt, min_t = fns["final_losses"](
        final_pred, planner_final, z_final, scene, map_store,
        other_prior_distrib, init_other_z, atk_mask)
    return z_final, final_result, min_agt, min_t, losses, final_pred


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
