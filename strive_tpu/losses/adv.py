"""Adversarial / avoidance latent-optimization losses.

Dense-masked equivalents of reference ``losses/adv_gen_nusc.py``:
TgtMatchingLoss (:14-51), AdvGenLoss (:53-262), AvoidCollLoss (:264-341),
check_behind (:646-673). Per-scene softmin bookkeeping over the flat node
dimension becomes masked softmax over the (NA, T) axes of each scene.

All trajectories UNNORMALIZED. Everything here is jit-compatible; the
two-decode detach trick of the reference optimizers is reproduced by the
callers with ``stop_gradient``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry import interp_traj
from .penalties import (
    env_coll_penalties,
    masked_mean,
    motion_prior_nll,
    veh_coll_penalties,
)


def _weighted_mean(x, w):
    return jnp.sum(x * w) / jnp.maximum(jnp.sum(w), 1.0)


def tgt_matching_loss(future_pred, tgt_traj, z, prior_out, weights,
                      frame_weights=None, agent_mask=None, ref_compat=True):
    """Match a decoded future to a target while staying likely under the prior.

    :param future_pred, tgt_traj: (..., 4) UNNORMALIZED, same shape
    :param frame_weights: optional weights broadcastable to (...) selecting
        frames (the reference filters to visible frames before calling).
    :param agent_mask: optional mask for the motion-prior term's agents.
    :param ref_compat: reproduce the reference bug at ``adv_gen_nusc.py:46``
        where the motion-prior weight multiplies the *matching* loss instead
        of the prior NLL. Set False for the fixed behavior.

    Reference ``adv_gen_nusc.py:14-51``.
    """
    out = {}
    loss = 0.0
    tgt_loss_mean = 0.0
    if weights.get("match_ext", 0.0) > 0.0:
        tgt_loss = jnp.sum((future_pred - tgt_traj) ** 2, axis=-1)
        tgt_loss_mean = (jnp.mean(tgt_loss) if frame_weights is None
                         else _weighted_mean(tgt_loss, frame_weights))
        loss = loss + weights["match_ext"] * tgt_loss_mean
        out["match_ext_loss"] = tgt_loss_mean

    if weights.get("motion_prior_ext", 0.0) > 0.0:
        nll = motion_prior_nll(z, prior_out)
        nll_mean = (jnp.mean(nll) if agent_mask is None
                    else _weighted_mean(nll, agent_mask.astype(nll.dtype)))
        prior_term = tgt_loss_mean if ref_compat else nll_mean
        loss = loss + weights["motion_prior_ext"] * prior_term
        out["motion_prior_ext_loss"] = nll_mean

    out["loss"] = loss
    return out


def check_behind(attacker_fut, tgt_fut, crash_min_infront):
    """(B, NA, T) True where the agent is behind the target at that step.

    Reference ``adv_gen_nusc.py:646-673``.
    """
    tgt_h = tgt_fut[:, None, :, 2:4]
    d = attacker_fut[..., :2] - tgt_fut[:, None, :, :2]
    n = jnp.linalg.norm(d, axis=-1)
    cossim = jnp.where(n > 1e-9, jnp.sum(d * tgt_h, -1) / jnp.maximum(n, 1e-9),
                       jnp.inf)
    return cossim < crash_min_infront


def adv_gen_loss(future_pred, tgt_traj, z, prior_out, *, lw, mask, mapixes,
                 drivable, dx, init_z, weights, veh_coll_buffer=0.0,
                 crash_min_t=0, crash_min_infront=None, attack_agt_mask=None,
                 packed=None, min_dx=None):
    """The adversarial objective (reference ``adv_gen_nusc.py:53-262``).

    :param future_pred: (B, NA, T, 4) UNNORMALIZED; agent 0 models the planner
    :param tgt_traj: (B, T, 4) UNNORMALIZED planner trajectory to attack
    :param z, prior_out, init_z: (B, NA, D); ego entries are ignored
    :param lw: (B, NA, 2) UNNORMALIZED
    :param mask: (B, NA) real-agent mask
    :param attack_agt_mask: optional (B, NA) restricting candidate attackers
    :return: dict with 'loss', per-component values, and 'min_agt'/'min_t'
        (B,) current most-likely attacker index (dense, ego=0) and timestep.
    """
    B, NA, T, _ = future_pred.shape
    idx = jnp.arange(NA)
    nonego = mask & (idx[None, :] > 0)  # (B, NA)
    Tp = T - crash_min_t

    out = {}
    loss = 0.0

    # --- adv_crash: softmin-weighted squared distance to the planner -------
    atk_pred = future_pred[:, :, crash_min_t:]
    tgt_pred = tgt_traj[:, crash_min_t:, :4]
    valid = jnp.broadcast_to(nonego[:, :, None], (B, NA, Tp))
    diff = atk_pred[..., :2] - tgt_pred[:, None, :, :2]
    # invalid rows (ego/padding) may coincide with the target: mask them
    # before the norm and use an eps-safe sqrt so no NaN grads leak through
    diff = jnp.where(valid[..., None], diff, 1.0)
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)  # (B, NA, Tp)
    min_dist_in = jnp.where(valid, dist, jnp.inf)

    if crash_min_infront is not None:
        behind_steps = check_behind(
            jax.lax.stop_gradient(atk_pred), jax.lax.stop_gradient(tgt_pred),
            crash_min_infront,
        )
        behind_traj = jnp.all(behind_steps | ~valid, axis=2, keepdims=True)
        behind_traj = jnp.broadcast_to(behind_traj, behind_steps.shape)
        # if EVERY candidate is behind, ignore the filter (reference :120-122)
        n_valid = jnp.sum(valid)
        all_behind = jnp.sum(behind_traj & valid) == jnp.maximum(n_valid, 1)
        behind_traj = jnp.where(all_behind, False, behind_traj)
        min_dist_in = jnp.where(behind_traj, jnp.inf, min_dist_in)

    if attack_agt_mask is not None:
        min_dist_in = jnp.where(
            attack_agt_mask[:, :, None], min_dist_in, jnp.inf
        )

    # masked softmin per scene over (NA, Tp)
    logits = -min_dist_in.reshape(B, NA * Tp)
    lmax = jnp.max(jnp.where(jnp.isfinite(logits), logits, -jnp.inf),
                   axis=1, keepdims=True)
    lmax = jnp.where(jnp.isfinite(lmax), lmax, 0.0)
    ex = jnp.where(jnp.isfinite(logits), jnp.exp(logits - lmax), 0.0)
    denom = jnp.sum(ex, axis=1, keepdims=True)
    softmin = jnp.where(denom > 0, ex / jnp.maximum(denom, 1e-30), 0.0)

    flat_arg = jnp.argmax(softmin, axis=1)  # (B,)
    min_agt = flat_arg // Tp
    min_t = flat_arg % Tp + crash_min_t
    out["min_agt"] = min_agt
    out["min_t"] = min_t

    dist_sq = (dist.reshape(B, NA * Tp)) ** 2
    adv_crash = jnp.sum(softmin * jnp.where(jnp.isfinite(dist_sq), dist_sq, 0.0)
                        * valid.reshape(B, NA * Tp), axis=1)  # (B,)
    if weights.get("adv_crash", 0.0) > 0.0:
        loss = loss + weights["adv_crash"] * jnp.mean(adv_crash)
        out["adv_crash_loss"] = jnp.mean(adv_crash)

    # prior reweighting: likely attackers get the *_atk weights ------------
    prior_reweight = 1.0 - jnp.sum(
        jax.lax.stop_gradient(softmin).reshape(B, NA, Tp), axis=2
    )  # (B, NA)

    if weights.get("motion_prior", 0.0) > 0.0:
        nll = motion_prior_nll(z, prior_out)  # (B, NA)
        coeff = (prior_reweight * weights["motion_prior"]
                 + (1.0 - prior_reweight) * weights.get("motion_prior_atk", 0.0))
        mp = _weighted_mean(nll * coeff, nonego.astype(nll.dtype))
        loss = loss + mp
        out["motion_prior_loss"] = mp

    # regularizers on x3-interpolated trajectories --------------------------
    fut_interp = interp_traj(future_pred, scale_factor=3)
    need_veh = (weights.get("coll_veh", 0.0) > 0.0
                or weights.get("coll_veh_plan", 0.0) > 0.0)
    if need_veh:
        pens, coll = veh_coll_penalties(fut_interp, lw, mask,
                                        buffer_dist=veh_coll_buffer)

    if weights.get("coll_veh", 0.0) > 0.0:
        pair_nonego = (idx[None, :, None] > 0) & (idx[None, None, :] > 0)
        m = coll & pair_nonego[:, None]
        veh_loss = masked_mean(pens, m)
        loss = loss + weights["coll_veh"] * veh_loss
        out["coll_veh_loss"] = veh_loss

    if weights.get("coll_veh_plan", 0.0) > 0.0:
        w_vec = jnp.where(idx[None, :] == 0, 1.0, prior_reweight)  # (B, NA)
        wmat = jnp.where(
            idx[None, :, None] == 0, w_vec[:, None, :],
            jnp.where(idx[None, None, :] == 0, w_vec[:, :, None], 1.0),
        )  # (B, NA, NA)
        ego_pair = (idx[None, :, None] == 0) | (idx[None, None, :] == 0)
        m = coll & ego_pair[:, None]
        plan_loss = masked_mean(pens * wmat[:, None], m)
        loss = loss + weights["coll_veh_plan"] * plan_loss
        out["coll_veh_plan_loss"] = plan_loss

    if weights.get("coll_env", 0.0) > 0.0:
        env_pens, env_valid = env_coll_penalties(
            fut_interp, lw, nonego, mapixes, drivable, dx,
            packed=packed, min_dx=min_dx,
        )
        env_loss = masked_mean(env_pens, env_valid)
        loss = loss + weights["coll_env"] * env_loss
        out["coll_env_loss"] = env_loss

    if weights.get("init_z", 0.0) > 0.0:
        sq = jnp.sum((init_z - z) ** 2, axis=-1)  # (B, NA)
        coeff = (prior_reweight * weights["init_z"]
                 + (1.0 - prior_reweight) * weights.get("init_z_atk", 0.0))
        # the reference SUMS this term over agents (adv_gen_nusc.py:222)
        init_loss = jnp.sum(sq * coeff * nonego.astype(sq.dtype))
        loss = loss + init_loss
        out["init_loss"] = init_loss

    out["loss"] = loss
    return out


def avoid_coll_loss(future_pred, z, prior_out, *, lw, mask, mapixes, drivable,
                    dx, init_z, weights, veh_coll_buffer=0.0,
                    single_veh_idx=None, z_mask=None,
                    packed=None, min_dx=None):
    """Collision-avoidance objective (reference ``adv_gen_nusc.py:264-341``).

    :param future_pred: (B, NA, T, 4) UNNORMALIZED
    :param z, prior_out, init_z: (B, NA, D); ``z_mask`` (B, NA) selects which
        agents' latents the prior/init terms apply to (the reference passes
        only the optimized agents' z — e.g. the planner node in sol optim).
    :param single_veh_idx: restrict collision terms to pairs involving this
        agent index (0 = planner node, used by solution optimization).
    """
    B, NA = future_pred.shape[:2]
    if z_mask is None:
        z_mask = mask
    zw = z_mask.astype(jnp.float32)
    out = {}
    loss = 0.0
    fut_interp = interp_traj(future_pred, scale_factor=3)

    if weights.get("coll_veh", 0.0) > 0.0:
        pens, coll = veh_coll_penalties(fut_interp, lw, mask,
                                        buffer_dist=veh_coll_buffer,
                                        single_veh_idx=single_veh_idx)
        veh_loss = masked_mean(pens, coll)
        loss = loss + weights["coll_veh"] * veh_loss
        out["coll_veh_loss"] = veh_loss

    if weights.get("coll_env", 0.0) > 0.0:
        if single_veh_idx is not None:
            traj = fut_interp[:, single_veh_idx : single_veh_idx + 1]
            env_mask = mask[:, single_veh_idx : single_veh_idx + 1]
            env_lw = lw[:, single_veh_idx : single_veh_idx + 1]
        else:
            traj, env_mask, env_lw = fut_interp, mask, lw
        env_pens, env_valid = env_coll_penalties(
            traj, env_lw, env_mask, mapixes, drivable, dx,
            packed=packed, min_dx=min_dx,
        )
        env_loss = masked_mean(env_pens, env_valid)
        loss = loss + weights["coll_env"] * env_loss
        out["coll_env_loss"] = env_loss

    if weights.get("motion_prior", 0.0) > 0.0:
        nll = motion_prior_nll(z, prior_out)
        mp = _weighted_mean(nll, zw)
        loss = loss + weights["motion_prior"] * mp
        out["motion_prior_loss"] = mp

    if weights.get("init_z", 0.0) > 0.0:
        sq = jnp.sum((init_z - z) ** 2, axis=-1)
        init_loss = _weighted_mean(sq, zw)
        loss = loss + weights["init_z"] * init_loss
        out["init_loss"] = init_loss

    out["loss"] = loss
    return out
