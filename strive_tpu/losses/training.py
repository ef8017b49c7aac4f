"""Training loss and evaluation errors for the traffic model.

Dense-masked equivalents of reference ``losses/traffic_model.py``:
TrafficModelLoss (:20-118), compute_err (:120-164), compute_disp_err
(:297-364), compute_coll_rate_env (:366-419).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..maps.queries import check_on_layer
from ..scene import SceneBatch
from .common import kl_normal, log_normal
from .penalties import env_coll_penalties, veh_coll_penalties

ENV_COLL_THRESH = 0.05  # reference losses/traffic_model.py:17
VEH_COLL_THRESH = 0.02  # reference losses/traffic_model.py:18


def traffic_model_loss(scene: SceneBatch, pred, weights, state_norm, att_norm,
                       map_store=None):
    """Weighted CVAE training loss.

    :param pred: dict with future_pred (B,NA,FT,4), prior_out, posterior_out,
        optionally future_samp.
    :param weights: dict with recon/kl/coll_veh_prior/coll_env_prior floats.
    :return: dict of scalar losses + per-element terms for logging.

    Matches reference ``losses/traffic_model.py:34-118``: recon NLL under a
    unit-variance Gaussian on visible frames, KL(q||p) per agent, optional
    prior-sample collision penalties (vehicle over all agents normalized by
    pair count; env on ego only).
    """
    gt = scene.future_gt
    fp = pred["future_pred"]
    w_frame = scene.future_vis * scene.mask[:, :, None].astype(jnp.float32)

    recon_nll = -log_normal(fp, gt[..., :4], jnp.ones_like(fp))  # (B,NA,FT)
    recon_loss = jnp.sum(recon_nll * w_frame) / jnp.maximum(jnp.sum(w_frame), 1.0)

    pm, pv = pred["prior_out"]
    qm, qv = pred["posterior_out"]
    kl = kl_normal(qm, qv, pm, pv)  # (B, NA)
    w_agent = scene.mask.astype(jnp.float32)
    kl_loss = jnp.sum(kl * w_agent) / jnp.maximum(jnp.sum(w_agent), 1.0)

    loss = weights["recon"] * recon_loss + weights["kl"] * kl_loss
    out = {"recon_loss": recon_loss, "kl_loss": kl_loss}

    if weights.get("coll_veh_prior", 0.0) > 0.0 and "future_samp" in pred:
        samp = state_norm.unnormalize(pred["future_samp"])
        lw_unnorm = att_norm.unnormalize(scene.lw)
        pens, _ = veh_coll_penalties(samp, lw_unnorm, scene.mask)
        na = jnp.sum(scene.mask, axis=1).astype(jnp.float32)
        num_pairs = jnp.sum(na * na - na)
        coll_veh = jnp.sum(pens) / jnp.maximum(num_pairs, 1.0)
        loss = loss + weights["coll_veh_prior"] * coll_veh
        out["coll_veh_prior"] = coll_veh

    if weights.get("coll_env_prior", 0.0) > 0.0 and "future_samp" in pred:
        assert map_store is not None
        ego_samp = state_norm.unnormalize(pred["future_samp"][:, 0:1])
        ego_lw = att_norm.unnormalize(scene.lw[:, 0:1])
        pens, _ = env_coll_penalties(
            ego_samp, ego_lw, scene.mask[:, 0:1], scene.map_idx,
            map_store.drivable(), map_store.dx,
            packed=map_store.packed, min_dx=map_store.min_dx_m,
        )
        # reference averages over every (ego, T) entry including zeros
        coll_env = jnp.mean(pens)
        loss = loss + weights["coll_env_prior"] * coll_env
        out["coll_env_prior"] = coll_env

    out["loss"] = loss
    return out


def compute_err(scene: SceneBatch, pred, state_norm):
    """Interpretable errors (reference ``losses/traffic_model.py:120-164``).

    Returns masked means: pos_err (m), ang_err (deg), and the prior NLL /
    Mahalanobis distance of the posterior mean.
    """
    gt = state_norm.unnormalize(scene.future_gt)
    fp = state_norm.unnormalize(pred["future_pred"])
    w = scene.future_vis * scene.mask[:, :, None].astype(jnp.float32)
    wsum = jnp.maximum(jnp.sum(w), 1.0)

    pos_err = jnp.linalg.norm(gt[..., :2] - fp[..., :2], axis=-1)
    gh = gt[..., 2:4] / jnp.linalg.norm(gt[..., 2:4], axis=-1, keepdims=True)
    ph = fp[..., 2:4] / jnp.linalg.norm(fp[..., 2:4], axis=-1, keepdims=True)
    ang_err = jnp.rad2deg(jnp.arccos(jnp.clip(jnp.sum(gh * ph, -1), -1, 1)))

    post_mean = pred["posterior_out"][0]
    pm, pv = pred["prior_out"]
    z_logprob = log_normal(post_mean, pm, pv)
    z_mdist = jnp.linalg.norm((post_mean - pm) / jnp.sqrt(pv), axis=-1)
    wa = scene.mask.astype(jnp.float32)
    wasum = jnp.maximum(jnp.sum(wa), 1.0)

    return {
        "pos_err": jnp.sum(pos_err * w) / wsum,
        "ang_err": jnp.sum(ang_err * w) / wsum,
        "z_logprob": jnp.sum(z_logprob * wa) / wasum,
        "z_mdist": jnp.sum(z_mdist * wa) / wasum,
    }


def compute_disp_err(scene: SceneBatch, future_pred, state_norm):
    """Sample displacement errors, EGO ONLY (guaranteed fully observed).

    :param future_pred: (B, NS, NA, FT, 4) NORMALIZED samples
    :return: dict of (B,) arrays: pos_minADE/minFDE, ang_minADE/minFDE, APD.

    Reference ``losses/traffic_model.py:297-364``.
    """
    FT = min(future_pred.shape[3], scene.future_gt.shape[2])
    gt = state_norm.unnormalize(scene.future_gt[:, 0, :FT])  # (B, FT, 6)
    pred = state_norm.unnormalize(future_pred[:, :, 0, :FT])  # (B, NS, FT, 4)
    B, NS = pred.shape[:2]

    diff = jnp.linalg.norm(gt[:, None, :, :2] - pred[..., :2], axis=-1)  # B,NS,FT
    ade = jnp.mean(diff, axis=-1)
    min_ade = jnp.min(ade, axis=1)
    fde = diff[..., -1]
    min_fde = jnp.min(fde, axis=1)

    pp = pred[..., :2]
    pw = jnp.linalg.norm(pp[:, :, None] - pp[:, None, :], axis=-1)  # B,NS,NS,FT
    apd = jnp.sum(pw, axis=(1, 2, 3)) / (NS * (NS - 1) * FT)

    gh = gt[..., 2:4] / jnp.linalg.norm(gt[..., 2:4], axis=-1, keepdims=True)
    ph = pred[..., 2:4] / jnp.linalg.norm(pred[..., 2:4], axis=-1, keepdims=True)
    ang = jnp.rad2deg(
        jnp.arccos(jnp.clip(jnp.sum(gh[:, None] * ph, -1), -1, 1))
    )  # B, NS, FT
    ang_ade = jnp.mean(ang, axis=-1)
    return {
        "pos_minADE": min_ade,
        "pos_minFDE": min_fde,
        "ang_minADE": jnp.min(ang_ade, axis=1),
        "ang_minFDE": jnp.min(ang[..., -1], axis=1),
        "APD": apd,
    }


def compute_coll_rate_env(scene: SceneBatch, future_pred, map_store,
                          state_norm, att_norm, ego_only=False):
    """Map-collision rate over samples (reference
    ``losses/traffic_model.py:366-419``).

    :param future_pred: (B, NS, NA, FT, 4) NORMALIZED
    :return: dict with did_collide (B, NS, NA) bool (False for padded),
        num_coll_map, num_traj_map scalars.
    """
    B, NS, NA, FT, _ = future_pred.shape
    pred = state_norm.unnormalize(future_pred).reshape(B * NS * NA * FT, 4)
    lw = att_norm.unnormalize(scene.lw)
    lw_flat = jnp.broadcast_to(
        lw[:, None, :, None, :], (B, NS, NA, FT, 2)
    ).reshape(-1, 2)
    mapix = jnp.broadcast_to(
        scene.map_idx[:, None, None, None], (B, NS, NA, FT)
    ).reshape(-1)
    frac = check_on_layer(map_store.drivable(), map_store.dx, pred, lw_flat,
                          mapix).reshape(B, NS, NA, FT)
    coll_frame = frac < (1.0 - ENV_COLL_THRESH)
    did = jnp.any(coll_frame, axis=-1) & scene.mask[:, None, :]
    if ego_only:
        did = did[:, :, 0:1]
        n_traj = B * NS
    else:
        n_traj = jnp.sum(scene.mask) * NS
    return {
        "did_collide": did,
        "num_coll_map": jnp.sum(did).astype(jnp.float32),
        "num_traj_map": n_traj,
    }


def compute_coll_rate_env_from_traj(fut_unnorm, lw_unnorm, map_store, map_idx):
    """Per-agent map collision over an UNNORMALIZED trajectory batch
    (reference ``losses/traffic_model.py:366-419`` /
    ``compute_coll_rate_env_from_traj`` as used by ``eval_adv_gen.py:404``).

    :param fut_unnorm: (NA, T, 4) world-frame trajectories (NaN frames ok)
    :param lw_unnorm: (NA, 2)
    :param map_idx: int map index
    :return: (NA,) bool did_collide
    """
    fut = jnp.asarray(fut_unnorm)
    NA, T = fut.shape[:2]
    valid = ~jnp.isnan(fut).any(-1)  # (NA, T)
    flat = jnp.where(valid[..., None], fut, 0.0).reshape(NA * T, 4)
    lw_flat = jnp.broadcast_to(jnp.asarray(lw_unnorm)[:, None, :],
                               (NA, T, 2)).reshape(-1, 2)
    mapix = jnp.full((NA * T,), int(map_idx), jnp.int32)
    frac = check_on_layer(map_store.drivable(), map_store.dx, flat, lw_flat,
                          mapix).reshape(NA, T)
    coll_frame = (frac < (1.0 - ENV_COLL_THRESH)) & valid
    return np.asarray(jnp.any(coll_frame, axis=-1))
