"""Differentiable collision penalties on dense padded scenes.

Reimplements reference ``losses/adv_gen_nusc.py`` VehCollLoss (:405-512),
EnvCollLoss (:366-403) and MotionPriorLoss (:343-364), and the training
variants in ``losses/traffic_model.py:166-295``, as pure functions over
``(B, NA, ...)`` arrays with validity masks (the reference's ptr-block
masks become the batch axis).

All trajectories are UNNORMALIZED (x, y, hx, hy).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..maps.queries import get_coll_point
from .common import log_normal


def vehicle_circles(traj, lw, num_circ=5):
    """Disc-approximation centers along each vehicle.

    :param traj: (..., 4) poses
    :param lw: (..., 2) lengths/widths (broadcastable against traj[..., 0])
    :return: centers (..., num_circ, 2), radius (...,)

    Reference ``adv_gen_nusc.py:430-437``: radius = w/2, centers spread
    along the length from -(l/2 - r) to +(l/2 - r) in the heading direction.
    """
    rad = lw[..., 1] / 2.0
    cmin = -(lw[..., 0] / 2.0) + rad
    cmax = (lw[..., 0] / 2.0) - rad
    steps = jnp.linspace(0.0, 1.0, num_circ)
    cent_x = cmin[..., None] + (cmax - cmin)[..., None] * steps  # (..., C)
    cx = traj[..., 0:1] + cent_x * traj[..., 2:3]
    cy = traj[..., 1:2] + cent_x * traj[..., 3:4]
    return jnp.stack([cx, cy], axis=-1), rad


def pair_valid_mask(mask, single_veh_idx=None):
    """(B, NA, NA) ordered-pair validity: both real, i != j, optionally
    restricted to pairs involving agent ``single_veh_idx``
    (reference ``adv_gen_nusc.py:441-461``)."""
    NA = mask.shape[1]
    m = mask[:, :, None] & mask[:, None, :]
    m = m & ~jnp.eye(NA, dtype=bool)[None]
    if single_veh_idx is not None:
        sel = jnp.zeros((NA,), bool).at[single_veh_idx].set(True)
        m = m & (sel[None, :, None] | sel[None, None, :])
    return m


def veh_coll_penalties(traj, lw, mask, num_circ=5, buffer_dist=0.0,
                       single_veh_idx=None):
    """Pairwise circle-approximation collision penalties.

    :param traj: (B, NA, T, 4) UNNORMALIZED
    :param lw: (B, NA, 2) UNNORMALIZED
    :param mask: (B, NA) validity
    :return: penalties (B, T, NA, NA) = 1 - min_dist/penalty_dist (0 where
        not colliding), coll_mask (B, T, NA, NA) True for valid colliding
        pairs.

    Reference ``adv_gen_nusc.py:464-512``.
    """
    B, NA, T, _ = traj.shape
    cent, _ = vehicle_circles(traj, lw[:, :, None, :], num_circ)  # (B,NA,T,C,2)
    rad = lw[..., 1] / 2.0  # (B, NA)
    cent = jnp.moveaxis(cent, 2, 1)  # (B, T, NA, C, 2)
    # min distance over all circle pairs: (B, T, NA, NA)
    diff = cent[:, :, :, None, :, None, :] - cent[:, :, None, :, None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)  # (B, T, NA, NA, C, C)
    min_d = jnp.sqrt(jnp.min(d2.reshape(B, T, NA, NA, -1), axis=-1) + 1e-12)
    pen_dist = rad[:, :, None] + rad[:, None, :] + buffer_dist  # (B, NA, NA)
    pen_dist = pen_dist[:, None]
    valid = pair_valid_mask(mask, single_veh_idx)[:, None]  # (B, 1, NA, NA)
    colliding = (min_d <= pen_dist) & valid
    pen = jnp.where(colliding, 1.0 - min_d / pen_dist, 0.0)
    return pen, colliding


def masked_mean(x, mask, fallback=0.0):
    """Mean of x over True entries of mask; ``fallback`` when empty
    (mirrors the reference returning tensor([0.]) for empty selections)."""
    cnt = jnp.sum(mask)
    s = jnp.sum(jnp.where(mask, x, 0.0))
    return jnp.where(cnt > 0, s / jnp.maximum(cnt, 1), fallback)


def env_coll_penalties(traj, lw, mask, mapixes, drivable, dx,
                       packed=None, min_dx=None):
    """Non-drivable-overlap penalties.

    :param traj: (B, NA, T, 4) UNNORMALIZED
    :param lw: (B, NA, 2) UNNORMALIZED
    :param mapixes: (B,) map index per scene
    :param drivable: (M, H, W) layer-0 raster
    :param packed/min_dx: optional bit-packed raster + static min
        meters-per-pixel; routes the footprint gather through the Pallas
        one-hot kernel (bit-exact, see ``queries.get_coll_point``)
    :return: penalties (B, NA, T), valid (B, NA, T) True where the agent is
        real and *partially* off-road.

    Reference ``adv_gen_nusc.py:366-403`` / ``losses/traffic_model.py:240-295``:
    the collision point comes from the detached trajectory; gradient flows
    only through the trajectory center.
    """
    B, NA, T, _ = traj.shape
    flat = traj.reshape(B * NA * T, 4)
    flat_lw = jnp.broadcast_to(lw[:, :, None, :], (B, NA, T, 2)).reshape(-1, 2)
    flat_map = jnp.broadcast_to(
        mapixes[:, None, None], (B, NA, T)
    ).reshape(-1)
    coll_pt, cp_valid, _ = get_coll_point(
        drivable, dx, jax.lax.stop_gradient(flat), flat_lw, flat_map,
        packed=packed, min_dx=min_dx,
    )
    pen_dist = jnp.sqrt(lw[..., 0] ** 2 / 4.0 + lw[..., 1] ** 2 / 4.0)
    pen_dist = jnp.broadcast_to(pen_dist[:, :, None], (B, NA, T)).reshape(-1)
    # eps-safe norm: the collision point can coincide with the center, and
    # norm(0) has a NaN gradient that would survive the where-mask below
    d = flat[:, :2] - coll_pt
    dist = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)
    pen = jnp.where(cp_valid, 1.0 - dist / pen_dist, 0.0).reshape(B, NA, T)
    valid = cp_valid.reshape(B, NA, T) & mask[:, :, None]
    pen = jnp.where(valid, pen, 0.0)
    return pen, valid


def motion_prior_nll(z, prior_out):
    """-log N(z | prior) per agent (reference ``adv_gen_nusc.py:343-364``)."""
    mean, var = prior_out
    return -log_normal(z, mean, var)
