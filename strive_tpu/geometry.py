"""SE(2) frame transforms with heading-as-unit-vector.

Numerically equivalent to the reference implementations in
``src/utils/transforms.py`` (transform2frame :78-139, pairwise_transforms
:31-75, kinematics2angle/vec :8-29) but written as closed-form jnp
expressions instead of batched 2x2 matmuls — elementwise math maps onto the
TPU VPU and fuses with surrounding ops, which matters because these run at
every rollout step inside ``lax.scan``.

Conventions: poses are (..., 3) = (x, y, h) with heading angle, or
(..., 4) = (x, y, hx, hy) with heading as a unit vector.
"""

from __future__ import annotations

import jax.numpy as jnp


def _heading_cos_sin(poses):
    """cos/sin of heading for (..., 3) or (..., 4) poses."""
    if poses.shape[-1] == 3:
        return jnp.cos(poses[..., 2]), jnp.sin(poses[..., 2])
    return poses[..., 2], poses[..., 3]


def _pack_pose(x, y, hcos, hsin, want_angle):
    if want_angle:
        return jnp.stack([x, y, jnp.arctan2(hsin, hcos)], axis=-1)
    return jnp.stack([x, y, hcos, hsin], axis=-1)


def transform2frame(frame, poses, inverse=False):
    """Transform poses into (or out of) the local frame of ``frame``.

    :param frame: (B, 3) or (B, 4) reference poses.
    :param poses: (B, N, 3) or (B, N, 4) poses to transform.
    :param inverse: if True, ``poses`` are local and are mapped back to global.
    :return: (B, N, 3) or (B, N, 4), matching the dim of ``poses``.

    Matches reference ``utils/transforms.py:78-139``.
    """
    want_angle = poses.shape[-1] == 3
    fc, fs = _heading_cos_sin(frame)  # (B,)
    fc = fc[:, None]
    fs = fs[:, None]
    pc, ps = _heading_cos_sin(poses)  # (B, N)
    px, py = poses[..., 0], poses[..., 1]
    fx, fy = frame[:, 0:1], frame[:, 1:2]

    if inverse:
        # rotation: Rp @ Rf^T
        hcos = pc * fc - ps * fs
        hsin = ps * fc + pc * fs
        # translation: Rf^T @ p_t + f_t
        x = fc * px - fs * py + fx
        y = fs * px + fc * py + fy
    else:
        # rotation: Rp @ Rf
        hcos = pc * fc + ps * fs
        hsin = ps * fc - pc * fs
        # translation: Rf @ (p_t - f_t)
        dx = px - fx
        dy = py - fy
        x = fc * dx + fs * dy
        y = -fs * dx + fc * dy

    return _pack_pose(x, y, hcos, hsin, want_angle)


def pairwise_transforms(poses):
    """All-pairs relative poses: out[b, i, j] = pose of j in the frame of i.

    :param poses: (B, N, 3) or (B, N, 4)
    :return: (B, N, N, 3) or (B, N, N, 4)

    Matches reference ``utils/transforms.py:31-75``.
    """
    want_angle = poses.shape[-1] == 3
    c, s = _heading_cos_sin(poses)  # (B, N)
    ci, si = c[:, :, None], s[:, :, None]  # frame i
    cj, sj = c[:, None, :], s[:, None, :]  # pose j
    hcos = cj * ci + sj * si
    hsin = sj * ci - cj * si

    x, y = poses[..., 0], poses[..., 1]
    dx = x[:, None, :] - x[:, :, None]  # t_j - t_i
    dy = y[:, None, :] - y[:, :, None]
    lx = ci * dx + si * dy
    ly = -si * dx + ci * dy

    return _pack_pose(lx, ly, hcos, hsin, want_angle)


def kinematics2angle(kinematics):
    """(..., T, 6)=(x,y,hx,hy,s,hdot) -> (..., T, 5)=(x,y,h,s,hdot).

    Matches reference ``utils/transforms.py:8-17``.
    """
    h = jnp.arctan2(kinematics[..., 3], kinematics[..., 2])
    return jnp.concatenate(
        [kinematics[..., :2], h[..., None], kinematics[..., 4:]], axis=-1
    )


def kinematics2vec(kinematics):
    """(..., T, 5)=(x,y,h,s,hdot) -> (..., T, 6)=(x,y,hx,hy,s,hdot).

    Matches reference ``utils/transforms.py:19-29``.
    """
    h = kinematics[..., 2]
    hvec = jnp.stack([jnp.cos(h), jnp.sin(h)], axis=-1)
    return jnp.concatenate(
        [kinematics[..., :2], hvec, kinematics[..., 3:]], axis=-1
    )


def normalize_heading(pose):
    """Renormalize (hx, hy) of (..., 4) poses to a unit vector."""
    h = pose[..., 2:4]
    h = h / jnp.linalg.norm(h, axis=-1, keepdims=True)
    return jnp.concatenate([pose[..., :2], h], axis=-1)


def interp_traj(future_pred, scale_factor=3):
    """Linearly upsample trajectories along time, renormalizing headings.

    Matches ``torch.nn.functional.interpolate(mode='linear')`` semantics
    (align_corners=False) used at reference ``losses/adv_gen_nusc.py:625-644``:
    output sample i reads input coordinate (i + 0.5)/scale - 0.5, clamped.

    :param future_pred: (..., T, 4)
    :return: (..., T*scale_factor, 4)
    """
    T = future_pred.shape[-2]
    out_t = T * scale_factor
    coords = (jnp.arange(out_t, dtype=jnp.float32) + 0.5) / scale_factor - 0.5
    coords = jnp.clip(coords, 0.0, T - 1)
    lo = jnp.floor(coords).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, T - 1)
    w = (coords - lo)[..., None]
    interp = future_pred[..., lo, :] * (1.0 - w) + future_pred[..., hi, :] * w
    return normalize_heading(interp)


def angle_diff(theta1, theta2):
    """Smallest signed angle difference; reference ``nuscenes_utils.py:134-143``."""
    period = 2 * jnp.pi
    diff = (theta1 - theta2 + period / 2) % period - period / 2
    return jnp.where(diff > jnp.pi, diff - 2 * jnp.pi, diff)
