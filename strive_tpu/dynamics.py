"""Kinematic bicycle model.

Matches reference ``models/common.py:47-68`` (car_dynamics) and
``models/traffic_model.py:714-733`` (sim_traj) exactly: one Euler step with
the same clamp order (hdot clamp, heading update with |s_old|, speed clamp to
[0, max_s] — no reverse), position updated with *new* speed and heading.

The rollout is a ``lax.scan`` instead of a Python loop; state is kept in
float32 regardless of the model compute dtype (bf16 drifts over the
normalize/unnormalize round trips done every step — SURVEY §7.4.5).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .geometry import kinematics2angle, kinematics2vec


class BikeParams(NamedTuple):
    """Bicycle rollout parameters; reference ``datasets/utils.py:118-127``."""

    maxs: float = 50.0
    maxhdot: float = 2.0 * jnp.pi
    dt: float = 0.5
    a_mean: float = 0.409074
    a_std: float = 1.045530
    ddh_mean: float = 0.000046
    ddh_std: float = 0.075032


NUSC_BIKE_PARAMS = BikeParams()


def car_dynamics(kin, a, ddh, dt, vehicle_length, max_hdot, max_s):
    """One bicycle Euler step on angle-parameterized state.

    :param kin: (..., 5) = (x, y, h, s, hdot), UNNORMALIZED, heading as angle
    :param a: (...) acceleration
    :param ddh: (...) yaw acceleration
    :param vehicle_length: (...) or broadcastable
    :return: new state (..., 5)

    Matches reference ``models/common.py:47-68``.
    """
    x, y, h, s, hdot = (kin[..., i] for i in range(5))
    newhdot = jnp.clip(hdot + ddh * dt, -max_hdot, max_hdot)
    newh = h + dt * jnp.abs(s) / vehicle_length * newhdot
    news = jnp.clip(s + a * dt, 0.0, max_s)
    newy = y + news * jnp.sin(newh) * dt
    newx = x + news * jnp.cos(newh) * dt
    return jnp.stack([newx, newy, newh, news, newhdot], axis=-1)


def sim_traj(init_state, a, ddh, vehicle_len, params: BikeParams = NUSC_BIKE_PARAMS):
    """Roll the bicycle model forward with lax.scan.

    Everything UNNORMALIZED; matches reference
    ``models/traffic_model.py:714-733``.

    :param init_state: (..., 6) = (x, y, hx, hy, s, hdot)
    :param a: (..., T) acceleration profile
    :param ddh: (..., T) yaw-accel profile
    :param vehicle_len: (...) vehicle lengths
    :return: (..., T, 6) trajectory with heading as a unit vector
    """
    kin0 = kinematics2angle(init_state).astype(jnp.float32)

    def step(kin, a_ddh):
        a_t, ddh_t = a_ddh
        new_kin = car_dynamics(
            kin, a_t, ddh_t, params.dt, vehicle_len, params.maxhdot, params.maxs
        )
        return new_kin, new_kin

    a_t_first = jnp.moveaxis(a, -1, 0)
    ddh_t_first = jnp.moveaxis(ddh, -1, 0)
    _, kin_seq = jax.lax.scan(step, kin0, (a_t_first, ddh_t_first))
    kin_seq = jnp.moveaxis(kin_seq, 0, -2)  # (..., T, 5)
    return kinematics2vec(kin_seq)


def bike_step(init_state, a_norm, ddh_norm, vehicle_len,
              params: BikeParams = NUSC_BIKE_PARAMS):
    """Single rollout step from NORMALIZED (a, ddh) network outputs.

    Unnormalizes accelerations with a/ddh stats (reference
    ``traffic_model.py:645-646``), steps the bicycle once, returns the new
    UNNORMALIZED 6-dim state.

    :param init_state: (..., 6) UNNORMALIZED
    :param a_norm, ddh_norm: (...) normalized network outputs
    """
    a = a_norm * params.a_std + params.a_mean
    ddh = ddh_norm * params.ddh_std + params.ddh_mean
    kin = kinematics2angle(init_state)
    new_kin = car_dynamics(
        kin, a, ddh, params.dt, vehicle_len, params.maxhdot, params.maxs
    )
    return kinematics2vec(new_kin)
