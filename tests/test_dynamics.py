import numpy as np
import jax.numpy as jnp
import pytest

from strive_tpu import dynamics
from strive_tpu.dynamics import NUSC_BIKE_PARAMS


def test_no_reverse():
    # speed clamps at 0; position does not move backwards
    init = jnp.array([[0.0, 0.0, 1.0, 0.0, 0.5, 0.0]])
    a = jnp.full((1, 4), -10.0)
    ddh = jnp.zeros((1, 4))
    traj = np.asarray(dynamics.sim_traj(init, a, ddh, jnp.array([4.0])))
    assert np.all(traj[..., 4] >= 0.0)
    assert np.all(np.diff(np.concatenate([[0.0], traj[0, :, 0]])) >= 0.0)


def test_speed_and_hdot_clamps():
    init = jnp.array([[0.0, 0.0, 1.0, 0.0, 49.0, 0.0]])
    a = jnp.full((1, 8), 100.0)
    ddh = jnp.full((1, 8), 1000.0)
    traj = np.asarray(dynamics.sim_traj(init, a, ddh, jnp.array([4.0])))
    assert np.all(traj[..., 4] <= NUSC_BIKE_PARAMS.maxs + 1e-5)


def test_parity_with_reference(reference_src, rng):
    import torch
    from models.common import car_dynamics as ref_car_dynamics

    B, NA, T = 2, 3, 6
    init = rng.normal(size=(B, NA, 6)).astype(np.float32)
    h = init[..., 2:4] / np.linalg.norm(init[..., 2:4], axis=-1, keepdims=True)
    init = np.concatenate([init[..., :2], h, np.abs(init[..., 4:5]), init[..., 5:]], axis=-1)
    a = rng.normal(size=(B, NA, T)).astype(np.float32) * 2
    ddh = rng.normal(size=(B, NA, T)).astype(np.float32) * 0.2
    veh_len = (rng.uniform(3, 6, size=(B, NA))).astype(np.float32)

    ours = np.asarray(dynamics.sim_traj(init, a, ddh, veh_len))

    # reference rollout: kinematics2angle -> car_dynamics per step -> kinematics2vec
    from utils.transforms import kinematics2angle, kinematics2vec

    kin = kinematics2angle(torch.tensor(init))
    ref_steps = []
    for t in range(T):
        kin = ref_car_dynamics(
            kin, torch.tensor(a[:, :, t]), torch.tensor(ddh[:, :, t]),
            0.5, 0, 1, 2, 3, 4, torch.tensor(veh_len),
            NUSC_BIKE_PARAMS.maxhdot, NUSC_BIKE_PARAMS.maxs,
        )
        ref_steps.append(kinematics2vec(kin))
    ref = torch.stack(ref_steps, dim=2).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_bike_step_unnorm_roundtrip():
    init = jnp.array([[1.0, 2.0, 0.6, 0.8, 3.0, 0.1]])
    out = dynamics.bike_step(init, jnp.array([0.0]), jnp.array([0.0]), jnp.array([4.5]))
    assert out.shape == (1, 6)
    # heading stays unit
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out)[..., 2:4], axis=-1), 1.0, atol=1e-5
    )
