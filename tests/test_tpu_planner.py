"""TPU-native planner (phase B): decision parity vs the host phase-A port.

The device planner reproduces the host planner's per-dt loop with bounded
fixed shapes (see tpu_planner.py module docstring for the exact
approximations). These tests assert trajectory-level agreement on
synthetic lane graphs — the same validation surface the reference planner
has (it ships no tests; behavior-parity with it is established through
the phase-A port's tests in test_planner.py).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from strive_tpu.maps.lanegraph import synthetic_lanegraph
from strive_tpu.planners import PLANNER_CONFIGS, PlannerConfig, RulePlanner
from strive_tpu.planners.tpu_planner import (StaticPlanCfg, TpuRulePlanner,
                                             build_lane_tables)


@pytest.fixture(scope="module")
def lg():
    return synthetic_lanegraph(extent_m=256.0, spacing_m=64.0)


def _host_rollout(lg, cfg, init_state, lw, other_obs, obs_t, planner_t):
    """Roll the host phase-A planner on one scene."""
    planner = RulePlanner({"m": lg}, ["m"], cfg)
    NA = init_state.shape[0]
    planner.reset(init_state, lw, np.zeros(NA, np.int64), 1,
                  np.zeros(1, np.int64))
    return planner.rollout(other_obs[1:], obs_t, np.array([0, NA - 1]),
                           planner_t)[0]


def _scene(lg, NA=3, seed=0, T=12, dt=0.5):
    """Agents driving along the synthetic grid's lane rows."""
    rng = np.random.default_rng(seed)
    init = np.zeros((NA, 6), np.float32)
    speeds = rng.uniform(3.0, 8.0, NA)
    ys = 128.0 + rng.uniform(-1.0, 1.0, NA)
    xs = 40.0 + np.arange(NA) * 25.0 + rng.uniform(-3, 3, NA)
    for a in range(NA):
        init[a] = [xs[a], ys[a], 1.0, 0.0, speeds[a], 0.0]
    obs_t = np.arange(1, T + 1) * dt
    obs = np.full((NA, T, 4), np.nan, np.float32)
    for a in range(NA):
        obs[a, :, 0] = xs[a] + speeds[a] * obs_t
        obs[a, :, 1] = ys[a]
        obs[a, :, 2] = 1.0
        obs[a, :, 3] = 0.0
    lw = np.full((NA, 2), [4.5, 2.0], np.float32)
    return init, lw, obs, obs_t


def _tpu_rollout(lg, cfg, init_state, lw, other_obs, obs_t, planner_t):
    tp = TpuRulePlanner({"m": lg}, ["m"], cfg)
    NA = init_state.shape[0]
    tp.reset(init_state[None], lw[None], np.ones((1, NA), bool),
             np.zeros(1, np.int64))
    return np.asarray(tp.rollout_batch(other_obs[None], obs_t,
                                       planner_t))[0]


@pytest.mark.parametrize("seed", [0, 3])
def test_decision_parity_straight_lanes(lg, seed):
    cfg = PlannerConfig(**PLANNER_CONFIGS["default"])
    init, lw, obs, obs_t = _scene(lg, NA=3, seed=seed)
    planner_t = obs_t
    host = _host_rollout(lg, cfg, init, lw, obs, obs_t, planner_t)
    dev = _tpu_rollout(lg, cfg, init, lw, obs, obs_t, planner_t)
    assert np.isfinite(dev).all()
    # trajectory-level decision parity: same route, same speed choices
    pos_err = np.linalg.norm(host[:, :2] - dev[:, :2], axis=-1)
    assert pos_err.max() < 0.5, f"max position divergence {pos_err.max():.3f}"
    cosang = np.sum(host[:, 2:4] * dev[:, 2:4], axis=-1)
    assert np.degrees(np.arccos(np.clip(cosang, -1, 1))).max() < 5.0


def test_single_agent_follows_lane(lg):
    """With no other agents the planner drives the lane at max profile."""
    cfg = PlannerConfig(**PLANNER_CONFIGS["default"])
    init, lw, obs, obs_t = _scene(lg, NA=1, seed=1)
    host = _host_rollout(lg, cfg, init, lw, obs, obs_t, obs_t)
    dev = _tpu_rollout(lg, cfg, init, lw, obs, obs_t, obs_t)
    pos_err = np.linalg.norm(host[:, :2] - dev[:, :2], axis=-1)
    assert pos_err.max() < 0.5, f"max position divergence {pos_err.max():.3f}"
    # it actually moves forward along the lane
    assert dev[-1, 0] - init[0, 0] > 5.0


def test_off_lane_constant_heading(lg):
    """An agent far from every lane uses the constant-heading fallback."""
    cfg = PlannerConfig(**PLANNER_CONFIGS["default"])
    init, lw, obs, obs_t = _scene(lg, NA=1, seed=2)
    init[0, 0] = 30.0   # between grid lines
    init[0, 1] = 30.0
    host = _host_rollout(lg, cfg, init, lw, obs, obs_t, obs_t)
    dev = _tpu_rollout(lg, cfg, init, lw, obs, obs_t, obs_t)
    pos_err = np.linalg.norm(host[:, :2] - dev[:, :2], axis=-1)
    assert pos_err.max() < 0.5, f"max position divergence {pos_err.max():.3f}"


def test_fused_bridge_contract(lg):
    """make_fused_fn matches make_planner_host_fn's input/output contract
    and runs under jit (pure jax)."""
    import jax

    from strive_tpu.normalize import state_normalizer_for

    cfg = PlannerConfig(**PLANNER_CONFIGS["default"])
    state_norm = state_normalizer_for(("car", "truck"))
    init, lw, obs, obs_t = _scene(lg, NA=3, seed=4, T=6)
    tp = TpuRulePlanner({"m": lg}, ["m"], cfg)
    tp.reset(init[None], lw[None], np.ones((1, 3), bool),
             np.zeros(1, np.int64))
    fn = tp.make_fused_fn(state_norm, 0.5, 6)
    pred_un = np.repeat(obs[None, :, :6][:, :, None], 1, axis=2)
    pred_un = obs[None, :, :6, :]  # (1, NA, 6, 4) unnormalized
    pred_norm = jnp.asarray(np.asarray(
        state_norm.normalize(pred_un.astype(np.float32))))
    out = jax.jit(fn)(pred_norm)
    assert out.shape == (1, 6, 4)
    assert np.isfinite(np.asarray(out)).all()
