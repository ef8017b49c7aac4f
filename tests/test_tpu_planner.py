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

from strive_tpu.maps.lanegraph import (synthetic_lanegraph,
                                       synthetic_lanegraph_forks,
                                       synthetic_lanegraph_ring)
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


def _obs_along(path_fn, speeds, T=12, dt=0.5):
    """Observation futures for agents moving along parametric paths.

    :param path_fn: list of fn(t_seconds) -> (x, y, hx, hy)
    """
    NA = len(path_fn)
    obs_t = np.arange(1, T + 1) * dt
    obs = np.full((NA, T, 4), np.nan, np.float32)
    init = np.zeros((NA, 6), np.float32)
    for a, f in enumerate(path_fn):
        x0, y0, hx0, hy0 = f(0.0)
        init[a] = [x0, y0, hx0, hy0, speeds[a], 0.0]
        for i, t in enumerate(obs_t):
            obs[a, i] = f(t)
    lw = np.full((NA, 2), [4.5, 2.0], np.float32)
    return init, lw, obs, obs_t


def _parity(lg, init, lw, obs, obs_t, tol_pos=0.5, tol_deg=5.0, cfg=None):
    cfg = cfg or PlannerConfig(**PLANNER_CONFIGS["default"])
    host = _host_rollout(lg, cfg, init, lw, obs, obs_t, obs_t)
    dev = _tpu_rollout(lg, cfg, init, lw, obs, obs_t, obs_t)
    assert np.isfinite(dev).all()
    pos_err = np.linalg.norm(host[:, :2] - dev[:, :2], axis=-1)
    assert pos_err.max() < tol_pos, \
        f"max position divergence {pos_err.max():.3f}"
    cosang = np.sum(host[:, 2:4] * dev[:, 2:4], axis=-1)
    assert np.degrees(np.arccos(np.clip(cosang, -1, 1))).max() < tol_deg
    return host, dev, pos_err


@pytest.fixture(scope="module")
def lg_forks():
    return synthetic_lanegraph_forks()


@pytest.fixture(scope="module")
def lg_ring():
    return synthetic_lanegraph_ring()


def test_parity_fork_trunk(lg_forks):
    """Ego approaches a two-level fork on the trunk; the branch-coded walk
    must reproduce the host BFS's main chain (reference
    ``hardcode_goalcond_nusc.py:379-414``)."""
    f = [lambda t: (20.0 + 6.0 * t, 50.0, 1.0, 0.0)]
    init, lw, obs, obs_t = _obs_along(f, [6.0])
    _parity(lg_forks, init, lw, obs, obs_t)


def test_parity_fork_oncoming_branch(lg_forks):
    """An agent on branch B (the NON-main fork branch, heading into the
    curve) interacts with the ego near the fork — the prediction fan has
    to include the branched chains (branch codes / MC slots), which a
    degraded NBR=1 bound would miss."""
    ego = lambda t: (30.0 + 7.0 * t, 50.0, 1.0, 0.0)
    # agent on the B curve, moving along it toward the merge
    curve_x = lambda t: 60.0 + 20 * np.sin(0.25 + 0.12 * t)
    curve_y = lambda t: 50.0 + 40 * (1 - np.cos(0.25 + 0.12 * t))

    def b_agent(t):
        dx = curve_x(t + 0.3) - curve_x(t)
        dy = curve_y(t + 0.3) - curve_y(t)
        n = np.hypot(dx, dy) + 1e-9
        return (curve_x(t), curve_y(t), dx / n, dy / n)

    init, lw, obs, obs_t = _obs_along([ego, b_agent], [7.0, 3.0])
    _parity(lg_forks, init, lw, obs, obs_t)


def test_parity_ring(lg_ring):
    """Curved route spline on a closed loop: ego drives the roundabout."""
    R, cx, cy = 40.0, 64.0, 64.0
    w = 5.0 / R  # 5 m/s angular rate

    def ego(t):
        a = 0.1 + w * t
        return (cx + R * np.cos(a), cy + R * np.sin(a),
                -np.sin(a), np.cos(a))

    init, lw, obs, obs_t = _obs_along([ego], [5.0])
    # curvature makes the constant-ds warp grids differ slightly more
    # than on straight lanes; 1 m over a 54 m rollout is decision parity
    _parity(lg_ring, init, lw, obs, obs_t, tol_pos=1.0, tol_deg=8.0)


def test_parity_interaction_brakes(lg_forks):
    """A slow leader on the ego's own lane forces profile selection to
    actually brake; host and device must pick equivalent profiles
    (reference ``:768-801``) AND the ego must really slow down."""
    ego = lambda t: (30.0 + 7.0 * t, 50.0, 1.0, 0.0)
    leader = lambda t: (48.0 + 1.0 * t, 50.0, 1.0, 0.0)
    init, lw, obs, obs_t = _obs_along([ego, leader], [7.0, 1.0])
    host, dev, _ = _parity(lg_forks, init, lw, obs, obs_t)
    # braking happened: distance covered far below the free-flow 7 m/s
    assert dev[-1, 0] - init[0, 0] < 6.0 * 0.5 * len(obs_t)
    # and the ego does not rear-end the leader in the device rollout
    lead_x = 48.0 + 1.0 * obs_t
    assert np.all(lead_x - dev[:, 0] > 2.0)


def test_parity_randomized_sweep(lg, lg_forks):
    """Randomized host-vs-device divergence sweep over both graphs
    (VERDICT r2 item 3): reports the max/median trajectory divergence and
    fails if the bounded approximations (MC/NBR/dedupe/static warp grid)
    degrade decision parity."""
    rng = np.random.default_rng(7)
    errs = []
    for graph, lanes in [
        (lg, [((40.0, 128.0), (1.0, 0.0)), ((128.0, 40.0), (0.0, 1.0)),
              ((60.0, 64.0), (1.0, 0.0))]),
        (lg_forks, [((10.0, 50.0), (1.0, 0.0)), ((70.0, 50.0), (1.0, 0.0)),
                    ((110.0, 50.0), (1.0, 0.0))]),
    ]:
        for trial in range(4):
            NA = int(rng.integers(1, 4))
            fns, speeds = [], []
            for a in range(NA):
                (x0, y0), (hx, hy) = lanes[int(rng.integers(len(lanes)))]
                x0 = x0 + rng.uniform(-5, 15)
                y0 = y0 + rng.uniform(-1.0, 1.0)
                s = rng.uniform(2.0, 8.0)
                fns.append(lambda t, x0=x0, y0=y0, hx=hx, hy=hy, s=s:
                           (x0 + hx * s * t, y0 + hy * s * t, hx, hy))
                speeds.append(s)
            init, lw, obs, obs_t = _obs_along(fns, speeds)
            cfg = PlannerConfig(**PLANNER_CONFIGS["default"])
            host = _host_rollout(graph, cfg, init, lw, obs, obs_t, obs_t)
            dev = _tpu_rollout(graph, cfg, init, lw, obs, obs_t, obs_t)
            errs.append(
                np.linalg.norm(host[:, :2] - dev[:, :2], axis=-1))
    errs = np.concatenate(errs)
    print(f"divergence sweep: max={errs.max():.3f} m, "
          f"median={np.median(errs):.3f} m, p90={np.quantile(errs, .9):.3f}")
    assert np.median(errs) < 0.25
    assert errs.max() < 1.0


def test_reversing_other_predicted_stopping(lg):
    """A reversing other agent (negative finite-difference speed) must be
    predicted as STOPPING near its observed position, NOT teleported to the
    warp grid's backward clamp point ~17 m behind it along the route
    (ADVICE r4). The reference instead sizes each spline's backward extent
    per-speed (``hardcode_goalcond_nusc.py:290``); the static-grid port
    clamps speeds >= 0 — deviation documented in PARITY.md §16."""
    from strive_tpu.planners.tpu_planner import (StaticPlanCfg,
                                                 _others_step_data,
                                                 build_lane_tables,
                                                 stack_lane_tables)

    cfg = StaticPlanCfg.from_planner_config(
        PlannerConfig(**PLANNER_CONFIGS["default"]))
    tab = stack_lane_tables([build_lane_tables(lg)])

    # on the y=128 lane row, heading +x, speed CLAMPED to 0 (the planner
    # clamps before calling _others_step_data; a raw negative speed would
    # generate negative fan distances that _interp_cols clamps to the grid
    # start). Assert the s=0 fan stays put...
    pos = np.array([100.0, 128.0])
    state0 = jnp.asarray([[pos[0], pos[1], 0.0, 0.0]])
    ocirc, ovalid = _others_step_data(state0, jnp.ones((1,), bool),
                                      jnp.asarray([[4.5, 2.0]]), tab, cfg, 0)
    oc, ov = np.asarray(ocirc), np.asarray(ovalid)
    centers = oc[:, ov, :, :2].reshape(-1, 2)
    d = np.linalg.norm(centers - pos, axis=-1)
    assert d.max() < 4.0, f"s=0 fan escaped to {d.max():.1f} m"

    # ...and that a raw NEGATIVE speed reaching the fan generator ALSO
    # freezes in place now: the r5 forward-only knot slice starts the fan
    # interp at t2[NBB] = 0 (the route-closest point), so negative fan
    # distances clamp to distance 0 — stop-in-place — instead of the
    # pre-slice phantom ~17 m behind (the ADVICE-r4 artifact). The >= 0
    # speed clamp in plan_rollout (PARITY.md §16) is still load-bearing
    # for the SPEED-PROFILE and ego-s0 paths; the fan itself is now
    # negative-proof by construction.
    state_neg = jnp.asarray([[pos[0], pos[1], 0.0, -5.0]])
    ocirc_n, ovalid_n = _others_step_data(
        state_neg, jnp.ones((1,), bool), jnp.asarray([[4.5, 2.0]]), tab,
        cfg, 0)
    cn = np.asarray(ocirc_n)[:, np.asarray(ovalid_n), :, :2].reshape(-1, 2)
    dn = np.linalg.norm(cn - pos, axis=-1)
    assert dn.max() < 4.0, \
        f"negative-speed fan escaped to {dn.max():.1f} m — the forward " \
        "knot slice (distance-0 clamp) regressed; see PARITY.md §16"


def test_rollout_with_reversing_agent_and_negative_ego_speed(lg):
    """Full rollout: a reversing lead agent + a negative initial ego speed
    (both possible via the finite-difference speed estimates, ADVICE r4)
    stay finite and the ego never drives through the reverser's TRUE
    (observed) position."""
    cfg = PlannerConfig(**PLANNER_CONFIGS["default"])
    T, dt = 12, 0.5
    obs_t = np.arange(1, T + 1) * dt
    # ego at x=40 on the y=128 lane, heading +x, init speed NEGATIVE
    # (finite-difference artifact); reverser starts 30 m ahead heading +x
    # but MOVING -x at 4 m/s (closing head-on)
    init = np.zeros((2, 6), np.float32)
    init[0] = [40.0, 128.0, 1.0, 0.0, -2.0, 0.0]
    init[1] = [70.0, 128.0, 1.0, 0.0, -4.0, 0.0]
    obs = np.full((2, T, 4), np.nan, np.float32)
    obs[1, :, 0] = 70.0 - 4.0 * obs_t
    obs[1, :, 1] = 128.0
    obs[1, :, 2] = 1.0
    obs[1, :, 3] = 0.0
    lw = np.full((2, 2), [4.5, 2.0], np.float32)
    dev = _tpu_rollout(lg, cfg, init, lw, obs, obs_t, obs_t)
    assert np.isfinite(dev).all()
    # the ego must SEE the closing reverser and brake to a stop instead of
    # driving into it (the reverser then closing onto the stopped ego is
    # physics, not a planning fault — the ego cannot reverse, reference
    # gen_sprofiles clamps speeds to [0, smax]). Phantom-fan blindness
    # (the pre-clamp bug) would let the ego keep driving while the gap is
    # small.
    rev_x = np.interp(obs_t, np.concatenate([[0.0], obs_t]),
                      np.concatenate([[70.0], obs[1, :, 0]]))
    gap = rev_x - dev[:, 0]
    ego_dx = np.diff(np.concatenate([[40.0], dev[:, 0]]))
    close = gap < 8.0
    assert np.all(ego_dx[close] < 0.3), \
        "ego kept driving into the reversing agent " \
        f"(steps at gap<8 m moved {ego_dx[close].max():.2f} m)"
    # and it did brake from its (clamped-to-0) start rather than NaN out
    assert np.abs(dev[-1, 0] - dev[-2, 0]) < 0.3


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
    # the bridge fn is memoized per (normalizer, dt, future_len) so the
    # adversarial runner cache stays hot across batches
    assert tp.make_fused_fn(state_norm, 0.5, 6) is fn
    pred_un = np.repeat(obs[None, :, :6][:, :, None], 1, axis=2)
    pred_un = obs[None, :, :6, :]  # (1, NA, 6, 4) unnormalized
    pred_norm = jnp.asarray(np.asarray(
        state_norm.normalize(pred_un.astype(np.float32))))
    out = jax.jit(fn)(pred_norm, tp.state)
    assert out.shape == (1, 6, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_interp_forms_bit_exact():
    """The three _interp_cols knot-read forms (HIGHEST matmul, fused
    multiply-reduce, two-read lerp) are bit-exact: every W row has exactly
    two nonzeros, and IEEE addition with exact zeros cannot perturb
    fl((1-w) v0 + w v1). matmul stays the default (fastest measured); the
    msum forms exist as re-testable alternatives for toolchains where the
    batched dot's materialized W operand dominates (PERF.md r5)."""
    import jax

    from strive_tpu.planners import tpu_planner as tpl

    rng = np.random.default_rng(0)
    t = np.cumsum(rng.uniform(0.05, 0.5, 64)).astype(np.float32)
    t -= t[20]
    vals = rng.normal(size=(64, 4)).astype(np.float32)
    tq = rng.uniform(t[0] - 1.0, t[-1] + 1.0, 37).astype(np.float32)
    outs = {}
    orig = tpl._INTERP_FORM
    try:
        for form in ("matmul", "msum", "msum2"):
            tpl._INTERP_FORM = form
            # fresh jit per form (the global is read at trace time)
            outs[form] = np.asarray(jax.jit(tpl._interp_cols)(
                jnp.asarray(tq), jnp.asarray(t), jnp.asarray(vals)))
    finally:
        tpl._INTERP_FORM = orig
    assert np.array_equal(outs["matmul"], outs["msum"]), \
        np.abs(outs["matmul"] - outs["msum"]).max()
    assert np.array_equal(outs["matmul"], outs["msum2"]), \
        np.abs(outs["matmul"] - outs["msum2"]).max()
