import numpy as np
import pytest

from strive_tpu.maps.lanegraph import synthetic_lanegraph
from strive_tpu.planners import RulePlanner, PlannerConfig, PLANNER_CONFIGS
from strive_tpu.planners.hardcode import (
    compute_speed_profile,
    sprof2dists,
    gen_sprofiles,
    boxes2circles,
    approx_bbox_distance,
    score_dists,
    get_lane_matches,
    xyh2speed,
    postprocess_act_for_speed,
)


@pytest.fixture(scope="module")
def lg():
    return synthetic_lanegraph(extent_m=128.0, spacing_m=32.0, res_m=2.0)


def test_speed_profile_clamps():
    up = compute_speed_profile(0.0, 5.0, 2.0, 20, 0.2)
    assert up[0] == 0.0 and up[-1] == 5.0 and np.all(np.diff(up) >= 0)
    down = compute_speed_profile(5.0, 1.0, 2.0, 10, 0.2)
    assert down[0] == 5.0 and down[-1] == 1.0 and np.all(np.diff(down) <= 0)
    const = compute_speed_profile(3.0, 3.0, 2.0, 4, 0.2)
    np.testing.assert_allclose(const, 3.0)


def test_sprof2dists():
    prof = np.array([2.0, 2.0, 2.0])
    np.testing.assert_allclose(sprof2dists(prof, 0.5), [0.0, 1.0, 2.0])


def test_gen_sprofiles_count():
    profs = gen_sprofiles(5.0, 0.2, 25, [1.0], 3.0, 15.0, 5)
    assert len(profs) == 25  # NS * NS per accfac
    for p in profs:
        assert len(p["sprof"]) == 26
        assert np.all(p["sprof"] >= 0) and np.all(p["sprof"] <= 15.0 + 1e-9)


def test_boxes2circles_cover():
    b = np.array([[[0.0, 0.0, 0.0, 4.0, 2.0]]])
    c = boxes2circles(b)
    assert c.shape == (1, 1, 5, 3)
    # center circle radius = w/2
    np.testing.assert_allclose(c[0, 0, 4], [0, 0, 1.0])
    # corner circles along the length axis
    assert np.abs(c[0, 0, :4, 0]).max() <= 2.0


def test_approx_bbox_distance_sign():
    ego = np.array([[[0.0, 0.0, 0.0, 4.0, 2.0]]])
    near = np.array([[[1.0, 0.0, 0.0, 4.0, 2.0]]])
    far = np.array([[[30.0, 0.0, 0.0, 4.0, 2.0]]])
    assert approx_bbox_distance(ego, near)[0, 0] < 0  # overlapping
    assert approx_bbox_distance(ego, far)[0, 0] > 20  # clear


def test_score_dists():
    p = score_dists(np.array([-1.0, 0.0, 50.0]), 0.7, 0.05)
    assert p[0] == 1.0 and p[1] == 1.0 and p[2] < 1e-6


def test_lane_matches(lg):
    # on a +x lane at y=32
    m = get_lane_matches(64.0, 32.0, 0.0, lg,
                         cdistmax=1.0 - np.cos(np.radians(20.0)),
                         xydistmax=2.0)
    assert m["ixes"].shape[0] > 0
    # wrong heading finds nothing on that lane nearby
    m2 = get_lane_matches(64.0, 32.0, np.pi, lg,
                          cdistmax=1.0 - np.cos(np.radians(20.0)),
                          xydistmax=2.0)
    for close in m2["closest"]:
        assert abs(close[1] - 32.0) > 1.0  # matches only the -x lane


def test_postprocess_exact_speed():
    x, y, h = postprocess_act_for_speed(0, 0, 0.0, 1.1, 0.2, 0.1, 5.0, 0.2)
    assert abs(xyh2speed(0, 0, x, y, h, 0.2) - 5.0) < 1e-6


def test_rollout_straight_lane(lg):
    cfg = PlannerConfig(**PLANNER_CONFIGS["default"])
    planner = RulePlanner({"m0": lg}, ["m0"], cfg)
    # ego on the y=32 +x lane at 5 m/s; one other far away
    init_state = np.array(
        [
            [20.0, 32.0, 1.0, 0.0, 5.0, 0.0],
            [100.0, 96.0, 1.0, 0.0, 0.0, 0.0],
        ]
    )
    lw = np.array([[4.5, 2.0], [4.5, 2.0]])
    batch = np.array([0, 0])
    planner.reset(init_state, lw, batch, 1, np.array([0]))
    T = 6
    agent_t = np.linspace(0.5, 0.5 * T, T)
    obs = np.tile(init_state[1, :4], (1, T, 1))
    out = planner.rollout(obs, agent_t, np.array([0, 1]), agent_t)
    assert out.shape == (1, T, 4)
    # ego should continue along +x near y=32 at roughly constant speed
    assert np.all(np.diff(out[0, :, 0]) > 0)
    assert np.abs(out[0, :, 1] - 32.0).max() < 2.0
    # headings stay unit
    np.testing.assert_allclose(
        np.linalg.norm(out[0, :, 2:], axis=-1), 1.0, atol=1e-6
    )


def test_rollout_brakes_for_blocker(lg):
    cfg = PlannerConfig(**PLANNER_CONFIGS["default"])
    planner = RulePlanner({"m0": lg}, ["m0"], cfg)
    # blocker stopped directly ahead on the same lane
    init_state = np.array(
        [
            [20.0, 32.0, 1.0, 0.0, 8.0, 0.0],
            [45.0, 32.0, 1.0, 0.0, 0.0, 0.0],
        ]
    )
    lw = np.array([[4.5, 2.0], [4.5, 2.0]])
    planner.reset(init_state, lw, np.array([0, 0]), 1, np.array([0]))
    T = 8
    agent_t = np.linspace(0.5, 0.5 * T, T)
    obs = np.tile(init_state[1, :4], (1, T, 1))
    out_blocked = planner.rollout(obs, agent_t, np.array([0, 1]), agent_t)

    # same scene without the blocker nearby
    init_state2 = init_state.copy()
    init_state2[1, 0] = 120.0
    planner.reset(init_state2, lw, np.array([0, 0]), 1, np.array([0]))
    obs2 = np.tile(init_state2[1, :4], (1, T, 1))
    out_free = planner.rollout(obs2, agent_t, np.array([0, 1]), agent_t)

    # blocked ego travels less far and does not pass through the blocker
    assert out_blocked[0, -1, 0] < out_free[0, -1, 0] - 1.0
    assert out_blocked[0, -1, 0] < 45.0


def test_cluster_matches_dedup(lg):
    from strive_tpu.planners.hardcode import (
        cluster_matches_combine,
        get_lane_matches,
    )

    # a pose matching many consecutive edges of one lane should cluster to
    # a single representative match
    m = get_lane_matches(64.0, 32.0, 0.0, lg,
                         cdistmax=1.0 - np.cos(np.radians(20.0)),
                         xydistmax=2.0)
    clustered = cluster_matches_combine(64.0, 32.0, m, lg)
    assert clustered["ixes"].shape[0] <= m["ixes"].shape[0]
    assert clustered["ixes"].shape[0] >= 1
    # representatives must come from the original match set
    orig = {tuple(e) for e in m["ixes"]}
    for e in clustered["ixes"]:
        assert tuple(e) in orig


def test_expand_verts_reaches_distance(lg):
    from strive_tpu.planners.hardcode import expand_verts

    lanes = expand_verts(0, lg["xy"], lg["out_edges"], mindist=20.0)
    assert len(lanes) >= 1
    for lane in lanes:
        # either reached the distance or hit a terminal vertex
        last = lane["v"][-1]
        assert lane["l"] > 20.0 or len(lg["out_edges"][last]) == 0


def test_prediction_splines_pass_through_pose(lg):
    from strive_tpu.planners.hardcode import (
        cluster_matches_combine,
        get_lane_matches,
        get_prediction_splines,
    )

    x, y, h = 64.0, 33.0, 0.1  # near the y=32 lane, slightly offset
    m = cluster_matches_combine(
        x, y, get_lane_matches(x, y, h, lg,
                               1.0 - np.cos(np.radians(20.0)), 2.0), lg)
    splines = get_prediction_splines(m, lg, backdist=5.0, fordist=40.0,
                                     xydistmax=2.0, egoxy=np.array([x, y]),
                                     egoh=h)
    assert len(splines) >= 1
    for sp in splines:
        at0 = sp(np.array([0.0]))[0]
        # spline passes (approximately) through the ego position and exactly
        # through the ego heading (reference xy2spline forces it)
        assert np.hypot(at0[0] - x, at0[1] - y) < 0.5
        np.testing.assert_allclose(at0[2:], [np.cos(h), np.sin(h)], atol=1e-9)


def test_constant_heading_fallback():
    from strive_tpu.planners.hardcode import get_prediction_splines

    empty = {"ixes": np.empty((0, 2), np.int64), "closest": np.empty((0, 2))}
    sp = get_prediction_splines(empty, None, 5.0, 20.0, 2.0,
                                np.array([10.0, 10.0]), 0.5)
    assert len(sp) == 1
    pts = sp[0](np.array([0.0, 10.0]))
    np.testing.assert_allclose(pts[0, :2], [10.0, 10.0], atol=1e-9)
    np.testing.assert_allclose(
        pts[1, :2],
        [10.0 + 10 * np.cos(0.5), 10.0 + 10 * np.sin(0.5)], atol=1e-9)
