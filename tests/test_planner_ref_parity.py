"""Golden parity: our phase-A host planner vs the ACTUAL reference
``HardcodeNuscPlanner`` (pure numpy/scipy, importable in this image),
rolled out on the same synthetic lane graph and scenes.

This pins the full closed-loop planning stack — lane matching, clustering,
BFS route expansion, spline warping, speed-profile scoring, wstate
stepping, output interpolation (``hardcode_goalcond_nusc.py:65-276`` and
its ~600 lines of utilities) — to the reference's decisions, beyond the
unit tests in test_planner.py.
"""

import sys
from types import SimpleNamespace

import numpy as np
import pytest
import torch

import tg_shim

from strive_tpu.maps.lanegraph import synthetic_lanegraph, synthetic_lanegraph_forks
from strive_tpu.planners import PLANNER_CONFIGS, PlannerConfig, RulePlanner


@pytest.fixture(scope="module", params=["default", "final_tuned_val_1"])
def planners(reference_src, request):
    tg_shim.install()
    np.int = int
    np.float = float
    np.product = np.prod  # removed numpy alias the reference still uses
    import planners.hardcode_goalcond_nusc as rhp
    from planners.planner import PlannerConfig as RefPC

    lg_grid = synthetic_lanegraph(extent_m=128.0, spacing_m=32.0)
    lg_forks = synthetic_lanegraph_forks()
    lgs = {"m_grid": lg_grid, "m_forks": lg_forks}
    names = ["m_grid", "m_forks"]
    cfgd = rhp.CONFIG_DICT[request.param]
    ref = rhp.HardcodeNuscPlanner(
        SimpleNamespace(lane_graphs=lgs, map_list=names), RefPC(**cfgd))
    ours = RulePlanner(lgs, names, PlannerConfig(**PLANNER_CONFIGS[request.param]))
    return ref, ours


def _scenes():
    """B=2 scenes x 3 agents on the 32 m-spaced grid lane rows.

    Scene 0: ego follows a lane with a slower car ahead in the same lane
    (forces the profile scorer to brake) and one crossing car. Scene 1:
    ego on the fork map; other agent's future has trailing NaNs
    (exercises the first-nan interpolation cutoff,
    ``hardcode_goalcond_nusc.py:160-171``).
    """
    T = 6
    dt = 0.5
    t = np.linspace(dt, dt * T, T)

    def fut(x0, y0, vx, vy, h):
        xs = x0 + vx * t
        ys = y0 + vy * t
        return np.stack([xs, ys, np.full(T, np.cos(h)),
                         np.full(T, np.sin(h))], axis=1)

    # scene 0 on m_grid: lanes along y=32 (heading +x)
    init0 = np.array([
        [20.0, 32.0, 1.0, 0.0, 6.0, 0.0],   # ego
        [33.0, 32.2, 1.0, 0.0, 2.0, 0.0],   # slow car ahead, same lane
        [48.0, 20.0, 0.0, 1.0, 4.0, 0.0],   # crossing car
    ])
    obs0 = np.stack([fut(33.0, 32.2, 2.0, 0.0, 0.0),
                     fut(48.0, 20.0, 0.0, 4.0, np.pi / 2)])

    # scene 1 on m_forks
    init1 = np.array([
        [6.0, 64.0, 1.0, 0.0, 5.0, 0.0],    # ego approaching the fork
        [26.0, 66.0, 1.0, 0.0, 3.0, 0.0],   # car ahead
        [40.0, 60.0, 1.0, 0.0, 0.0, 0.0],   # parked car
    ])
    f1 = fut(26.0, 66.0, 3.0, 0.0, 0.0)
    f1[4:] = np.nan  # disappears after 2 s
    obs1 = np.stack([f1, fut(40.0, 60.0, 0.0, 0.0, 0.0)])

    init = np.concatenate([init0, init1])
    lw = np.tile(np.array([[4.2, 1.9]]), (6, 1))
    batch_mask = np.array([0, 0, 0, 1, 1, 1])
    map_idx = np.array([0, 1])
    agent_obs = np.concatenate([obs0, obs1])
    agent_ptr = np.array([0, 2, 4])
    return init, lw, batch_mask, map_idx, agent_obs, t, agent_ptr


def test_rollout_golden_parity(planners):
    ref, ours = planners
    init, lw, bm, mi, obs, t, ptr = _scenes()
    planner_t = t

    ref.reset(torch.from_numpy(init), torch.from_numpy(lw),
              torch.from_numpy(bm), 2, torch.from_numpy(mi))
    ref_out = ref.rollout(obs, t, ptr, planner_t).numpy()

    ours.reset(init, lw, bm, 2, mi)
    our_out = np.asarray(ours.rollout(obs, t, ptr, planner_t))

    assert ref_out.shape == our_out.shape == (2, len(t), 4)
    np.testing.assert_allclose(our_out, ref_out, atol=1e-6,
                               err_msg="host planner diverged from the "
                                       "reference rollout")


# NOTE: control_all=True is not parity-tested: the reference's own
# control_all path is dead code that crashes (``update_wstate`` :615
# dereferences v['objs'] with v=None for every non-ego agent, and only
# 'ego' ever gets a 'control' entry; no reference script passes True).
