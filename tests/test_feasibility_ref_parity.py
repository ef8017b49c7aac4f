"""Golden parity: feasibility check vs the reference
``determine_feasibility_nusc`` (``utils/scenario_gen.py:30-107``) — the
gate that decides which scenes seed scenario generation."""

from types import SimpleNamespace

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import tg_shim

from strive_tpu.normalize import state_normalizer_for
from strive_tpu.optim.feasibility import determine_feasibility

CATS = ("car", "truck")


@pytest.fixture(scope="module")
def rmod(reference_src):
    tg_shim.install()
    np.int = int
    np.float = float
    import utils.scenario_gen as rsg
    from datasets.utils import MeanStdNormalizer

    return rsg, MeanStdNormalizer


@pytest.fixture(scope="module")
def raster():
    r = np.zeros((1, 1, 240, 240), np.uint8)
    r[0, 0] = 1
    r[0, 0, :, 120:136] = 0  # non-drivable band at x in [30, 34] m
    dx = np.full((1, 2), 0.25, np.float32)
    return r, dx


def _samples(seed, NA=6, NS=8, FT=12):
    """NORMALIZED prior samples: ego drives +x at y=20; agents at varied
    distances/sides, one across the non-drivable band, one static."""
    rng = np.random.default_rng(seed)
    state_norm = state_normalizer_for(CATS)
    t = np.arange(FT) * 0.5
    fut = np.zeros((NA, NS, FT, 4), np.float64)
    for s in range(NS):
        fut[0, s, :, 0] = 10.0 + 5.0 * t + rng.normal(0, 0.3)
        fut[0, s, :, 1] = 20.0 + rng.normal(0, 0.2)
        fut[0, s, :, 2] = 1.0
        specs = [
            (14.0, 22.0, 4.0, 0.0),    # near, in front
            (10.0, 14.0, 3.0, 1.0),    # approaching from the side
            (60.0, 20.0, -4.0, 0.0),   # head-on from afar (behind filter!)
            (45.0, 22.0, 5.0, 0.0),    # across the band from ego at t=0
            (11.0, 21.0, 0.0, 0.0),    # static (velocity filter)
        ]
        for a, (x0, y0, vx, vy) in enumerate(specs, start=1):
            h = np.arctan2(vy, vx) if (vx or vy) else 0.0
            fut[a, s, :, 0] = x0 + vx * t + rng.normal(0, 0.3)
            fut[a, s, :, 1] = y0 + vy * t + rng.normal(0, 0.2)
            fut[a, s, :, 2] = np.cos(h)
            fut[a, s, :, 3] = np.sin(h)
    mean = np.zeros(4)
    mean[:2] = np.asarray(state_norm.mean)[:2]
    std = np.asarray(state_norm.std)[:4]
    normed = (fut - mean) / std
    return normed.astype(np.float32), state_norm


@pytest.mark.parametrize("infront,sep", [(None, False), (0.0, True),
                                         (None, True)])
def test_feasibility_parity(rmod, raster, infront, sep):
    rsg, RefNorm = rmod
    r, dx = raster
    normed, state_norm = _samples(seed=1)
    NA = normed.shape[0]

    mean4 = np.concatenate([np.asarray(state_norm.mean)[:2], [0.0, 0.0]])
    std4 = np.asarray(state_norm.std)[:4]
    ref_norm = RefNorm(torch.tensor(mean4, dtype=torch.float32),
                       torch.tensor(std4, dtype=torch.float32))
    map_env = SimpleNamespace(
        nusc_raster=torch.from_numpy(r.astype(np.float32)),
        nusc_dx=torch.from_numpy(dx))
    ref_feas, ref_t, ref_d = rsg.determine_feasibility_nusc(
        torch.from_numpy(normed), ref_norm, 10.0,
        feasibility_time=2, feasibility_vel=0.5,
        feasibility_infront_min=infront,
        check_non_drivable_separation=sep, map_env=map_env,
        map_idx=torch.tensor([0]))

    class _N:  # 4-dim slice of the state normalizer
        mean = jnp.asarray(mean4)
        std = jnp.asarray(std4)

        @staticmethod
        def unnormalize(x):
            return x * _N.std + _N.mean

    ours_feas, ours_t, ours_d = determine_feasibility(
        jnp.asarray(np.moveaxis(normed, 0, 1)), jnp.ones(NA, bool), _N,
        10.0, feasibility_time=2, feasibility_vel=0.5,
        feasibility_infront_min=infront,
        check_non_drivable_separation=sep,
        drivable=jnp.asarray(r[:, 0]), dx=jnp.asarray(dx),
        map_idx=jnp.asarray([0]))

    np.testing.assert_array_equal(np.asarray(ours_feas), ref_feas.numpy())
    np.testing.assert_array_equal(np.asarray(ours_t), ref_t.numpy())
    np.testing.assert_allclose(np.asarray(ours_d), ref_d.numpy(),
                               rtol=1e-5)
