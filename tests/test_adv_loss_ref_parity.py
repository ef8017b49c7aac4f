"""Golden parity: dense masked adversarial losses vs the reference torch
classes (``losses/adv_gen_nusc.py``), on identical multi-scene inputs.

The reference operates on flattened ptr-indexed agent arrays; ours on
padded ``(B, NA)`` arrays with masks. The per-scene softmin attacker
selection, prior_reweight interpolation, in-front filter, veh-coll masks
(non-ego and planner-weighted), init-z coupling, and the selected-entry
mean semantics must all agree. The env-collision term is compared with
tolerance only (static- vs dynamic-grid footprint sampling, PARITY.md #2).
"""

from types import SimpleNamespace

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import tg_shim


@pytest.fixture(scope="module")
def rmod(reference_src):
    tg_shim.install()
    np.int = int
    np.float = float
    np.product = np.prod
    import losses.adv_gen_nusc as radv

    return radv


@pytest.fixture(scope="module")
def raster():
    rng = np.random.default_rng(3)
    M, C, H, W = 1, 2, 220, 220
    r = np.zeros((M, C, H, W), np.uint8)
    r[0, 0] = 1
    r[0, 0, :, 150:170] = 0  # non-drivable band at x in [37.5, 42.5] m
    dx = np.full((M, 2), 0.25, np.float32)
    return r, dx


def _inputs(seed=0, T=8, D=4):
    """Two scenes (4 and 3 real agents): ego chased by agents that come
    close enough for collisions and the crash softmin to matter."""
    rng = np.random.default_rng(seed)
    sizes = [4, 3]
    B, NA = len(sizes), max(sizes)
    t = np.arange(T) * 0.5

    fut = np.zeros((B, NA, T, 4), np.float32)
    for b in range(B):
        for a in range(sizes[b]):
            x0 = 10.0 + 6.0 * a + rng.normal(0, 0.5)
            y0 = 25.0 + 2.0 * b + (0.8 * a if a else 0.0)
            vx = 4.0 + rng.normal(0, 0.8)
            vy = rng.normal(0, 0.3)
            h = np.arctan2(vy, vx)
            fut[b, a, :, 0] = x0 + vx * t
            fut[b, a, :, 1] = y0 + vy * t
            fut[b, a, :, 2] = np.cos(h)
            fut[b, a, :, 3] = np.sin(h)
    # agent 1 converges on the ego (real attacker geometry)
    for b in range(B):
        fut[b, 1, :, :2] = fut[b, 0, :, :2] + np.array([3.0, 1.5]) * \
            np.linspace(1.0, 0.25, T)[:, None]
    tgt = fut[:, 0].copy()

    mask = np.zeros((B, NA), bool)
    for b in range(B):
        mask[b, : sizes[b]] = True
    lw = np.tile(np.array([[4.4, 1.9]], np.float32), (B * NA, 1))
    lw = lw.reshape(B, NA, 2) + rng.uniform(-0.2, 0.2, (B, NA, 2)).astype(
        np.float32)
    z = rng.normal(0, 1, (B, NA, D)).astype(np.float32)
    init_z = z + rng.normal(0, 0.3, z.shape).astype(np.float32)
    prior_mu = rng.normal(0, 1, (B, NA, D)).astype(np.float32)
    prior_var = rng.uniform(0.5, 2.0, (B, NA, D)).astype(np.float32)
    mapixes = np.zeros(B, np.int64)
    return fut, tgt, z, init_z, (prior_mu, prior_var), lw, mask, mapixes, sizes


def _flatten(x, sizes):
    """(B, NA, ...) padded -> reference flattened (sum sizes, ...)."""
    return np.concatenate([x[b, : sizes[b]] for b in range(len(sizes))])


def _ref_loss(radv, weights, raster, inputs, crash_min_t, infront):
    fut, tgt, z, init_z, prior, lw, mask, mapixes, sizes = inputs
    r, dx = raster
    ptr = np.cumsum([0] + sizes)
    nonego = np.concatenate(
        [[False] + [True] * (s - 1) for s in sizes])
    f = _flatten(fut, sizes)
    map_env = SimpleNamespace(
        nusc_raster=torch.from_numpy(r.astype(np.float32)),
        nusc_dx=torch.from_numpy(dx))
    agent_mapixes = torch.from_numpy(
        np.concatenate([[mapixes[b]] * s for b, s in enumerate(sizes)]))
    crit = radv.AdvGenLoss(
        weights, torch.from_numpy(_flatten(lw, sizes)), agent_mapixes,
        map_env, torch.from_numpy(_flatten(init_z, sizes)[nonego]),
        torch.from_numpy(ptr), veh_coll_buffer=0.1,
        crash_loss_min_time=crash_min_t, crash_loss_min_infront=infront)
    out = crit(
        torch.from_numpy(f), torch.from_numpy(tgt),
        torch.from_numpy(_flatten(z, sizes)[nonego]),
        (torch.from_numpy(_flatten(prior[0], sizes)[nonego]),
         torch.from_numpy(_flatten(prior[1], sizes)[nonego])),
        return_mins=True)
    return out


def _our_loss(weights, raster, inputs, crash_min_t, infront):
    from strive_tpu.losses.adv import adv_gen_loss

    fut, tgt, z, init_z, prior, lw, mask, mapixes, sizes = inputs
    r, dx = raster
    return adv_gen_loss(
        jnp.asarray(fut), jnp.asarray(tgt), jnp.asarray(z),
        (jnp.asarray(prior[0]), jnp.asarray(prior[1])),
        lw=jnp.asarray(lw), mask=jnp.asarray(mask),
        mapixes=jnp.asarray(mapixes), drivable=jnp.asarray(r[:, 0]),
        dx=jnp.asarray(dx), init_z=jnp.asarray(init_z), weights=weights,
        veh_coll_buffer=0.1, crash_min_t=crash_min_t,
        crash_min_infront=infront)


WEIGHTS_EXACT = {
    "adv_crash": 2.0, "motion_prior": 1.0, "motion_prior_atk": 0.005,
    "coll_veh": 20.0, "coll_veh_plan": 20.0, "coll_env": 0.0,
    "init_z": 0.5, "init_z_atk": 0.05,
}


@pytest.mark.parametrize("crash_min_t,infront", [(0, None), (2, 0.0)])
def test_adv_gen_loss_exact_parity(rmod, raster, crash_min_t, infront):
    """Everything except the env term matches the reference exactly."""
    inputs = _inputs()
    ref = _ref_loss(rmod, WEIGHTS_EXACT, raster, inputs, crash_min_t,
                    infront)
    ours = _our_loss(WEIGHTS_EXACT, raster, inputs, crash_min_t, infront)
    np.testing.assert_allclose(
        float(ours["loss"]), float(ref["loss"]), rtol=2e-4,
        err_msg=f"total adv loss (crash_min_t={crash_min_t})")
    np.testing.assert_array_equal(np.asarray(ours["min_agt"]),
                                  ref["min_agt"])
    np.testing.assert_array_equal(np.asarray(ours["min_t"]), ref["min_t"])


def test_adv_gen_loss_env_tolerance(rmod, raster):
    """The env-collision component agrees to footprint-grid noise.

    adv_crash must stay > 0: the reference unconditionally dereferences
    the softmin result at :151 when it is disabled (quirk; the pipeline
    never disables it)."""
    w = dict(WEIGHTS_EXACT, coll_env=1.0)
    inputs = _inputs(seed=9)
    # push scene 0's agent 2 into the non-drivable band
    fut = inputs[0]
    fut[0, 2, :, 0] = np.linspace(35.0, 41.0, fut.shape[2])
    fut[0, 2, :, 1] = 27.0
    ref = _ref_loss(rmod, w, raster, inputs, 0, None)
    ours = _our_loss(w, raster, inputs, 0, None)
    ref_env = float(ref["coll_env_loss"].mean())
    assert ref_env > 0.0
    np.testing.assert_allclose(float(ours["coll_env_loss"]), ref_env,
                               rtol=0.25)


@pytest.mark.parametrize("ref_compat", [True, False])
def test_tgt_matching_loss_parity(rmod, ref_compat):
    """Exact parity incl. the reference bug at :46 (motion_prior_ext
    multiplies the MATCHING loss); ref_compat=False is the documented fix
    (PARITY.md bug-compat #1)."""
    from strive_tpu.losses.adv import tgt_matching_loss

    rng = np.random.default_rng(2)
    NA, T, D = 5, 8, 4
    fut = rng.normal(0, 5, (NA, T, 4)).astype(np.float32)
    tgt = fut + rng.normal(0, 1, fut.shape).astype(np.float32)
    z = rng.normal(0, 1, (NA, D)).astype(np.float32)
    mu = rng.normal(0, 1, (NA, D)).astype(np.float32)
    var = rng.uniform(0.5, 2.0, (NA, D)).astype(np.float32)
    w = {"match_ext": 10.0, "motion_prior_ext": 0.1}

    crit = rmod.TgtMatchingLoss(w)
    ref = crit(torch.from_numpy(fut), torch.from_numpy(tgt),
               torch.from_numpy(z), (torch.from_numpy(mu),
                                     torch.from_numpy(var)))
    ours = tgt_matching_loss(jnp.asarray(fut), jnp.asarray(tgt),
                             jnp.asarray(z), (jnp.asarray(mu),
                                              jnp.asarray(var)),
                             w, ref_compat=ref_compat)
    if ref_compat:
        np.testing.assert_allclose(float(ours["loss"]), float(ref["loss"]),
                                   rtol=1e-5)
    else:
        # the fixed loss actually adds the prior NLL -> must differ
        assert not np.isclose(float(ours["loss"]), float(ref["loss"]),
                              rtol=1e-5)


@pytest.mark.parametrize("single_veh_idx", [None, 0])
def test_avoid_coll_loss_parity(rmod, raster, single_veh_idx):
    """AvoidCollLoss (refine / solution objective): veh-coll, motion prior,
    and init-z exact; env term within grid tolerance."""
    from strive_tpu.losses.adv import avoid_coll_loss

    inputs = _inputs(seed=4)
    fut, tgt, z, init_z, prior, lw, mask, mapixes, sizes = inputs
    r, dx = raster
    ptr = np.cumsum([0] + sizes)
    w = {"coll_veh": 10.0, "coll_env": 0.0, "motion_prior": 0.005,
         "init_z": 0.3}

    map_env = SimpleNamespace(
        nusc_raster=torch.from_numpy(r.astype(np.float32)),
        nusc_dx=torch.from_numpy(dx))
    agent_mapixes = torch.from_numpy(
        np.concatenate([[mapixes[b]] * s for b, s in enumerate(sizes)]))
    if single_veh_idx is None:
        z_flat = _flatten(z, sizes)
        iz_flat = _flatten(init_z, sizes)
        mu_flat = _flatten(prior[0], sizes)
        var_flat = _flatten(prior[1], sizes)
        z_mask = None
    else:
        # sol-optim mode: losses w.r.t. the planner node only; z is (B, D)
        z_flat = z[:, single_veh_idx]
        iz_flat = init_z[:, single_veh_idx]
        mu_flat = prior[0][:, single_veh_idx]
        var_flat = prior[1][:, single_veh_idx]
        z_mask = np.zeros_like(mask)
        z_mask[:, single_veh_idx] = True
    crit = rmod.AvoidCollLoss(
        w, torch.from_numpy(_flatten(lw, sizes)), agent_mapixes, map_env,
        torch.from_numpy(iz_flat), veh_coll_buffer=0.2,
        single_veh_idx=single_veh_idx,
        ptr=torch.from_numpy(ptr))
    ref = crit(torch.from_numpy(_flatten(fut, sizes)),
               torch.from_numpy(z_flat),
               (torch.from_numpy(mu_flat), torch.from_numpy(var_flat)))

    ours = avoid_coll_loss(
        jnp.asarray(fut), jnp.asarray(z),
        (jnp.asarray(prior[0]), jnp.asarray(prior[1])),
        lw=jnp.asarray(lw), mask=jnp.asarray(mask),
        mapixes=jnp.asarray(mapixes), drivable=jnp.asarray(r[:, 0]),
        dx=jnp.asarray(dx), init_z=jnp.asarray(init_z), weights=w,
        veh_coll_buffer=0.2, single_veh_idx=single_veh_idx,
        z_mask=None if z_mask is None else jnp.asarray(z_mask))
    np.testing.assert_allclose(float(ours["loss"]), float(ref["loss"]),
                               rtol=2e-4)
