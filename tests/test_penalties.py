import numpy as np
import jax
import jax.numpy as jnp

from strive_tpu.losses.penalties import (
    veh_coll_penalties,
    env_coll_penalties,
    masked_mean,
)
from strive_tpu.losses.adv import (
    tgt_matching_loss,
    adv_gen_loss,
    avoid_coll_loss,
    check_behind,
)
from strive_tpu.maps import synthetic_map_store


def straight_traj(x0, y0, vx, T, h=(1.0, 0.0)):
    t = np.arange(T)[:, None] * 0.5
    pos = np.array([x0, y0]) + t * np.array([vx, 0.0])
    hx = np.full((T, 1), h[0])
    hy = np.full((T, 1), h[1])
    return np.concatenate([pos, hx, hy], -1).astype(np.float32)


def test_veh_coll_basic():
    T = 4
    # agents 0/1 overlap the whole time; agent 2 far away; agent 3 padded
    traj = np.stack(
        [
            straight_traj(0, 0, 0, T),
            straight_traj(1.0, 0, 0, T),
            straight_traj(100, 0, 0, T),
            straight_traj(0.5, 0, 0, T),
        ]
    )[None]
    lw = np.tile([4.5, 2.0], (1, 4, 1)).astype(np.float32)
    mask = np.array([[True, True, True, False]])
    pens, coll = veh_coll_penalties(jnp.asarray(traj), jnp.asarray(lw),
                                    jnp.asarray(mask))
    pens, coll = np.asarray(pens), np.asarray(coll)
    assert coll[0, :, 0, 1].all() and coll[0, :, 1, 0].all()
    assert pens[0, :, 0, 1].min() > 0
    assert not coll[0, :, 0, 2].any()
    # padded agent 3 overlaps 0 but must be masked
    assert not coll[0, :, 0, 3].any() and not coll[0, :, 3, 0].any()


def test_veh_coll_single_idx():
    T = 2
    traj = np.stack(
        [
            straight_traj(0, 0, 0, T),
            straight_traj(1.0, 0, 0, T),
            straight_traj(2.0, 0, 0, T),
        ]
    )[None]
    lw = np.tile([4.5, 2.0], (1, 3, 1)).astype(np.float32)
    mask = np.ones((1, 3), bool)
    _, coll = veh_coll_penalties(jnp.asarray(traj), jnp.asarray(lw),
                                 jnp.asarray(mask), single_veh_idx=0)
    coll = np.asarray(coll)
    # pair (1,2) collides geometrically but is excluded by single_veh_idx=0
    assert not coll[0, :, 1, 2].any()
    assert coll[0, :, 0, 1].any()


def test_env_coll():
    store = synthetic_map_store(num_maps=1, size_px=256, channels=1)
    arr = np.zeros((1, 1, 256, 256), np.uint8)
    arr[0, 0, :, 128:] = 1  # drivable x >= 32m
    store = store.replace(raster=jnp.asarray(arr))
    T = 2
    traj = np.stack(
        [
            straight_traj(33.0, 32.0, 0, T),  # straddles boundary
            straight_traj(48.0, 32.0, 0, T),  # fully on road
        ]
    )[None]
    lw = np.tile([4.8, 2.0], (1, 2, 1)).astype(np.float32)
    mask = np.ones((1, 2), bool)
    pens, valid = env_coll_penalties(
        jnp.asarray(traj), jnp.asarray(lw), jnp.asarray(mask),
        jnp.array([0]), store.drivable(), store.dx,
    )
    pens, valid = np.asarray(pens), np.asarray(valid)
    assert valid[0, 0].all() and pens[0, 0].min() > 0
    assert not valid[0, 1].any() and pens[0, 1].max() == 0


def test_env_coll_gradient_direction():
    store = synthetic_map_store(num_maps=1, size_px=256, channels=1)
    arr = np.zeros((1, 1, 256, 256), np.uint8)
    arr[0, 0, :, 128:] = 1
    store = store.replace(raster=jnp.asarray(arr))
    lw = jnp.asarray(np.tile([4.8, 2.0], (1, 1, 1)).astype(np.float32))
    mask = jnp.ones((1, 1), bool)

    def loss(x):
        traj = jnp.array([[[[x, 32.0, 1.0, 0.0]]]])
        pens, valid = env_coll_penalties(traj, lw, mask, jnp.array([0]),
                                         store.drivable(), store.dx)
        return masked_mean(pens, valid)

    g = jax.grad(loss)(33.0)
    # moving +x (deeper onto the road) decreases the penalty
    assert g < 0


def test_tgt_matching_ref_compat():
    fp = jnp.ones((2, 3, 4)) * 2.0
    tgt = jnp.zeros((2, 3, 4))
    z = jnp.zeros((2, 8))
    prior = (jnp.zeros((2, 8)), jnp.ones((2, 8)))
    w = {"match_ext": 1.0, "motion_prior_ext": 0.5}
    buggy = tgt_matching_loss(fp, tgt, z, prior, w, ref_compat=True)
    fixed = tgt_matching_loss(fp, tgt, z, prior, w, ref_compat=False)
    # buggy: loss = 16 + 0.5*16 = 24; fixed: 16 + 0.5*nll_mean
    np.testing.assert_allclose(float(buggy["loss"]), 24.0, atol=1e-5)
    assert abs(float(fixed["loss"]) - 24.0) > 1e-3


def make_adv_inputs():
    T, NA = 6, 4
    # planner drives +x; agent 1 close behind it, agent 2 near, agent 3 padded
    fut = np.stack(
        [
            straight_traj(0, 0, 4.0, T),
            straight_traj(0, 5.0, 4.0, T),
            straight_traj(0, 30.0, 4.0, T),
            straight_traj(0, 0.0, 4.0, T),
        ]
    )[None]
    tgt = fut[:, 0]
    mask = np.array([[True, True, True, False]])
    lw = np.tile([4.5, 2.0], (1, NA, 1)).astype(np.float32)
    z = np.zeros((1, NA, 8), np.float32)
    prior = (jnp.zeros((1, NA, 8)), jnp.ones((1, NA, 8)))
    store = synthetic_map_store(num_maps=1, size_px=256, channels=1)
    weights = {
        "adv_crash": 2.0, "motion_prior": 1.0, "motion_prior_atk": 0.005,
        "coll_veh": 20.0, "coll_veh_plan": 20.0, "coll_env": 20.0,
        "init_z": 0.5, "init_z_atk": 0.05,
    }
    return fut, tgt, z, prior, lw, mask, store, weights


def test_adv_gen_loss_picks_closest():
    fut, tgt, z, prior, lw, mask, store, weights = make_adv_inputs()
    out = adv_gen_loss(
        jnp.asarray(fut), jnp.asarray(tgt), jnp.asarray(z), prior,
        lw=jnp.asarray(lw), mask=jnp.asarray(mask), mapixes=jnp.array([0]),
        drivable=store.drivable(), dx=store.dx, init_z=jnp.asarray(z),
        weights=weights,
    )
    assert int(out["min_agt"][0]) == 1  # the nearby agent
    assert np.isfinite(float(out["loss"]))


def test_adv_gen_loss_attack_mask():
    fut, tgt, z, prior, lw, mask, store, weights = make_adv_inputs()
    atk_mask = jnp.asarray(np.array([[False, False, True, False]]))
    out = adv_gen_loss(
        jnp.asarray(fut), jnp.asarray(tgt), jnp.asarray(z), prior,
        lw=jnp.asarray(lw), mask=jnp.asarray(mask), mapixes=jnp.array([0]),
        drivable=store.drivable(), dx=store.dx, init_z=jnp.asarray(z),
        weights=weights, attack_agt_mask=atk_mask,
    )
    assert int(out["min_agt"][0]) == 2


def test_adv_gen_loss_gradient():
    fut, tgt, z, prior, lw, mask, store, weights = make_adv_inputs()

    def loss_fn(fut_in):
        return adv_gen_loss(
            fut_in, jnp.asarray(tgt), jnp.asarray(z), prior,
            lw=jnp.asarray(lw), mask=jnp.asarray(mask), mapixes=jnp.array([0]),
            drivable=store.drivable(), dx=store.dx, init_z=jnp.asarray(z),
            weights=weights,
        )["loss"]

    g = np.asarray(jax.grad(loss_fn)(jnp.asarray(fut)))
    assert np.all(np.isfinite(g))
    # attacker agent 1 should feel pull toward the planner (negative y grad
    # reduces distance -> loss decreases when moving toward y=0)
    assert np.abs(g[0, 1]).sum() > 0
    # padded agent gets no gradient
    assert np.abs(g[0, 3]).sum() == 0


def test_avoid_coll_loss_runs():
    fut, tgt, z, prior, lw, mask, store, weights = make_adv_inputs()
    w = {"coll_veh": 10.0, "coll_env": 10.0, "motion_prior": 0.005, "init_z": 0.0}
    out = avoid_coll_loss(
        jnp.asarray(fut), jnp.asarray(z), prior,
        lw=jnp.asarray(lw), mask=jnp.asarray(mask), mapixes=jnp.array([0]),
        drivable=store.drivable(), dx=store.dx, init_z=jnp.asarray(z),
        weights=w, veh_coll_buffer=0.5, single_veh_idx=0,
        z_mask=jnp.asarray(np.array([[True, False, False, False]])),
    )
    assert np.isfinite(float(out["loss"]))


def test_check_behind():
    T = 3
    tgt = jnp.asarray(straight_traj(0, 0, 2.0, T)[None])
    atk = np.stack(
        [straight_traj(-10, 0, 2.0, T), straight_traj(10, 0, 2.0, T)]
    )[None]
    behind = np.asarray(check_behind(jnp.asarray(atk), tgt, 0.0))
    assert behind[0, 0].all()       # behind the target
    assert not behind[0, 1].any()   # in front
