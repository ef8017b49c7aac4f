import numpy as np

from strive_tpu.losses.metrics import (
    box_corners,
    convex_quad_intersection_area,
    oriented_box_iou,
    check_single_veh_coll,
    check_pairwise_veh_coll,
)


def quad(cx, cy, l, w, h=0.0):
    state = np.array([cx, cy, np.cos(h), np.sin(h)])
    return box_corners(state[None], np.array([[l, w]]))[0]


def test_intersection_identical():
    A = quad(0, 0, 4, 2)
    area = convex_quad_intersection_area(A[None], A[None])[0]
    np.testing.assert_allclose(area, 8.0, atol=1e-9)


def test_intersection_disjoint():
    A = quad(0, 0, 4, 2)
    B = quad(100, 100, 4, 2)
    np.testing.assert_allclose(
        convex_quad_intersection_area(A[None], B[None])[0], 0.0, atol=1e-9
    )


def test_intersection_half_overlap():
    A = quad(0, 0, 4, 2)
    B = quad(2, 0, 4, 2)  # shifted half a length
    np.testing.assert_allclose(
        convex_quad_intersection_area(A[None], B[None])[0], 4.0, atol=1e-9
    )


def test_intersection_contained():
    A = quad(0, 0, 2, 1)
    B = quad(0, 0, 10, 10)
    np.testing.assert_allclose(
        convex_quad_intersection_area(A[None], B[None])[0], 2.0, atol=1e-9
    )
    np.testing.assert_allclose(
        convex_quad_intersection_area(B[None], A[None])[0], 2.0, atol=1e-9
    )


def test_intersection_rotated():
    # unit square vs the same square rotated 45 deg: octagon area 2*(sqrt2-1)
    A = quad(0, 0, 2, 2)
    B = quad(0, 0, 2, 2, h=np.pi / 4)
    expect = 8 * (np.sqrt(2) - 1)  # for side-2 squares: scale area by 4
    np.testing.assert_allclose(
        convex_quad_intersection_area(A[None], B[None])[0], expect, atol=1e-6
    )


def test_iou_known():
    sA = np.array([[0.0, 0.0, 1.0, 0.0]])
    sB = np.array([[2.0, 0.0, 1.0, 0.0]])
    lw = np.array([[4.0, 2.0]])
    iou = oriented_box_iou(sA, lw, sB, lw)
    np.testing.assert_allclose(iou, 4.0 / 12.0, atol=1e-9)


def test_check_single_veh_coll():
    T = 5
    tgt = np.tile(np.array([0.0, 0.0, 1.0, 0.0]), (T, 1))
    # agent 0 collides at t=3, agent 1 never, agent 2 has NaN everywhere
    others = np.tile(np.array([100.0, 0.0, 1.0, 0.0]), (3, T, 1))
    others[0, 3] = [1.0, 0.0, 1.0, 0.0]
    others[2] = np.nan
    coll, t = check_single_veh_coll(
        tgt, np.array([4.0, 2.0]), others, np.tile([4.0, 2.0], (3, 1))
    )
    assert coll.tolist() == [True, False, False]
    assert t[0] == 3 and t[1] == T and t[2] == T


def test_check_pairwise():
    T = 3
    traj = np.tile(np.array([0.0, 0.0, 1.0, 0.0]), (3, T, 1))
    traj[1, :, 0] = 1.0   # overlaps agent 0
    traj[2, :, 0] = 50.0  # far away
    out = check_pairwise_veh_coll(traj, np.tile([4.0, 2.0], (3, 1)))
    assert out["did_collide"].tolist() == [True, False, False]
    assert out["num_coll_veh"] == 1.0
