import numpy as np
import jax.numpy as jnp
import pytest

from strive_tpu import geometry


def rand_poses(rng, B, N, D=4):
    xy = rng.normal(size=(B, N, 2)) * 10
    if D == 4:
        h = rng.normal(size=(B, N))
        return np.concatenate(
            [xy, np.cos(h)[..., None], np.sin(h)[..., None]], axis=-1
        ).astype(np.float32)
    return np.concatenate([xy, rng.normal(size=(B, N, 1))], axis=-1).astype(
        np.float32
    )


def test_transform_roundtrip(rng):
    frame = rand_poses(rng, 8, 1)[:, 0]
    poses = rand_poses(rng, 8, 5)
    local = geometry.transform2frame(frame, poses)
    back = geometry.transform2frame(frame, local, inverse=True)
    np.testing.assert_allclose(np.asarray(back), poses, atol=1e-4)


def test_transform_self_is_identity(rng):
    poses = rand_poses(rng, 4, 3)
    frame = poses[:, 0]
    local = geometry.transform2frame(frame, poses[:, :1])
    np.testing.assert_allclose(
        np.asarray(local[:, 0]), np.tile([0, 0, 1, 0], (4, 1)), atol=1e-5
    )


def test_pairwise_matches_transform2frame(rng):
    poses = rand_poses(rng, 2, 6)
    pair = np.asarray(geometry.pairwise_transforms(poses))
    for i in range(6):
        expect = np.asarray(geometry.transform2frame(poses[:, i], poses))
        np.testing.assert_allclose(pair[:, i], expect, atol=1e-4)


def test_angle_variant_consistent(rng):
    poses4 = rand_poses(rng, 3, 4)
    h = np.arctan2(poses4[..., 3], poses4[..., 2])
    poses3 = np.concatenate([poses4[..., :2], h[..., None]], axis=-1)
    frame4, frame3 = poses4[:, 0], poses3[:, 0]
    out4 = np.asarray(geometry.transform2frame(frame4, poses4))
    out3 = np.asarray(geometry.transform2frame(frame3, poses3))
    np.testing.assert_allclose(out3[..., :2], out4[..., :2], atol=1e-4)
    np.testing.assert_allclose(np.cos(out3[..., 2]), out4[..., 2], atol=1e-4)
    np.testing.assert_allclose(np.sin(out3[..., 2]), out4[..., 3], atol=1e-4)


def test_parity_with_reference(reference_src, rng):
    import torch
    from utils import transforms as ref_tf

    frame = rand_poses(rng, 6, 1)[:, 0]
    poses = rand_poses(rng, 6, 7)
    for inverse in (False, True):
        ours = np.asarray(geometry.transform2frame(frame, poses, inverse=inverse))
        ref = ref_tf.transform2frame(
            torch.tensor(frame), torch.tensor(poses), inverse=inverse
        ).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    ours = np.asarray(geometry.pairwise_transforms(poses))
    ref = ref_tf.pairwise_transforms(torch.tensor(poses)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_kinematics_conversions(rng):
    kin6 = rng.normal(size=(2, 5, 6)).astype(np.float32)
    h = kin6[..., 2:4] / np.linalg.norm(kin6[..., 2:4], axis=-1, keepdims=True)
    kin6 = np.concatenate([kin6[..., :2], h, kin6[..., 4:]], axis=-1)
    kin5 = geometry.kinematics2angle(kin6)
    back = geometry.kinematics2vec(kin5)
    np.testing.assert_allclose(np.asarray(back), kin6, atol=1e-5)


def test_interp_traj_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    traj = rand_poses(rng, 1, 5)  # (1, 5, 4) -> treat N as time
    ours = np.asarray(geometry.interp_traj(jnp.asarray(traj), scale_factor=3))

    t = torch.tensor(traj).transpose(1, 2)
    ref = F.interpolate(t, scale_factor=3, mode="linear").transpose(1, 2)
    ref_h = ref[..., 2:4] / ref[..., 2:4].norm(dim=-1, keepdim=True)
    ref = torch.cat([ref[..., :2], ref_h], dim=-1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_angle_diff():
    a = jnp.array([0.1, 3.1, -3.1])
    b = jnp.array([-0.1, -3.1, 3.1])
    d = np.asarray(geometry.angle_diff(a, b))
    np.testing.assert_allclose(d, [0.2, -2 * np.pi + 6.2, 2 * np.pi - 6.2], atol=1e-5)
