import json
import os

import numpy as np
import jax.numpy as jnp

from strive_tpu.data.dataset import ConcatSceneDataset, SceneDataset, batch_iterator
from strive_tpu.data.scenario_json import (
    prepare_output_dict,
    read_adv_scenes,
    save_scenario,
)
from strive_tpu.data.scenario_ingest import scenarios_as_scenes
from strive_tpu.data.synthetic import synthetic_scene_list
from strive_tpu.data.etl import (
    WindowedSceneDataset,
    heading_change_rate,
    split_scene_names,
    velocity,
)
from strive_tpu.normalize import att_normalizer_for, state_normalizer_for

CATS = ("car", "truck")


def test_scenario_json_roundtrip(tmp_path):
    """The output dict uses the exact reference schema and reads back."""
    state_norm = state_normalizer_for(CATS)
    att_norm = att_normalizer_for(CATS)
    na, PT, FT = 3, 4, 6
    rng = np.random.default_rng(0)
    sc = {
        "past_gt": rng.normal(size=(na, PT, 6)).astype(np.float32),
        "lw": rng.normal(size=(na, 2)).astype(np.float32),
        "sem": np.eye(2, dtype=np.float32)[rng.integers(0, 2, na)],
    }
    init_fut = rng.normal(size=(na, FT, 4)).astype(np.float32)
    adv_fut = rng.normal(size=(na, FT, 4)).astype(np.float32)
    out = prepare_output_dict(
        sc, 0, ("boston-seaport",), 0.5, state_norm, att_norm, init_fut,
        adv_fut, sol_fut_traj=adv_fut, attack_agt=2, attack_t=3,
        adv_z=np.zeros((na, 8)), sol_z=np.zeros((na, 8)),
        prior_distrib=(np.zeros((na, 8)), np.ones((na, 8))),
        internal_ego_traj=init_fut[0],
    )
    # exact reference key set (utils/scenario_gen.py:189-254)
    assert set(out.keys()) == {
        "N", "dt", "map", "lw", "sem", "past", "fut_init", "fut_adv",
        "fut_internal_ego", "fut_sol", "attack_agt", "attack_t", "z_adv",
        "z_sol", "z_prior",
    }
    assert out["N"] == na and out["map"] == "boston-seaport"
    path = save_scenario(str(tmp_path), "scene_0000", out)
    assert json.load(open(path))["attack_agt"] == 2

    scenes = read_adv_scenes(str(tmp_path))
    assert len(scenes) == 1
    s = scenes[0]
    np.testing.assert_allclose(
        s["scene_past"], np.asarray(state_norm.unnormalize(sc["past_gt"])),
        rtol=1e-5, atol=1e-4,
    )
    assert s["scene_fut"].shape == (na, FT, 4)
    assert s["attack_t"] == 3

    # and it re-ingests as training data
    raw = scenarios_as_scenes(str(tmp_path), ["boston-seaport"], 2)
    assert len(raw) == 1
    assert raw[0]["traj"].shape == (na, PT + FT, 6)


def test_batch_iterator_fixed_shapes():
    scenes = synthetic_scene_list(num_scenes=5, PT=4, FT=6, max_agents=6)
    ds = SceneDataset(scenes, 6, 2)
    batches = list(batch_iterator(ds, 2, shuffle=True, seed=0))
    assert len(batches) == 3
    for b in batches:
        assert b.B == 2 and b.NA == 6
    # tail batch has its padding scene fully masked
    assert not bool(np.asarray(batches[-1].mask)[1].any())


def test_concat_and_windowed_dataset():
    state_norm = state_normalizer_for(CATS)
    att_norm = att_normalizer_for(CATS)
    scenes = synthetic_scene_list(num_scenes=3, PT=4, FT=6, max_agents=6)
    ds1 = SceneDataset(scenes, 6, 2)
    rng = np.random.default_rng(0)
    raw = [{
        "traj": rng.normal(size=(3, 12, 6)).astype(np.float32),
        "vis": np.ones((3, 12), np.float32),
        "lw": np.abs(rng.normal(size=(3, 2))).astype(np.float32) + 2,
        "sem": np.eye(2, dtype=np.float32)[[0, 1, 0]],
        "map_idx": 0, "name": "w0",
    }]
    ds2 = WindowedSceneDataset(raw, 6, 2, 4, 6, state_norm, att_norm,
                               seq_interval=1)
    assert len(ds2) == 2  # T=12, seq_len=10, exclusive windowing
    cat = ConcatSceneDataset([ds1, ds2])
    assert len(cat) == 5
    batch = cat.get_batch([0, 4])  # one from each source
    assert batch.B == 2 and batch.past.shape[2] == 4


def test_trim_keeps_ego_and_neighbors():
    scenes = synthetic_scene_list(num_scenes=1, PT=4, FT=6, min_agents=8,
                                  max_agents=8)
    ds = SceneDataset(scenes, 4, 2)
    batch = ds.get_batch([0])
    assert batch.NA == 4
    assert int(batch.num_agents()[0]) == 4


def test_velocity_finite_diff_nan_handling():
    t = np.arange(5) * 0.5
    pos = np.array([[0, 0], [1, 0], [np.nan, np.nan], [3, 0], [4, 0]],
                   dtype=float)
    v = velocity(pos, t)
    # leading frame uses forward diff; frame after nan uses forward diff
    np.testing.assert_allclose(v[0], [2, 0])
    assert np.isnan(v[2]).all()
    np.testing.assert_allclose(v[3], v[4])  # nan->value transition fwd diff


def test_split_scene_names():
    names = ["scene-%04d" % i for i in range(700)]
    tr = split_scene_names(names, "train", "trainval", 400, randomize_val=True)
    va = split_scene_names(names, "val", "trainval", 400, randomize_val=True)
    assert len(tr) + len(va) == 700
    assert len(va) == 400
    assert not set(tr) & set(va)


def test_na_bucketing_keeps_dense_scenes():
    """A 24-agent scene must survive intact and pick the <=32 bucket
    (VERDICT r1 item 7; reference keeps ALL agents,
    nuscenes_dataset.py:605-649)."""
    from strive_tpu.data.dataset import SceneDataset, bucketed_batch_iterator
    from strive_tpu.data.synthetic import synthetic_scene_list

    scenes = synthetic_scene_list(num_scenes=6, min_agents=3, max_agents=6)
    dense = synthetic_scene_list(num_scenes=1, min_agents=24, max_agents=24,
                                 seed=7)
    ds = SceneDataset(scenes + dense, na_max=8, nc=2, buckets=(8, 16, 32))

    # the dense scene keeps all 24 agents (no silent trimming)
    assert ds.scene_dict(6)["past"].shape[0] == 24
    assert ds.bucket_of(6) == 32
    assert all(ds.bucket_of(i) == 8 for i in range(6))

    batches = list(bucketed_batch_iterator(ds, 4, shuffle=False))
    na_seen = sorted({b.NA for b in batches})
    assert na_seen == [8, 32]
    dense_batches = [b for b in batches if b.NA == 32]
    assert len(dense_batches) == 1
    assert int(np.asarray(dense_batches[0].mask[0]).sum()) == 24
    # every scene appears exactly once across batches
    total_real = sum(int(np.asarray(b.mask).any(-1).sum()) for b in batches)
    assert total_real == 7


def test_bucketed_iterator_falls_back_without_buckets():
    from strive_tpu.data.dataset import SceneDataset, bucketed_batch_iterator
    from strive_tpu.data.synthetic import synthetic_scene_list

    scenes = synthetic_scene_list(num_scenes=5, min_agents=2, max_agents=6)
    ds = SceneDataset(scenes, na_max=8, nc=2)
    batches = list(bucketed_batch_iterator(ds, 2, shuffle=False))
    assert all(b.NA == 8 for b in batches)
    assert len(batches) == 3


def test_challenge_split_scene_selection():
    """Reference get_prediction_challenge_split + chall_split_map
    (nuscenes_dataset.py:35-62,332-341): train = official train scenes
    after the first 200, val = first 200, test = official val."""
    from strive_tpu.data.etl import challenge_split_scenes

    train = ["scene-%04d" % i for i in range(700)]
    val = ["scene-%04d" % i for i in range(700, 850)]
    pred = {s: [f"i{s}_s{s}"] for s in train + val}
    tr = challenge_split_scenes(pred, train, val, "train")
    va = challenge_split_scenes(pred, train, val, "val")
    te = challenge_split_scenes(pred, train, val, "test")
    assert len(tr) == 500 and len(va) == 200 and len(te) == 150
    assert not set(tr) & set(va)
    assert sorted(va) == train[:200]
    assert sorted(te) == sorted(val)
    assert tr["scene-0200"] == ["iscene-0200_sscene-0200"]


def test_challenge_anchored_windows():
    """Challenge windows put the LAST PAST frame at the challenge sample
    frame (reference nuscenes_dataset.py:573-581)."""
    from strive_tpu.data.etl import (WindowedSceneDataset,
                                     challenge_anchors_for_scene)
    from strive_tpu.normalize import att_normalizer_for, state_normalizer_for

    T, NAg, PT, FT = 20, 3, 4, 6
    rng = np.random.default_rng(0)
    traj = rng.normal(size=(NAg, T, 6)).astype(np.float32)
    traj[..., 2:4] /= np.linalg.norm(traj[..., 2:4], axis=-1, keepdims=True)
    sc = {
        "traj": traj, "vis": np.ones((NAg, T), np.float32),
        "lw": np.full((NAg, 2), 2.0, np.float32),
        "sem": np.eye(2, dtype=np.float32)[[0, 1, 0]],
        "map_idx": 0, "name": "scene-x",
        "agent_tokens": ["ego", "instA", "instB"],
        "sample_tokens": ["s%02d" % t for t in range(T)],
    }
    anchors = challenge_anchors_for_scene(
        sc, ["instA_s07", "instB_s12", "instZ_s05", "instA_s99"])
    assert anchors == [(1, 7), (2, 12)]  # unknown inst/sample dropped
    sc["challenge_anchors"] = anchors

    cats = ("car", "truck")
    ds = WindowedSceneDataset([sc], 8, 2, PT, FT,
                              state_normalizer_for(cats),
                              att_normalizer_for(cats), challenge=True)
    # window starts: anchor_t - PT + 1 = 4 and 9
    assert [w for w in ds.windows] == [(0, 4), (0, 9)]
    batch = ds.get_batch([0])
    # the last past frame of the first window is timestep 7
    got = np.asarray(state_normalizer_for(cats).unnormalize(
        batch.past[0, 0, -1]))
    np.testing.assert_allclose(got, traj[0, 7], rtol=1e-5, atol=1e-5)

    # an anchor too close to the sequence end yields no window
    sc2 = dict(sc)
    sc2["challenge_anchors"] = [(1, 17)]  # start 14 + seq 10 > T
    ds2 = WindowedSceneDataset([sc2], 8, 2, PT, FT,
                               state_normalizer_for(cats),
                               att_normalizer_for(cats), challenge=True)
    assert len(ds2) == 0
