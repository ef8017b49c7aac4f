"""Golden ETL parity vs the reference dataset postprocessing.

Feeds IDENTICAL synthetic fixture payloads through the reference's
``nuscenes_dataset.py`` postprocessing (``post_process`` :416-589 and
``__getitem__`` :594-687, devkit stubbed via tg_shim) and through our ETL
(``finalize_scene_states`` + ``WindowedSceneDataset``), asserting identical
finite-difference states, visibility masks, drivable/carpark filtering,
agent drops, window maps, and per-window tensors (VERDICT r2 item 5).
"""

import sys

import numpy as np
import pytest
import torch

import tg_shim

DT_US = 500_000  # 2 Hz in microseconds


def _make_raster():
    """One synthetic map: channel 0 drivable everywhere except a block,
    channel 1 carpark patch. 256 px @ 4 px/m = 64 m extent."""
    H = W = 256
    raster = np.zeros((1, 2, H, W), np.uint8)
    raster[0, 0] = 1
    raster[0, 0, :, 180:220] = 0       # non-drivable vertical band (45-55 m)
    raster[0, 1, 40:80, 40:80] = 1     # carpark patch (10-20 m square)
    dx = np.full((1, 2), 0.25, np.float32)
    return raster, dx


def _agent_rows(xy_list, h_list, t_idx_list):
    """Reference-format trajectory rows at the given ego frame indices."""
    rows = []
    for (x, y), h, ti in zip(xy_list, h_list, t_idx_list):
        rows.append({
            "x": float(x), "y": float(y), "h": float(h),
            "hcos": float(np.cos(h)), "hsin": float(np.sin(h)),
            "t": int(ti) * DT_US, "samp_tok": "samp%03d" % ti,
        })
    return rows


def _build_fixture():
    """One scene, T=20 frames: ego + 5 agents exercising every filter path.

    agent layout (map is drivable except x in [45, 55] m; carpark square
    x,y in [10, 20] m):
    - a_full: fully observed, always on drivable
    - a_sparse: annotations missing for frames 8-11 (NaN gap)
    - a_offroad: drives into the non-drivable band for frames 9-12
    - a_carpark: parks inside the carpark patch for frames 3-7
    - a_never: always inside the non-drivable band -> dropped entirely
    """
    T = 20
    t_idx = list(range(T))

    def straight(x0, y0, vx, vy, h):
        return ([(x0 + vx * 0.5 * i, y0 + vy * 0.5 * i) for i in range(T)],
                [h] * T, t_idx)

    scene = {}
    ego_xy, ego_h, ego_t = straight(5.0, 30.0, 4.0, 0.0, 0.0)
    scene["ego"] = {"traj": _agent_rows(ego_xy, ego_h, ego_t),
                    "w": 1.73, "l": 4.084, "k": "ego"}

    xy, hs, ti = straight(8.0, 35.0, 3.0, 0.2, 0.1)
    scene["tok_a_full"] = {"traj": _agent_rows(xy, hs, ti),
                           "w": 2.0, "l": 4.5, "k": "car"}

    xy, hs, ti = straight(12.0, 40.0, 2.0, 0.0, 0.0)
    keep = [i for i in range(T) if not (8 <= i <= 11)]
    scene["tok_a_sparse"] = {
        "traj": _agent_rows([xy[i] for i in keep], [hs[i] for i in keep],
                            [ti[i] for i in keep]),
        "w": 1.9, "l": 4.2, "k": "car"}

    # moves right at 3 m/s from x=34: inside the band (45-55 m) around
    # frames 8-14, back on drivable after
    xy, hs, ti = straight(34.0, 25.0, 3.0, 0.0, 0.0)
    scene["tok_a_offroad"] = {"traj": _agent_rows(xy, hs, ti),
                              "w": 2.0, "l": 4.4, "k": "truck"}

    # static inside carpark for frames 3-7, then out on drivable
    xy = [(15.0, 15.0)] * 8 + [(30.0, 30.0)] * (T - 8)
    scene["tok_a_carpark"] = {"traj": _agent_rows(xy, [0.0] * T, t_idx),
                              "w": 1.8, "l": 4.0, "k": "car"}

    xy, hs, ti = straight(50.0, 10.0, 0.0, 0.1, np.pi / 2)
    scene["tok_a_never"] = {"traj": _agent_rows(xy, hs, ti),
                            "w": 2.0, "l": 4.3, "k": "car"}
    return {"scene-0001": scene}, T


@pytest.fixture(scope="module")
def ref_dataset(reference_src):
    """A reference NuScenesDataset wired up WITHOUT the devkit: attributes
    set manually, data via post_process on the synthetic payload."""
    tg_shim.install()
    # the reference uses the long-removed np.int / np.float aliases
    np.int = int
    np.float = float
    if not hasattr(np, "bool"):
        np.bool = np.bool_  # numpy.testing itself calls np.bool(arr)
    import datasets.nuscenes_dataset as rnd

    raster, dx = _make_raster()
    payload, T = _build_fixture()

    ds = rnd.NuScenesDataset.__new__(rnd.NuScenesDataset)
    ds.map_env = type("ME", (), {})()
    ds.map_env.nusc_raster = torch.from_numpy(
        raster.astype(np.float32))
    ds.map_env.layer_map = {"drivable_area": 0, "carpark_area": 1}
    ds.map_env.nusc_dx = torch.from_numpy(dx)
    ds.scene2map = {"scene-0001": ("boston-seaport", 0)}
    ds.use_challenge_splits = False
    ds.require_full_past = False
    ds.flip_singapore = False
    ds.noise_std = 0.0
    ds.npast, ds.nfuture = 4, 6
    ds.seq_len = 10
    ds.seq_interval = 3
    cats = ["car", "truck"]
    ds.categories = cats
    iden = torch.eye(2, dtype=torch.int)
    ds.cat2vec = {c: iden[i] for i, c in enumerate(cats)}
    ninfo = rnd.NUSC_NORM_STATS[tuple(sorted(cats))]
    mean = [ninfo["lscale"][0]] * 2 + [ninfo["h"][0]] * 2 + \
        [ninfo["s"][0], ninfo["hdot"][0]]
    std = [ninfo["lscale"][1]] * 2 + [ninfo["h"][1]] * 2 + \
        [ninfo["s"][1], ninfo["hdot"][1]]
    ds.normalizer = rnd.MeanStdNormalizer(torch.tensor(mean),
                                          torch.tensor(std))
    ds.veh_att_normalizer = rnd.MeanStdNormalizer(
        torch.tensor([ninfo["l"][0], ninfo["w"][0]]),
        torch.tensor([ninfo["l"][1], ninfo["w"][1]]))
    ds.data, ds.seq_map = ds.post_process(payload)
    ds.data_len = len(ds.seq_map)
    return ds


@pytest.fixture(scope="module")
def ours():
    """The same payload through OUR pipeline: raw arrays ->
    finalize_scene_states -> WindowedSceneDataset."""
    sys.path.insert(0, "scripts")
    from preprocess_nuscenes import finalize_scene_states

    from strive_tpu.data.etl import WindowedSceneDataset
    from strive_tpu.normalize import (att_normalizer_for,
                                      state_normalizer_for)

    raster, dx = _make_raster()
    payload, T = _build_fixture()
    scene = payload["scene-0001"]
    names = ["ego"] + [k for k in scene if k != "ego"]
    cat2vec = {"car": np.eye(2, dtype=np.float32)[0],
               "truck": np.eye(2, dtype=np.float32)[1],
               "ego": np.eye(2, dtype=np.float32)[0]}
    ego_ts = {r["t"]: i for i, r in enumerate(scene["ego"]["traj"])}
    xs, hhs, lws, sems, kinds = [], [], [], [], []
    for n in names:
        a = scene[n]
        x = np.full((T, 4), np.nan)
        hh = np.full((T,), np.nan)
        for r in a["traj"]:
            i = ego_ts[r["t"]]
            x[i] = (r["x"], r["y"], r["hcos"], r["hsin"])
            hh[i] = np.arctan2(r["hsin"], r["hcos"])
        xs.append(x)
        hhs.append(hh)
        lws.append([a["l"], a["w"]])
        sems.append(cat2vec[a["k"]])
        kinds.append(a["k"])
    raw = {"scene-0001": {
        "raw_x": np.stack(xs), "raw_h": np.stack(hhs),
        "ts": np.array([r["t"] * 1e-6 for r in scene["ego"]["traj"]]),
        "lw": np.array(lws, np.float32), "sem": np.stack(sems),
        "map_idx": 0, "name": "scene-0001", "kinds": kinds,
        "agent_tokens": names,
        "sample_tokens": [r["samp_tok"] for r in scene["ego"]["traj"]],
    }}
    scenes = finalize_scene_states(raw, raster, dx, carpark_channel=1)
    cats = ("car", "truck")
    wds = WindowedSceneDataset(
        list(scenes.values()), na_max=16, nc=2, past_len=4, future_len=6,
        state_norm=state_normalizer_for(cats),
        att_norm=att_normalizer_for(cats), seq_interval=3)
    return scenes, wds


def test_states_and_filter_parity(ref_dataset, ours):
    """Per-agent finite-difference states, NaN patterns, visibility, and
    the drivable/carpark frame filter match the reference exactly
    (``nuscenes_dataset.py:416-553``)."""
    scenes, _ = ours
    sc = scenes["scene-0001"]
    ref_info = ref_dataset.data["scene-0001"]

    # same agents survive (the never-on-drivable agent is dropped by both)
    assert "tok_a_never" not in ref_info
    assert sc["agent_tokens"] == list(ref_info.keys())

    for i, tok in enumerate(sc["agent_tokens"]):
        ref_traj = np.asarray(ref_info[tok]["traj"], np.float64)
        ref_vis = np.asarray(ref_info[tok]["is_vis"], np.float64)
        np.testing.assert_allclose(
            sc["traj"][i], ref_traj, rtol=1e-5, atol=1e-5, equal_nan=True,
            err_msg=f"traj mismatch for {tok}")
        np.testing.assert_array_equal(
            sc["vis"][i], ref_vis, err_msg=f"vis mismatch for {tok}")
        np.testing.assert_allclose(
            sc["lw"][i], np.asarray(ref_info[tok]["lw"]), rtol=1e-6,
            err_msg=f"lw mismatch for {tok}")

    # the filter actually fired: offroad agent loses frames it has
    # annotations for, carpark agent loses its parked frames
    off_i = sc["agent_tokens"].index("tok_a_offroad")
    assert np.isnan(sc["traj"][off_i, :, 0]).any()
    cp_i = sc["agent_tokens"].index("tok_a_carpark")
    assert np.isnan(sc["traj"][cp_i, 3:6, 0]).all()


def test_window_map_parity(ref_dataset, ours):
    """Window start indices match the reference seq_map
    (``nuscenes_dataset.py:584-589``)."""
    _, wds = ours
    ref_starts = [s for (_, s) in ref_dataset.seq_map]
    our_starts = [s for (_, s) in wds.windows]
    assert our_starts == ref_starts


def test_getitem_parity(ref_dataset, ours):
    """Every window's tensors match the reference __getitem__
    (``nuscenes_dataset.py:594-687``): same agent selection/order, same
    normalized past/future (incl. NaN patterns), vis, sem, lw."""
    _, wds = ours
    assert len(wds) == len(ref_dataset.seq_map)
    for idx in range(len(wds)):
        g, map_idx = ref_dataset[idx]
        w = wds.window_scene(idx)
        assert int(map_idx) == w["map_idx"]
        for ref_t, ours_k in [(g.past, "past"), (g.future, "future"),
                              (g.past_vis, "past_vis"),
                              (g.future_vis, "future_vis"),
                              (g.sem, "sem"), (g.lw, "lw")]:
            np.testing.assert_allclose(
                np.asarray(w[ours_k], np.float64),
                ref_t.numpy().astype(np.float64), rtol=1e-4, atol=1e-5,
                equal_nan=True, err_msg=f"{ours_k} mismatch at window {idx}")
