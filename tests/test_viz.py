"""Smoke tests for the host-side matplotlib viz (strive_tpu/viz.py).

The reference's viz lib (``nuscenes_utils.py:430-854``) has no tests; these
guard the rendering entry points end to end: single-trajectory rainbow
markers, ALL-NS-sample overlays (``viz_scene_graph`` via
``test_traffic.py:181-193``), multi-channel map layers
(``render_map_observation`` palette, ``nuscenes_utils.py:704-731``), adv
coloring, and the rollout-video frame fallback.
"""

import os

import numpy as np
import pytest

from strive_tpu.maps.store import synthetic_map_store
from strive_tpu.viz import (MAP_COLOR_LIST, get_adv_coloring, render_scene,
                            render_rollout_video)


@pytest.fixture(scope="module")
def store():
    return synthetic_map_store(num_maps=1, size_px=256, channels=4,
                               pix_per_m=4.0)


def _scene(na=3, pt=4, ft=6):
    past = np.zeros((na, pt, 6))
    past[:, :, 0] = np.arange(na)[:, None] * 5.0 + 30.0
    past[:, :, 1] = 30.0
    past[:, :, 2] = 1.0
    fut = np.zeros((na, ft, 4))
    fut[..., 0] = past[:, -1:, 0] + np.linspace(1, ft, ft)
    fut[..., 1] = 30.0
    fut[..., 2] = 1.0
    lw = np.full((na, 2), 2.0)
    mask = np.ones(na, bool)
    return past, fut, lw, mask


def test_render_single_traj(tmp_path, store):
    past, fut, lw, mask = _scene()
    p = render_scene(str(tmp_path / "one.png"), store, 0, past, fut, lw,
                     mask, title="single")
    assert os.path.exists(p) and os.path.getsize(p) > 1000


def test_render_multi_sample_overlay(tmp_path, store):
    """(NS, NA, FT, 4) input overlays every sample (reference
    ``test_traffic.py:181-193``)."""
    past, fut, lw, mask = _scene()
    ns_fut = np.stack([fut + i * 0.5 for i in range(4)])
    p = render_scene(str(tmp_path / "multi.png"), store, 0, past, ns_fut,
                     lw, mask)
    assert os.path.exists(p) and os.path.getsize(p) > 1000


def test_adv_coloring_and_partial_mask(tmp_path, store):
    past, fut, lw, mask = _scene(na=4)
    mask[3] = False  # padded agent must not render
    colors = get_adv_coloring(4, attack_agt=2, planner_idx=0)
    assert colors[0] == "green" and colors[2] == "red"
    p = render_scene(str(tmp_path / "adv.png"), store, 0, past, fut, lw,
                     mask, car_colors=colors,
                     gt_future=fut[:, :, :2] + 1.0)
    assert os.path.exists(p)


def test_map_palette_matches_reference():
    # reference nuscenes_utils.py:719 map_color_list head
    assert MAP_COLOR_LIST[:4] == ["darkgray", "coral", "orange", "gold"]


def test_rollout_video_frames(tmp_path, store):
    past, fut, lw, mask = _scene(ft=3)
    out = render_rollout_video(str(tmp_path / "vid"), store, 0, past, fut,
                               lw, mask)
    # mp4 when ffmpeg exists, else the frame dir — both must materialize
    assert os.path.exists(out)
