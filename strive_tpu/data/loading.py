"""Unified data/map loading for entry scripts.

Supports three data versions:
- 'synthetic': procedurally generated scenes + maps (always available; used
  for smoke tests and benchmarks),
- 'mini'/'trainval': real nuScenes through the offline ETL
  (``strive_tpu.data.etl``) — requires the preprocessed npz produced by
  ``scripts/preprocess_nuscenes.py`` (which needs nuscenes-devkit).
"""

from __future__ import annotations

import os

import numpy as np

from ..maps.lanegraph import synthetic_lanegraph
from ..maps.store import MapStore, synthetic_map_store
from ..normalize import att_normalizer_for, state_normalizer_for
from .dataset import SceneDataset
from .synthetic import synthetic_scene_list


def load_environment(cfg, split="train", load_lanegraph=False):
    """Returns (SceneDataset, MapStore, lane_graphs|None, state_norm, att_norm).

    For 'synthetic', fabricates NUM_SYNTH scenes deterministically per
    split. For real nuScenes, loads the ETL output directory
    ``{data_dir}/strive_tpu_etl/{version}``.
    """
    cats = tuple(sorted(cfg.agent_types))
    state_norm = state_normalizer_for(cats)
    att_norm = att_normalizer_for(cats)
    nc = len(cfg.agent_types)

    if cfg.data_version == "synthetic":
        seed = {"train": 0, "val": 1, "test": 2}.get(split, 3)
        num = getattr(cfg, "synth_scenes", 24)
        store = synthetic_map_store(num_maps=2, size_px=512, channels=4,
                                    pix_per_m=4.0)
        scenes = synthetic_scene_list(
            num_scenes=num, num_maps=2, map_size_px=512, PT=cfg.past_len,
            FT=cfg.future_len, NC=nc, min_agents=2,
            max_agents=cfg.max_agents, seed=seed, categories=cats,
        )
        ds = SceneDataset(scenes, cfg.max_agents, nc)
        lgs = None
        if load_lanegraph:
            lg = synthetic_lanegraph(extent_m=128.0, spacing_m=32.0)
            lgs = {name: lg for name in store.map_names}
        ds = _maybe_append_scenarios(ds, cfg, split, store, state_norm,
                                     att_norm, nc)
        return ds, store, lgs, state_norm, att_norm

    # real nuScenes via ETL artifacts
    from .etl import load_etl_dataset

    etl_dir = os.path.join(cfg.data_dir, "strive_tpu_etl", cfg.data_version)
    ds, store, lgs, state_norm, att_norm = load_etl_dataset(
        etl_dir, split, cfg, state_norm, att_norm,
        load_lanegraph=load_lanegraph)
    ds = _maybe_append_scenarios(ds, cfg, split, store, state_norm, att_norm,
                                 nc)
    return ds, store, lgs, state_norm, att_norm


def _maybe_append_scenarios(ds, cfg, split, store, state_norm, att_norm, nc):
    """Append saved adversarial scenarios to the training set
    (reference ``--scenario_dir``, ``nuscenes_dataset.py:197-204``)."""
    scen_dir = getattr(cfg, "scenario_dir", None)
    if not scen_dir or split != "train" or not os.path.isdir(scen_dir):
        return ds
    from .etl import WindowedSceneDataset
    from .dataset import ConcatSceneDataset
    from .scenario_ingest import scenarios_as_scenes

    raw = scenarios_as_scenes(scen_dir, list(store.map_names), nc)
    if not raw:
        return ds
    extra = WindowedSceneDataset(
        raw, cfg.max_agents, nc, cfg.past_len, cfg.future_len,
        state_norm, att_norm, seq_interval=1,
        noise_std=getattr(cfg, "data_noise_std", 0.0),
        include_final_window=True,
    )
    print(f"Appended {len(extra)} scenario windows from {scen_dir}")
    return ConcatSceneDataset([ds, extra])
