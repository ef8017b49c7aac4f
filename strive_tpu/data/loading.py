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
from ..maps.store import MapStore, synthetic_map_store, upsample_store
from ..normalize import (att_normalizer_for, effective_categories,
                         state_normalizer_for)
from .dataset import SceneDataset
from .synthetic import synthetic_scene_list


def parse_buckets(cfg):
    """cfg.na_buckets 'a,b,c' -> tuple | None."""
    raw = getattr(cfg, "na_buckets", None)
    if not raw:
        return None
    return tuple(int(x) for x in str(raw).split(",") if x.strip())


def load_environment(cfg, split="train", load_lanegraph=False,
                     pix_per_m=None):
    """Returns (SceneDataset, MapStore, lane_graphs|None, state_norm, att_norm).

    For 'synthetic', fabricates NUM_SYNTH scenes deterministically per
    split. For real nuScenes, loads the ETL output directory
    ``{data_dir}/strive_tpu_etl/{version}``.

    :param pix_per_m: optional raster resolution override (the reference
        re-rasterizes at 8 px/m for qualitative eval, ``eval_adv_gen.py:683``).
        Synthetic maps are regenerated at that resolution; ETL rasters are
        integer-upsampled (nearest) since re-rasterization needs the devkit.
    """
    cats = effective_categories(cfg.agent_types,
                                getattr(cfg, "reduce_cats", False))
    state_norm = state_normalizer_for(cats)
    att_norm = att_normalizer_for(cats)
    nc = len(cats)

    if cfg.data_version == "synthetic":
        seed = {"train": 0, "val": 1, "test": 2}.get(split, 3)
        num = getattr(cfg, "synth_scenes", 24)
        store = synthetic_map_store(num_maps=2, size_px=512, channels=4,
                                    pix_per_m=4.0)
        if pix_per_m is not None and pix_per_m > 4.0:
            store = upsample_store(store, int(round(pix_per_m / 4.0)))
        scenes = synthetic_scene_list(
            num_scenes=num, num_maps=2, map_size_px=512, PT=cfg.past_len,
            FT=cfg.future_len, NC=nc, min_agents=2,
            max_agents=cfg.max_agents, seed=seed, categories=cats,
        )
        ds = SceneDataset(scenes, cfg.max_agents, nc,
                          buckets=parse_buckets(cfg))
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
    if pix_per_m is not None:
        # Base the factor on the FINEST map in the store: all maps share
        # one stacked raster array, so a single integer factor applies to
        # every map. Using the coarsest map's resolution here would blow
        # finer maps far past the requested pix_per_m (64x+ raster memory
        # in a heterogeneous store) for zero information gain; capping at
        # the finest map keeps every map at <= pix_per_m.
        native_finest = 1.0 / float(np.min(np.asarray(store.dx)))
        if pix_per_m > native_finest:
            store = upsample_store(store,
                                   int(round(pix_per_m / native_finest)))
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
