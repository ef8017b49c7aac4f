"""Render saved scenario JSONs to images/video
(reference ``viz_scenario_dir.py``)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from strive_tpu.data.loading import load_environment
from strive_tpu.data.scenario_json import read_adv_scenes
from strive_tpu.utils.config import add_base_args, get_parser
from strive_tpu.utils.logger import Logger, mkdir
from strive_tpu.viz import get_adv_coloring, render_rollout_video, render_scene


def parse_cfg(argv=None):
    parser = get_parser("Visualize a directory of scenarios")
    parser = add_base_args(parser)
    parser.add_argument("--scenario_dir", type=str, required=True)
    parser.add_argument("--video", action="store_true", default=False)
    parser.add_argument("--synth_scenes", type=int, default=4)
    return parser.parse(argv)


def main(argv=None):
    cfg = parse_cfg(argv)
    cfg.out = cfg.out + "_" + str(int(time.time()))
    mkdir(cfg.out)
    Logger.init(os.path.join(cfg.out, "viz_log.txt"))

    _, store, _, _, _ = load_environment(cfg, "val")
    scenes = read_adv_scenes(cfg.scenario_dir)
    Logger.log(f"Rendering {len(scenes)} scenarios to {cfg.out}")
    for sc in scenes:
        map_idx = store.map_names.index(sc["map"]) if sc["map"] in \
            store.map_names else 0
        NA = sc["scene_past"].shape[0]
        mask = np.ones(NA, bool)
        colors = get_adv_coloring(NA, sc.get("attack_agt"), 0)
        render_scene(
            os.path.join(cfg.out, sc["name"] + ".jpg"), store, map_idx,
            sc["scene_past"], sc["scene_fut"][:, :, :4], sc["veh_att"], mask,
            car_colors=colors, title=sc["name"],
        )
        if cfg.video:
            render_rollout_video(
                os.path.join(cfg.out, sc["name"]), store, map_idx,
                sc["scene_past"], sc["scene_fut"][:, :, :4], sc["veh_att"],
                mask, car_colors=colors,
            )


if __name__ == "__main__":
    main()
