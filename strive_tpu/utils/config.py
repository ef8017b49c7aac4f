"""Config/CLI system: argparse + YAML config files.

Mirrors the reference's configargparse setup (``utils/config.py:8-79``) —
same flag names and defaults, same precedence (CLI > config file >
defaults) — without the configargparse dependency: ``-c file.yaml`` loads a
YAML mapping whose keys override parser defaults. The reference's ``.cfg``
files parse unchanged.
"""

from __future__ import annotations

import argparse
import sys

import yaml


class ConfigParser(argparse.ArgumentParser):
    """ArgumentParser with a required ``-c/--config`` YAML file."""

    def __init__(self, description=""):
        super().__init__(description=description,
                         formatter_class=argparse.ArgumentDefaultsHelpFormatter)
        self.add_argument("-c", "--config", type=str, default=None,
                          help="yaml config file path")

    def parse(self, argv=None):
        argv = sys.argv[1:] if argv is None else argv
        # first pass just to find the config file
        pre, _ = super().parse_known_args(argv)
        if pre.config is not None:
            with open(pre.config) as f:
                cfg = yaml.safe_load(f) or {}
            known = {a.dest for a in self._actions}
            unknown = [k for k in cfg if k not in known]
            if unknown:
                raise SystemExit(f"Unknown config keys in {pre.config}: {unknown}")
            # normalize YAML values against the declared types
            for a in self._actions:
                if a.dest in cfg:
                    v = cfg[a.dest]
                    if isinstance(v, str) and a.nargs in ("+", "*"):
                        v = v.split()
                    a.default = v
                    a.required = False
        args = super().parse_args(argv)
        return args


def get_parser(description):
    return ConfigParser(description)


def add_base_args(parser):
    """Shared flags (reference ``utils/config.py:20-79``)."""
    parser.add_argument("--wandb_project", type=str, default=None)
    parser.add_argument("--wandb_name", type=str, default=None)
    parser.add_argument("--wandb_offline", action="store_true", default=False)

    parser.add_argument("--out", type=str, default="./out/traffic_out",
                        help="Directory to save model weights and logs to.")

    parser.add_argument("--data_dir", type=str, default="./data/nuscenes")
    parser.add_argument("--data_version", type=str, default="trainval",
                        choices=["trainval", "mini", "synthetic"])
    parser.add_argument("--use_challenge_splits", action="store_true",
                        default=False)

    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--num_workers", type=int, default=2,
                        help="(unused on TPU; kept for config compatibility)")

    parser.add_argument("--past_len", type=int, default=4)
    parser.add_argument("--future_len", type=int, default=12)
    parser.add_argument("--agent_types", type=str, nargs="+",
                        default=["car", "truck"])
    parser.add_argument("--reduce_cats", action="store_true", default=False)

    parser.add_argument("--map_obs_size_pix", type=int, default=256)
    parser.add_argument("--map_obs_bounds", type=float, nargs=4,
                        default=[-17.0, -38.5, 60.0, 38.5])
    parser.add_argument("--map_layers", type=str, nargs="+",
                        default=["drivable_area", "carpark_area",
                                 "road_divider", "lane_divider"])

    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--map_feat_size", type=int, default=64)
    parser.add_argument("--past_feat_size", type=int, default=64)
    parser.add_argument("--future_feat_size", type=int, default=64)
    parser.add_argument("--latent_size", type=int, default=32)
    parser.add_argument("--no_output_bicycle", dest="model_output_bicycle",
                        action="store_false", default=True)

    parser.add_argument("--conv_kernel_list", type=int, nargs="+",
                        default=[7, 5, 5, 3, 3, 3])
    parser.add_argument("--conv_stride_list", type=int, nargs="+",
                        default=[2, 2, 2, 2, 2, 2])
    parser.add_argument("--conv_filter_list", type=int, nargs="+",
                        default=[16, 32, 64, 64, 128, 128])

    # TPU-specific additions
    parser.add_argument("--max_agents", type=int, default=16,
                        help="Padded agents per scene (NA bucketing cap).")
    parser.add_argument("--na_buckets", type=str, default=None,
                        help="comma-separated NA bucket sizes (e.g. 8,16,32):"
                             " scenes keep ALL agents up to the largest "
                             "bucket and batches group same-bucket scenes "
                             "(SURVEY 7.1; default: trim to max_agents)")
    parser.add_argument("--bf16", action="store_true", default=False,
                        help="Run model matmuls in bfloat16.")
    return parser
