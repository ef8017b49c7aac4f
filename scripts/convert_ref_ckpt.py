"""Convert a reference STRIVE PyTorch checkpoint (.pth) to strive_tpu orbax.

Usage:
  python scripts/convert_ref_ckpt.py --pth model_ckpt/traffic_model.pth \
      --out ./model_ckpt/traffic_model [model config flags...]

The resulting directory loads with --ckpt in every entry script, giving the
pretrained traffic prior without retraining.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from strive_tpu.data.synthetic import synthetic_scene_list
from strive_tpu.maps import synthetic_map_store
from strive_tpu.normalize import att_normalizer_for, state_normalizer_for
from strive_tpu.scene import pad_scene_arrays
from strive_tpu.utils.checkpoint import save_state
from strive_tpu.utils.config import add_base_args, get_parser
from strive_tpu.utils.convert import convert_traffic_model_state_dict

from train_traffic import build_model


def main(argv=None):
    parser = get_parser("Convert reference checkpoint")
    parser = add_base_args(parser)
    parser.add_argument("--pth", type=str, required=True)
    args = parser.parse(argv)

    import torch

    ckpt = torch.load(args.pth, map_location="cpu")
    sd = ckpt["model"] if "model" in ckpt else ckpt
    epoch = ckpt.get("epoch", 0)

    cats = tuple(sorted(args.agent_types))
    state_norm = state_normalizer_for(cats)
    att_norm = att_normalizer_for(cats)
    model = build_model(args, state_norm, att_norm, len(args.agent_types))
    params = convert_traffic_model_state_dict(sd, model)

    # sanity: structure must match a fresh init
    scenes = synthetic_scene_list(num_scenes=1, PT=args.past_len,
                                  FT=args.future_len,
                                  NC=len(args.agent_types), max_agents=3)
    scene = pad_scene_arrays(scenes, 4, len(args.agent_types))
    store = synthetic_map_store(num_maps=2, channels=4)
    key = jax.random.PRNGKey(0)
    ref_params = model.init(key, scene, store, key, method="forward")
    ref_shapes = jax.tree_util.tree_map(lambda x: x.shape, ref_params)
    got_shapes = jax.tree_util.tree_map(lambda x: x.shape, params)
    if ref_shapes != got_shapes:
        import difflib

        a = str(ref_shapes).replace(",", ",\n")
        b = str(got_shapes).replace(",", ",\n")
        sys.exit("Converted parameter tree mismatch:\n" + "\n".join(
            difflib.unified_diff(a.splitlines(), b.splitlines(), lineterm="")))

    out_dir = os.path.dirname(args.out) or "."
    name = os.path.basename(args.out)
    path = save_state(out_dir, name, params, None, cur_epoch=epoch)
    n = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params))
    print(f"Converted {n} params (epoch {epoch}) -> {path}")


if __name__ == "__main__":
    main()
