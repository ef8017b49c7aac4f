"""Convert reference PyTorch checkpoints to strive_tpu Flax parameters.

Maps the reference TrafficModel state_dict (``models/traffic_model.py``,
``models/common.py:8-44`` MLP layout, torch ``nn.GRU`` weights) onto our
module tree so pretrained reference weights run unchanged on TPU:

- Linear: weight (out, in) -> kernel (in, out)
- Conv2d: weight (O, I, kH, kW) -> kernel (kH, kW, I, O)
- the post-conv flatten Linear gets its input dim permuted from torch's
  CHW order to flax's HWC order
- torch GRU weight_ih/hh_l{k} split into our per-layer ih/hh Dense (gate
  order r, z, n is identical)
"""

from __future__ import annotations

import numpy as np


def _lin(sd, name):
    return {"kernel": np.ascontiguousarray(sd[name + ".weight"].T),
            "bias": np.asarray(sd[name + ".bias"])}


def _ln(sd, name):
    return {"scale": np.asarray(sd[name + ".weight"]),
            "bias": np.asarray(sd[name + ".bias"])}


def _conv(sd, name):
    w = np.asarray(sd[name + ".weight"])  # (O, I, kH, kW)
    return {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
            "bias": np.asarray(sd[name + ".bias"])}


def _gn(sd, name):
    return {"scale": np.asarray(sd[name + ".weight"]),
            "bias": np.asarray(sd[name + ".bias"])}


def convert_mlp(sd, prefix, widths):
    """Reference MLP ``net`` ModuleList -> our fc{i}/ln{i} names.

    :param widths: number of Linear layers (e.g. 4 for [in,128,128,128,out])
    """
    out = {"fc0": _lin(sd, f"{prefix}.net.0")}
    # layers: [L0, (LN, act, L)*]: linear i>=1 at module index 3i-2+... the
    # ModuleList is [L, LN, act, L, LN, act, L, ...] -> linear i at 3i-2
    for i in range(1, widths):
        mod_idx = 3 * i - 2
        out[f"ln{i}"] = _ln(sd, f"{prefix}.net.{mod_idx}")
        out[f"fc{i}"] = _lin(sd, f"{prefix}.net.{mod_idx + 2}")
    return out


def convert_interaction_net(sd, prefix):
    """SceneInteractionNet: mlp_in (4 linears), conv0 edge/update, mlp_out."""
    return {
        "mlp_in": convert_mlp(sd, f"{prefix}.mlp_in", 3),
        "conv0": {
            "edge_mlp": convert_mlp(sd, f"{prefix}.msg.0.edge_mlp", 3),
            "update_mlp": convert_mlp(sd, f"{prefix}.msg.0.update_mlp", 2),
        },
        "mlp_out": convert_mlp(sd, f"{prefix}.mlp_out", 3),
    }


def convert_gru(sd, prefix, num_layers):
    """torch nn.GRU -> StackedGRU layer{k}/{ih,hh}."""
    out = {}
    for k in range(num_layers):
        wih = np.asarray(sd[f"{prefix}.weight_ih_l{k}"])  # (3H, in)
        whh = np.asarray(sd[f"{prefix}.weight_hh_l{k}"])
        out[f"layer{k}"] = {
            "ih": {"kernel": np.ascontiguousarray(wih.T),
                   "bias": np.asarray(sd[f"{prefix}.bias_ih_l{k}"])},
            "hh": {"kernel": np.ascontiguousarray(whh.T),
                   "bias": np.asarray(sd[f"{prefix}.bias_hh_l{k}"])},
        }
    return out


def chw_to_hwc_perm(C, H, W):
    """Permutation p with flax_in[i] = torch_in[p[i]] for the flatten dim."""
    idx = np.arange(C * H * W).reshape(C, H, W)  # torch order
    return idx.transpose(1, 2, 0).reshape(-1)    # hwc order


def convert_map_encoder(sd, n_convs, final_hw, final_c):
    out = {}
    for i in range(n_convs):
        out[f"conv{i}"] = _conv(sd, f"map_conv.{3 * i}")
        out[f"gn{i}"] = _gn(sd, f"map_conv.{3 * i + 1}")
    lin = _lin(sd, "map_feature")
    perm = chw_to_hwc_perm(final_c, final_hw, final_hw)
    lin["kernel"] = np.ascontiguousarray(lin["kernel"][perm])
    out["out"] = lin
    return out


def convert_traffic_model_state_dict(sd, model):
    """Full reference TrafficModel state_dict -> flax params dict.

    :param sd: dict of torch tensors (or numpy arrays) keyed by reference
        parameter names
    :param model: the strive_tpu TrafficModel (for conv geometry)
    :return: {'params': {...}} pytree matching model.init
    """
    sd = {k: np.asarray(getattr(v, "cpu", lambda: v)()) for k, v in sd.items()}
    from ..model.cnn import calc_conv_out

    hw = model.map_obs_size_pix
    for k, s in zip(model.conv_kernels, model.conv_strides):
        hw = calc_conv_out(hw, k, s)
    params = {
        "map_encoder": convert_map_encoder(sd, len(model.conv_kernels), hw,
                                           model.conv_filters[-1]),
        "prior_net": convert_interaction_net(sd, "prior_net"),
        "posterior_net": convert_interaction_net(sd, "posterior_net"),
        "decoder_net": convert_interaction_net(sd, "decoder_net"),
        "decoder_memory": convert_gru(sd, "decoder_memory",
                                      model.num_memory_layers),
    }
    if model.traj_encoder == "mlp":
        params["past_encoder"] = convert_mlp(sd, "past_encoder", 4)
        params["future_encoder"] = convert_mlp(sd, "future_encoder", 4)
    else:
        params["past_gru"] = convert_gru(sd, "past_encoder", 4)
        params["past_out"] = _lin(sd, "past_out_layer")
        params["future_gru"] = convert_gru(sd, "future_encoder", 4)
        params["future_out"] = _lin(sd, "future_out_layer")
    import jax.numpy as jnp
    import jax

    params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float32),
                                    params)
    return {"params": params}
