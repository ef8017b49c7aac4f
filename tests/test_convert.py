"""Checkpoint-converter parity: torch reference blocks vs our flax modules
with converted weights must produce identical outputs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from strive_tpu.model.common import MLP, StackedGRU
from strive_tpu.model.cnn import MapEncoder
from strive_tpu.utils.convert import (
    chw_to_hwc_perm,
    convert_gru,
    convert_mlp,
    convert_map_encoder,
)


def test_mlp_parity(reference_src, rng):
    from models.common import MLP as RefMLP

    ref = RefMLP([10, 128, 128, 7])
    sd = {"m." + k: v for k, v in ref.state_dict().items()}
    params = {"params": convert_mlp(sd, "m", 3)}
    ours = MLP((128, 128, 7))
    x = rng.normal(size=(5, 10)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()
    got = np.asarray(ours.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_gru_parity(rng):
    T, B, H = 4, 3, 16
    ref = torch.nn.GRU(8, H, 3, batch_first=True)
    sd = {"g." + k: v for k, v in ref.state_dict().items()}
    params = {"params": convert_gru(sd, "g", 3)}
    ours = StackedGRU(H, 3)

    x = rng.normal(size=(B, T, 8)).astype(np.float32)
    with torch.no_grad():
        want, _ = ref(torch.tensor(x))
    h = jnp.zeros((3, B, H))
    outs = []
    for t in range(T):
        o, h = ours.apply(params, jnp.asarray(x[:, t]), h)
        outs.append(o)
    got = np.stack([np.asarray(o) for o in outs], axis=1)
    np.testing.assert_allclose(got, want.numpy(), atol=2e-5)


def test_map_encoder_parity(rng):
    """Conv stack + GroupNorm + flatten Linear vs torch, incl. the CHW->HWC
    flatten permutation."""
    kernels, strides, filters = (5, 3, 3), (2, 2, 2), (8, 8, 16)
    C_in, px = 2, 64

    layers = []
    cin = C_in
    for k, s, f in zip(kernels, strides, filters):
        layers += [torch.nn.Conv2d(cin, f, k, stride=s),
                   torch.nn.GroupNorm(1, f), torch.nn.ReLU()]
        cin = f
    ref_conv = torch.nn.Sequential(*layers)
    out_hw = px
    for k, s in zip(kernels, strides):
        out_hw = (out_hw - k) // s + 1
    ref_lin = torch.nn.Linear(filters[-1] * out_hw * out_hw, 12)

    sd = {"map_conv." + k: v for k, v in ref_conv.state_dict().items()}
    sd.update({"map_feature." + k: v for k, v in ref_lin.state_dict().items()})
    params = {"params": convert_map_encoder(sd, 3, out_hw, filters[-1])}
    ours = MapEncoder(12, kernels, strides, filters)

    x = rng.normal(size=(2, C_in, px, px)).astype(np.float32)
    with torch.no_grad():
        feat = ref_conv(torch.tensor(x))
        want = ref_lin(feat.reshape(2, -1)).numpy()
    got = np.asarray(ours.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_perm_roundtrip():
    C, H, W = 3, 4, 5
    perm = chw_to_hwc_perm(C, H, W)
    chw = np.arange(C * H * W).reshape(C, H, W)
    hwc_flat = chw.transpose(1, 2, 0).reshape(-1)
    np.testing.assert_array_equal(chw.reshape(-1)[perm], hwc_flat)
