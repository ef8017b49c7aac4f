"""Map-crop CNN encoder.

Matches reference ``models/traffic_model.py:62-87``: a stack of
(Conv2d VALID-padded, GroupNorm(1 group), ReLU) followed by flatten and a
Linear to ``map_feat_size``. Default config: kernels [7,5,5,3,3,3], strides
all 2, filters [16,32,64,64,128,128], input 256x256 -> 2x2x128 -> 64.

Convs run in NHWC (TPU-native layout). Callers may pass crops as
(B, C, H, W) (default, reference layout) or (B, H, W, C) with
``input_layout='nhwc'`` to skip the relayout when the producer already
emits channels-last (the crop kernel path does).

TPU performance: the first conv (stride 2, k=7 or 5, 3-4 input channels)
is the worst case for the MXU — the im2col contraction depth is k*k*C with
tiny C, so XLA pads the 128-deep systolic dimension with zeros. The
stride-2 convs are therefore rewritten as space-to-depth + stride-1 convs
(exact same math, weights remapped at apply time): input (H, W, C) ->
(H/2, W/2, 4C) and kernel k x k s=2 -> ceil(k/2) x ceil(k/2) s=1 over 4C
channels, which quadruples the contraction depth and quarters the number
of output rows. The parameter tree is IDENTICAL to the plain conv stack
(same names/shapes), so reference-checkpoint conversion and torch parity
are unaffected.
"""

from __future__ import annotations

import os
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def calc_conv_out(in_size, kernel, stride, padding=0):
    """Reference ``utils/torch.py:62-63``."""
    return int((in_size - kernel - 2 * padding) // stride + 1)


def _space_to_depth(x):
    """(N, H, W, C) -> (N, H/2, W/2, 4C), channel order (dy, dx, c)."""
    N, H, W, C = x.shape
    return (x.reshape(N, H // 2, 2, W // 2, 2, C)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(N, H // 2, W // 2, 4 * C))


def _s2d_kernel(w):
    """Remap a (k, k, C, F) stride-2 conv kernel to the equivalent
    (ka, ka, 4C, F) stride-1 kernel over the space-to-depth input,
    ka = ceil(k/2). Exact: out(i,j) = sum_{p,q} w[p,q,c] x[2i+p, 2j+q, c]
    with p = 2a+dy, q = 2b+dx."""
    k, _, C, F = w.shape
    ka = (k + 1) // 2
    wp = jnp.pad(w, ((0, 2 * ka - k), (0, 2 * ka - k), (0, 0), (0, 0)))
    return (wp.reshape(ka, 2, ka, 2, C, F)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(ka, ka, 4 * C, F))


class _Conv2dS2D(nn.Module):
    """Drop-in for nn.Conv(features, (k,k), strides=(2,2), padding=VALID)
    with identical parameters, computed via space-to-depth + stride-1 conv
    (see module docstring). Requires even input H, W."""

    features: int
    kernel: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k, f = self.kernel, self.features
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (k, k, cin, f))
        b = self.param("bias", nn.initializers.zeros_init(), (f,))
        wn = _s2d_kernel(w)
        y = _space_to_depth(x)
        if self.dtype is not None:
            y = y.astype(self.dtype)
            wn = wn.astype(self.dtype)
        out = jax.lax.conv_general_dilated(
            y, wn, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out + b.astype(out.dtype)


class MapEncoder(nn.Module):
    feat_size: int = 64
    kernels: Sequence[int] = (7, 5, 5, 3, 3, 3)
    strides: Sequence[int] = (2, 2, 2, 2, 2, 2)
    filters: Sequence[int] = (16, 32, 64, 64, 128, 128)
    dtype: Any = None  # compute dtype (bf16 for speed; params stay f32)
    # space-to-depth stride-2 convs (exact rewrite; see module docstring).
    # MEASURED SLOWER on this toolchain (decode+grad 65.6 vs 59.4 ms at 32
    # agents / 256px — XLA's own conv lowering already handles the small-C
    # first layer better than the s2d rewrite's pad+reshape traffic), so
    # OFF by default; kept as an option for future toolchains.
    use_s2d: bool = False

    @nn.compact
    def __call__(self, crop, input_layout="nchw"):
        """:param crop: (B, C, H, W) float map crop (or (B, H, W, C) with
        ``input_layout='nhwc'``); :return: (B, feat_size) in float32."""
        if input_layout == "nchw":
            x = crop.transpose(0, 2, 3, 1)  # NHWC
        else:
            x = crop
        if self.dtype is not None:
            x = x.astype(self.dtype)
        s2d_on = self.use_s2d and not os.environ.get("STRIVE_DISABLE_S2D")
        for i, (k, s, f) in enumerate(zip(self.kernels, self.strides, self.filters)):
            if (s2d_on and s == 2
                    and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
                x = _Conv2dS2D(f, k, dtype=self.dtype, name=f"conv{i}")(x)
            else:
                x = nn.Conv(f, (k, k), strides=(s, s), padding="VALID",
                            dtype=self.dtype, name=f"conv{i}")(x)
            # epsilon matches torch nn.GroupNorm (1e-5) for ckpt conversion
            x = nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=self.dtype,
                             name=f"gn{i}")(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.feat_size, name="out")(x).astype(jnp.float32)

    @staticmethod
    def flat_size(map_px, kernels=(7, 5, 5, 3, 3, 3), strides=(2,) * 6,
                  filters=(16, 32, 64, 64, 128, 128)):
        out = map_px
        for k, s in zip(kernels, strides):
            out = calc_conv_out(out, k, s)
        return out * out * filters[-1]
