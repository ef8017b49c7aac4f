"""Map-crop CNN encoder.

Matches reference ``models/traffic_model.py:62-87``: a stack of
(Conv2d VALID-padded, GroupNorm(1 group), ReLU) followed by flatten and a
Linear to ``map_feat_size``. Default config: kernels [7,5,5,3,3,3], strides
all 2, filters [16,32,64,64,128,128], input 256x256 -> 2x2x128 -> 64.

Convs run in NHWC (TPU-native layout); callers pass crops as (B, C, H, W)
and we transpose once on entry.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn


def calc_conv_out(in_size, kernel, stride, padding=0):
    """Reference ``utils/torch.py:62-63``."""
    return int((in_size - kernel - 2 * padding) // stride + 1)


class MapEncoder(nn.Module):
    feat_size: int = 64
    kernels: Sequence[int] = (7, 5, 5, 3, 3, 3)
    strides: Sequence[int] = (2, 2, 2, 2, 2, 2)
    filters: Sequence[int] = (16, 32, 64, 64, 128, 128)
    dtype: Any = None  # compute dtype (bf16 for speed; params stay f32)

    @nn.compact
    def __call__(self, crop):
        """:param crop: (B, C, H, W) float map crop; :return: (B, feat_size)
        in float32."""
        x = crop.transpose(0, 2, 3, 1)  # NHWC
        if self.dtype is not None:
            x = x.astype(self.dtype)
        for i, (k, s, f) in enumerate(zip(self.kernels, self.strides, self.filters)):
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
