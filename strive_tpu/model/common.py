"""Shared neural blocks: reference-layout MLP and torch-semantics GRU.

MLP matches reference ``models/common.py:8-44``: Linear, then for every
subsequent layer (LayerNorm over the previous width -> nonlinearity ->
Linear). No norm/activation before the first Linear or after the last.

GRUCell matches ``torch.nn.GRU`` gate math exactly (reset gate applied to
the *biased* hidden projection), so converted reference checkpoints roll
out identically.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn


class MLP(nn.Module):
    """Reference-layout MLP.

    :param layers: output widths (excluding input width), e.g. the reference
        MLP([in, 128, 128, out]) becomes MLP(layers=(128, 128, out)).
    :param leaky: use LeakyReLU(0.2) instead of ReLU.
    :param dtype: compute dtype (params stay float32).
    """

    layers: Sequence[int]
    leaky: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        act = (lambda v: nn.leaky_relu(v, 0.2)) if self.leaky else nn.relu
        x = nn.Dense(self.layers[0], dtype=self.dtype, name="fc0")(x)
        for i, width in enumerate(self.layers[1:], start=1):
            # epsilon matches torch nn.LayerNorm (1e-5) for ckpt conversion
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"ln{i}")(x)
            x = act(x)
            x = nn.Dense(width, dtype=self.dtype, name=f"fc{i}")(x)
        return x


class GRUCell(nn.Module):
    """Single GRU cell with torch gate semantics.

    h' = (1-z)*n + z*h with n = tanh(W_in x + b_in + r*(W_hn h + b_hn)).
    """

    hidden_size: int

    @nn.compact
    def __call__(self, x, h):
        gates_x = nn.Dense(3 * self.hidden_size, name="ih")(x)
        gates_h = nn.Dense(3 * self.hidden_size, name="hh")(h)
        xr, xz, xn = jnp.split(gates_x, 3, axis=-1)
        hr, hz, hn = jnp.split(gates_h, 3, axis=-1)
        r = nn.sigmoid(xr + hr)
        z = nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        return (1.0 - z) * n + z * h


class StackedGRU(nn.Module):
    """Stack of GRU cells applied to one timestep (state-in, state-out).

    Equivalent to a torch ``nn.GRU(num_layers=L)`` unrolled one step at a
    time; used for the decoder memory (reference ``traffic_model.py:150-156``)
    and the GRU trajectory encoders (:98-119).
    """

    hidden_size: int
    num_layers: int

    @nn.compact
    def __call__(self, x, hs):
        """:param x: (..., D) input; :param hs: (num_layers, ..., H) states.
        :return: (output (..., H), new states (num_layers, ..., H))"""
        new_hs = []
        inp = x
        for l in range(self.num_layers):
            h = GRUCell(self.hidden_size, name=f"layer{l}")(inp, hs[l])
            new_hs.append(h)
            inp = h
        return inp, jnp.stack(new_hs, axis=0)
