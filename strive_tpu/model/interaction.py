"""Dense masked scene interaction network.

The reference (``models/interaction_net.py``) uses torch-geometric
MessagePassing over an explicit fully-connected edge list. Scenes are
*always* fully connected (``nuscenes_dataset.py:678-687``), so on TPU the
same computation is a dense pairwise MLP over (B, NA, NA) with a masked max
reduction — one big matmul on the MXU instead of edge gathers.

Semantics preserved from the reference:
- message to node i from j: MLP([x_i, x_j, sem_i, sem_j, relpose(j in i)])
  (``interaction_net.py:138-183``), rel-pose NaN guard -> 0,
- aggregation: max over incoming messages; nodes with no neighbors get
  zeros (``interaction_net.py:185-188``),
- update: MLP([x, aggr, sem]) with ONE hidden layer
  (``interaction_net.py:115-118`` — MLP([in, hidden, out])),
- wrapper: mlp_in ([in,128,128,msg]) -> k rounds -> mlp_out
  ([msg,128,128,out]) (``interaction_net.py:30-50``).

The unused GRU update modes (gru_update defaults False everywhere in the
reference TrafficModel) are intentionally not implemented.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..geometry import pairwise_transforms
from .common import MLP


class AgentInteractionConv(nn.Module):
    out_channels: int
    hidden_size: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(self, x, pos, sem, mask):
        """
        :param x: (B, NA, D) node features
        :param pos: (B, NA, 4) poses (x, y, hx, hy) for relative transforms
        :param sem: (B, NA, NC) one-hot classes
        :param mask: (B, NA) validity
        :return: (B, NA, out_channels)
        """
        B, NA, D = x.shape
        rel = pairwise_transforms(pos)  # (B, NA, NA, 4), [b,i,j] = j in frame i
        rel = jnp.where(jnp.isnan(rel), 0.0, rel)

        xi = jnp.broadcast_to(x[:, :, None, :], (B, NA, NA, D))
        xj = jnp.broadcast_to(x[:, None, :, :], (B, NA, NA, D))
        semi = jnp.broadcast_to(sem[:, :, None, :], (B, NA, NA, sem.shape[-1]))
        semj = jnp.broadcast_to(sem[:, None, :, :], (B, NA, NA, sem.shape[-1]))
        msg_in = jnp.concatenate([xi, xj, semi, semj, rel], axis=-1)
        msgs = MLP((self.hidden_size, self.hidden_size, self.out_channels),
                   dtype=self.dtype, name="edge_mlp")(msg_in)  # (B,NA,NA,out)

        pair_valid = (mask[:, :, None] & mask[:, None, :]
                      & ~jnp.eye(NA, dtype=bool)[None])  # (B, NA, NA)
        neg = jnp.finfo(msgs.dtype).min
        masked = jnp.where(pair_valid[..., None], msgs, neg)
        aggr = jnp.max(masked, axis=2)  # (B, NA, out)
        has_neighbor = jnp.any(pair_valid, axis=2)[..., None]
        aggr = jnp.where(has_neighbor, aggr, 0.0)

        upd_in = jnp.concatenate([x, aggr, sem], axis=-1)
        out = MLP((self.hidden_size, self.out_channels), dtype=self.dtype,
                  name="update_mlp")(upd_in)
        return out.astype(jnp.float32)


class SceneInteractionNet(nn.Module):
    msg_node_channels: int
    out_channels: int
    k: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, pos, sem, mask):
        x = MLP((128, 128, self.msg_node_channels), dtype=self.dtype,
                name="mlp_in")(x)
        for ki in range(self.k):
            x = AgentInteractionConv(self.msg_node_channels, dtype=self.dtype,
                                     name=f"conv{ki}")(x, pos, sem, mask)
        out = MLP((128, 128, self.out_channels), dtype=self.dtype,
                  name="mlp_out")(x)
        return out.astype(jnp.float32)
