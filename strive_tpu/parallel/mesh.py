"""Device-mesh sharding helpers.

The reference is single-GPU (SURVEY §2.2: no torch.distributed / NCCL
anywhere). The TPU-native scaling axes are:

- ``scenes``: a 1-D mesh axis sharding the scene/batch dimension. Training
  is data-parallel (XLA inserts the gradient psum over ICI); scenario
  optimization is embarrassingly parallel — each device optimizes its own
  shard of scenes.
- samples NS and rollout time stay on-device (vmap / scan).

All entry points jit with NamedSharding specs; the same code runs on 1
chip, a v4-8 slice, or multi-slice (DCN) without change.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis_name="scenes"):
    """1-D mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def scene_sharding(mesh, axis_name="scenes"):
    """NamedSharding that splits the leading (scene) axis."""
    return NamedSharding(mesh, P(axis_name))


def replicate(mesh):
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh, axis_name="scenes"):
    """Place every array in the pytree with its leading axis sharded.

    Scalar/1-D-per-scene arrays (e.g. map_idx (B,)) shard on axis 0 too.
    """
    sh = scene_sharding(mesh, axis_name)

    def put(x):
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, tree)
