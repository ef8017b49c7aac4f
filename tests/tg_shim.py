"""Minimal torch_geometric shim so the reference model runs on CPU torch.

The image has torch but no torch-geometric wheel; the reference's only pyg
dependency inside the MODEL is ``MessagePassing(aggr='max',
flow='source_to_target')`` over fully-connected per-scene graphs
(``models/interaction_net.py:10,130-136``; graphs built at
``datasets/nuscenes_dataset.py:678-687``). This shim implements exactly
that contract: ``propagate`` gathers ``*_i``/``*_j`` arguments by the
message signature, max-aggregates per target node, and dispatches
``update`` by its signature — enough for golden full-model parity tests.
"""

from __future__ import annotations

import inspect
import sys
import types

import torch


class MessagePassing(torch.nn.Module):
    def __init__(self, aggr="max", flow="source_to_target", **kwargs):
        super().__init__()
        if aggr != "max" or flow != "source_to_target":
            raise NotImplementedError(
                "shim supports the reference's aggr='max', "
                "flow='source_to_target' only")
        self.aggr = aggr
        self.flow = flow

    def propagate(self, edge_index, **kwargs):
        src, dst = edge_index[0], edge_index[1]

        def at(name, idx):
            v = kwargs.get(name)
            return None if v is None else v[idx]

        margs = {}
        for pname in inspect.signature(self.message).parameters:
            if pname.endswith("_i"):
                margs[pname] = at(pname[:-2], dst)
            elif pname.endswith("_j"):
                margs[pname] = at(pname[:-2], src)
            else:
                margs[pname] = kwargs.get(pname)
        msgs = self.message(**margs)  # (E, ...)

        n_nodes = kwargs["x"].size(0)
        out = msgs.new_full((n_nodes,) + tuple(msgs.shape[1:]),
                            float("-inf"))
        idx = dst.reshape((-1,) + (1,) * (msgs.dim() - 1)).expand_as(msgs)
        out.scatter_reduce_(0, idx, msgs, reduce="amax", include_self=True)
        # isolated nodes: pyg's max aggregation yields 0
        out = torch.where(torch.isinf(out), torch.zeros_like(out), out)

        upd_params = list(inspect.signature(self.update).parameters)
        uargs = {p: kwargs.get(p) for p in upd_params[1:]}
        return self.update(out, **uargs)


class Graph:
    """Attribute bag duck-typing torch_geometric.data.Data as the reference
    model uses it (attribute access + ``'key' in graph``)."""

    def __init__(self, **kwargs):
        for k, v in kwargs.items():
            setattr(self, k, v)

    def __contains__(self, key):
        return getattr(self, key, None) is not None


def install_nuscenes_stub():
    """Stub the nuscenes-devkit import chain (absent in this image) so
    reference modules that merely import it (e.g. losses/traffic_model.py
    via datasets/nuscenes_utils.py) load; devkit-touching code paths are
    never executed in parity tests."""
    if "nuscenes" in sys.modules:
        return
    root = types.ModuleType("nuscenes")
    me = types.ModuleType("nuscenes.map_expansion")
    api = types.ModuleType("nuscenes.map_expansion.map_api")

    class _Unavailable:
        def __init__(self, *a, **k):
            raise RuntimeError("nuscenes-devkit not available (tg_shim)")

    api.NuScenesMap = _Unavailable
    arcline = types.ModuleType("nuscenes.map_expansion.arcline_path_utils")
    arcline.discretize_lane = _Unavailable
    nusc_mod = types.ModuleType("nuscenes.nuscenes")
    nusc_mod.NuScenes = _Unavailable
    util_mod = types.ModuleType("nuscenes.utils")
    splits_mod = types.ModuleType("nuscenes.utils.splits")
    splits_mod.create_splits_scenes = _Unavailable
    root.map_expansion = me
    me.map_api = api
    me.arcline_path_utils = arcline
    root.nuscenes = nusc_mod
    root.utils = util_mod
    util_mod.splits = splits_mod
    for name, mod in [
        ("nuscenes", root), ("nuscenes.map_expansion", me),
        ("nuscenes.map_expansion.map_api", api),
        ("nuscenes.map_expansion.arcline_path_utils", arcline),
        ("nuscenes.nuscenes", nusc_mod), ("nuscenes.utils", util_mod),
        ("nuscenes.utils.splits", splits_mod),
    ]:
        sys.modules[name] = mod
    if "pyquaternion" not in sys.modules:
        try:
            import pyquaternion  # noqa: F401
        except ImportError:
            pq = types.ModuleType("pyquaternion")
            pq.Quaternion = _Unavailable  # only touched by devkit paths
            sys.modules["pyquaternion"] = pq


def install():
    """Register shim modules under the torch_geometric names."""
    install_nuscenes_stub()
    if "torch_geometric" in sys.modules:
        return
    root = types.ModuleType("torch_geometric")
    nn_mod = types.ModuleType("torch_geometric.nn")
    nn_mod.MessagePassing = MessagePassing
    data_mod = types.ModuleType("torch_geometric.data")
    data_mod.Data = Graph
    data_mod.Batch = Graph
    data_mod.DataLoader = None  # dataset-side only; unused by the model
    utils_mod = types.ModuleType("torch_geometric.utils")

    def _unsupported(*a, **k):
        raise NotImplementedError("tg shim: subgraph not supported")

    utils_mod.subgraph = _unsupported
    root.nn = nn_mod
    root.data = data_mod
    root.utils = utils_mod
    sys.modules["torch_geometric"] = root
    sys.modules["torch_geometric.nn"] = nn_mod
    sys.modules["torch_geometric.data"] = data_mod
    sys.modules["torch_geometric.utils"] = utils_mod
