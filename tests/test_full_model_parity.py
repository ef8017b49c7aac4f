"""GOLDEN full-model parity: the reference torch TrafficModel vs ours.

Runs the actual reference model (``/root/reference/src/models/
traffic_model.py``) on CPU torch through the fully-connected
MessagePassing shim (tg_shim.py), converts its weights with
``convert_traffic_model_state_dict``, and asserts our Flax model produces
the same prior/posterior distributions and the same autoregressive
bicycle rollout on identical inputs (VERDICT r1 item 4).

Both models read identical map-crop pixels: the reference side gets them
from a map-env shim that delegates to our ``get_map_crop`` (crop parity
itself is covered by tests/test_maps.py + tests/test_crop_kernel.py).
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(__file__))
from helpers import TEST_CATS, make_scene, tiny_model, tiny_store

from strive_tpu.maps.queries import get_map_crop
from strive_tpu.normalize import att_normalizer_for, state_normalizer_for
from strive_tpu.utils.convert import convert_traffic_model_state_dict

BOUNDS = (-4.0, -8.0, 12.0, 8.0)
MAP_PX = 64


class _RefMapEnv:
    """map_env shim for the reference model: serves crops through OUR
    gather (reference ``map_env.get_map_crop``, ``map_env.py:168-203``)."""

    def __init__(self, store, node_map_idx):
        self.store = store
        self.node_map_idx = node_map_idx  # (NA_total,) int per NODE

    def get_map_crop(self, scene_graph, map_idx):
        pos = scene_graph.pos.detach().cpu().numpy()  # (NA, 4) UNNORM
        crop = get_map_crop(
            self.store.raster, self.store.dx, jnp.asarray(pos),
            jnp.asarray(self.node_map_idx), BOUNDS, L=MAP_PX, W=MAP_PX,
            packed=self.store.packed,
        )
        return torch.from_numpy(np.asarray(crop))


def _build_reference_model(reference_src, state_norm, att_norm):
    import tg_shim

    tg_shim.install()
    from models.traffic_model import TrafficModel as RefTrafficModel
    from datasets.utils import MeanStdNormalizer as RefNorm
    from datasets.utils import NUSC_BIKE_PARAMS

    torch.manual_seed(7)  # deterministic reference weights
    ref = RefTrafficModel(
        npast=4, nfuture=6, map_obs_size_pix=MAP_PX, nclasses=2,
        conv_channel_in=3, conv_kernel_list=[5, 3, 3],
        conv_stride_list=[2, 2, 2], conv_filter_list=[8, 8, 16],
    )
    ref.set_normalizer(RefNorm(torch.tensor(np.asarray(state_norm.mean)),
                               torch.tensor(np.asarray(state_norm.std))))
    ref.set_att_normalizer(RefNorm(torch.tensor(np.asarray(att_norm.mean)),
                                   torch.tensor(np.asarray(att_norm.std))))
    ref.set_bicycle_params({
        k: (torch.tensor(v) if isinstance(v, tuple) else v)
        for k, v in NUSC_BIKE_PARAMS.items()
    })
    ref.eval()
    return ref


def _torch_graph(scene):
    """Concatenated real-agent graph exactly as the reference dataset
    builds it (``nuscenes_dataset.py:605-687``): fully connected directed
    edges per scene, no self-loops, ego first per scene, global ptr."""
    import tg_shim

    mask = np.asarray(scene.mask)
    parts = {k: [] for k in ("past", "past_vis", "future", "future_vis",
                             "lw", "sem")}
    batch, ptr, edges = [], [0], []
    offset = 0
    for b in range(scene.B):
        n = int(mask[b].sum())
        parts["past"].append(np.asarray(scene.past[b, :n]))
        parts["past_vis"].append(np.asarray(scene.past_vis[b, :n]))
        parts["future"].append(np.asarray(scene.future_gt[b, :n]))
        parts["future_vis"].append(np.asarray(scene.future_vis[b, :n]))
        parts["lw"].append(np.asarray(scene.lw[b, :n]))
        parts["sem"].append(np.asarray(scene.sem[b, :n]))
        batch.extend([b] * n)
        for i in range(n):
            for j in range(n):
                if i != j:
                    edges.append((offset + j, offset + i))  # src, dst
        offset += n
        ptr.append(offset)
    flat = {k: torch.from_numpy(np.concatenate(v).astype(np.float32))
            for k, v in parts.items()}
    g = tg_shim.Graph(
        **flat,
        future_gt=flat["future"].clone(),
        edge_index=torch.tensor(np.asarray(edges).T, dtype=torch.long),
        batch=torch.tensor(batch, dtype=torch.long),
        ptr=torch.tensor(ptr, dtype=torch.long),
    )
    return g, mask


@pytest.fixture(scope="module")
def setup(reference_src):
    rng = np.random.default_rng(11)
    scene = make_scene(rng, B=2, NA=4, PT=4, FT=6)
    store = tiny_store()
    state_norm = state_normalizer_for(TEST_CATS)
    att_norm = att_normalizer_for(TEST_CATS)
    ref = _build_reference_model(reference_src, state_norm, att_norm)
    model = tiny_model(FT=6, PT=4)
    params = convert_traffic_model_state_dict(ref.state_dict(), model)
    graph, mask = _torch_graph(scene)
    node_map_idx = np.repeat(np.asarray(scene.map_idx),
                             mask.sum(axis=1).astype(int))
    map_env = _RefMapEnv(store, node_map_idx)
    map_idx = torch.tensor(np.asarray(scene.map_idx), dtype=torch.long)
    return ref, model, params, scene, store, graph, mask, map_env, map_idx


def _dense_to_flat(x, mask):
    """(B, NA, ...) -> (NA_total, ...) dropping padded agents."""
    x = np.asarray(x)
    return np.concatenate([x[b][mask[b]] for b in range(x.shape[0])])


def test_forward_parity(setup):
    ref, model, params, scene, store, graph, mask, map_env, map_idx = setup
    with torch.no_grad():
        ref_out = ref(graph, map_idx, map_env, use_post_mean=True)
    ours = model.apply(params, scene, store, jax.random.PRNGKey(0),
                       use_post_mean=True, method="forward")

    for key in ("prior_out", "posterior_out"):
        for i, part in enumerate(("mean", "var")):
            r = ref_out[key][i].numpy()
            o = _dense_to_flat(ours[key][i], mask)
            np.testing.assert_allclose(
                o, r, rtol=2e-4, atol=2e-5,
                err_msg=f"{key}.{part} mismatch")

    r_fut = ref_out["future_pred"].numpy()
    o_fut = _dense_to_flat(ours["future_pred"], mask)
    np.testing.assert_allclose(o_fut, r_fut, rtol=2e-3, atol=5e-4,
                               err_msg="autoregressive rollout mismatch")


def test_reconstruct_parity(setup):
    ref, model, params, scene, store, graph, mask, map_env, map_idx = setup
    with torch.no_grad():
        ref_out = ref.reconstruct(graph, map_idx, map_env)
    ours = model.apply(params, scene, store, method="reconstruct")
    r_fut = ref_out["future_pred"].numpy()
    o_fut = _dense_to_flat(ours["future_pred"], mask)
    np.testing.assert_allclose(o_fut, r_fut, rtol=2e-3, atol=5e-4)


def test_training_loss_parity(setup):
    """Recon NLL + KL on the forward outputs match the reference
    TrafficModelLoss (``losses/traffic_model.py:20-118``)."""
    ref, model, params, scene, store, graph, mask, map_env, map_idx = setup
    from losses.traffic_model import TrafficModelLoss
    from strive_tpu.losses.training import traffic_model_loss
    from strive_tpu.normalize import att_normalizer_for, state_normalizer_for

    with torch.no_grad():
        ref_out = ref(graph, map_idx, map_env, use_post_mean=True)
        ref_loss_fn = TrafficModelLoss(
            {"recon": 1.0, "kl": 0.004,
             "coll_veh_prior": 0.0, "coll_env_prior": 0.0})
        ref_dict = ref_loss_fn(scene_graph=graph, pred=ref_out)
    ours = model.apply(params, scene, store, jax.random.PRNGKey(0),
                       use_post_mean=True, method="forward")
    our_out = traffic_model_loss(
        scene, ours, {"recon": 1.0, "kl": 0.004},
        state_normalizer_for(TEST_CATS), att_normalizer_for(TEST_CATS),
        store)
    np.testing.assert_allclose(float(our_out["loss"]),
                               float(ref_dict["loss"]), rtol=1e-3)
    np.testing.assert_allclose(float(our_out["recon_loss"]),
                               float(ref_dict["recon_loss"].mean()),
                               rtol=1e-3)
    np.testing.assert_allclose(float(our_out["kl_loss"]),
                               float(ref_dict["kl_loss"].mean()), rtol=1e-3)
