"""Dense padded scene batches — the TPU-native replacement for
torch-geometric graphs.

The reference batches variable-size scenes as one flat node dimension with
``batch``/``ptr`` bookkeeping and a fully-connected edge list per scene
(``nuscenes_dataset.py:678-687`` builds all directed pairs excluding
self-loops). Since every scene is fully connected, the graph structure
carries no information beyond "which agents share a scene" — so on TPU we
use fixed-shape ``(B, NA)`` padded arrays with a validity mask. Ego is
always agent 0 of each scene (reference ``nuscenes_dataset.py:605-649``
keeps ego at node 0; ``ptr[:-1]`` indexing becomes ``[:, 0]``).

Unobserved frames are encoded with ``*_vis == 0`` masks instead of NaNs
(NaNs poison XLA gradients); padded agent slots carry a benign identity pose
so frame transforms stay finite.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class SceneBatch:
    """A batch of padded scenes. All state arrays are NORMALIZED unless a
    function says otherwise (mirrors the reference convention where the
    dataset emits normalized graphs).

    Shapes: B scenes, NA agents (padded), PT past steps, FT future steps,
    NC semantic classes.
    """

    past: jnp.ndarray          # (B, NA, PT, 6) (x,y,hx,hy,s,hdot)
    past_vis: jnp.ndarray      # (B, NA, PT) 1.0 if observed
    sem: jnp.ndarray           # (B, NA, NC) one-hot class
    lw: jnp.ndarray            # (B, NA, 2) (length, width)
    mask: jnp.ndarray          # (B, NA) True for real agents
    map_idx: jnp.ndarray       # (B,) int32 map index
    future: Optional[jnp.ndarray] = None      # (B, NA, FT, 6) model input
    future_vis: Optional[jnp.ndarray] = None  # (B, NA, FT)
    past_gt: Optional[jnp.ndarray] = None     # (B, NA, PT, 6) clean past
    future_gt: Optional[jnp.ndarray] = None   # (B, NA, FT, 6) clean future

    @property
    def B(self):
        return self.past.shape[0]

    @property
    def NA(self):
        return self.past.shape[1]

    @property
    def PT(self):
        return self.past.shape[2]

    @property
    def FT(self):
        return 0 if self.future is None else self.future.shape[2]

    @property
    def NC(self):
        return self.sem.shape[-1]

    def num_agents(self):
        """(B,) number of real agents per scene."""
        return jnp.sum(self.mask.astype(jnp.int32), axis=1)

    def ego_mask(self):
        """(B, NA) True only at agent 0 (the ego / planner slot)."""
        m = jnp.zeros_like(self.mask)
        return m.at[:, 0].set(True)

    def pair_mask(self):
        """(B, NA, NA) valid ordered pairs (i != j, both real)."""
        m = self.mask[:, :, None] & self.mask[:, None, :]
        eye = jnp.eye(self.NA, dtype=bool)[None]
        return m & ~eye


IDENTITY_STATE = np.array([0.0, 0.0, 1.0, 0.0, 0.0, 0.0], dtype=np.float32)


def pad_scene_arrays(per_scene, na_max, nc):
    """Stack a list of per-scene dicts of numpy arrays into padded arrays.

    Each dict must contain ``past (na, PT, 6)``, ``past_vis``, ``sem (na, NC)``,
    ``lw (na, 2)``, ``map_idx`` (int) and may contain future/future_vis/
    past_gt/future_gt. NaN frames (reference encoding for unobserved) are
    converted to identity states with vis forced to 0.
    """
    B = len(per_scene)
    PT = per_scene[0]["past"].shape[1]

    def _clean(traj, vis=None):
        # replace nan frames by identity state, zero their vis
        nanmask = np.isnan(traj).any(axis=-1)  # (na, T)
        traj = np.where(nanmask[..., None], IDENTITY_STATE[: traj.shape[-1]], traj)
        if vis is None:
            vis = np.ones(nanmask.shape, np.float32)
        vis = np.where(nanmask, 0.0, vis)
        return traj.astype(np.float32), vis.astype(np.float32)

    def _traj_fill(T):
        return np.tile(IDENTITY_STATE, (B, na_max, T, 1)).astype(np.float32)

    out = {
        "past": _traj_fill(PT),
        "past_vis": np.zeros((B, na_max, PT), np.float32),
        "sem": np.zeros((B, na_max, nc), np.float32),
        "lw": np.zeros((B, na_max, 2), np.float32),
        "mask": np.zeros((B, na_max), bool),
        "map_idx": np.zeros((B,), np.int32),
    }
    has_future = "future" in per_scene[0]
    has_past_gt = "past_gt" in per_scene[0]
    has_future_gt = "future_gt" in per_scene[0]
    if has_future:
        FT = per_scene[0]["future"].shape[1]
        out["future"] = _traj_fill(FT)
        out["future_vis"] = np.zeros((B, na_max, FT), np.float32)
    if has_past_gt:
        out["past_gt"] = _traj_fill(PT)
    if has_future_gt:
        out["future_gt"] = _traj_fill(per_scene[0]["future_gt"].shape[1])

    for b, sc in enumerate(per_scene):
        na = sc["past"].shape[0]
        out["past"][b, :na], out["past_vis"][b, :na] = _clean(
            sc["past"], sc.get("past_vis"))
        out["sem"][b, :na] = sc["sem"]
        out["lw"][b, :na] = sc["lw"]
        out["mask"][b, :na] = True
        out["map_idx"][b] = sc["map_idx"]
        if has_future:
            out["future"][b, :na], out["future_vis"][b, :na] = _clean(
                sc["future"], sc.get("future_vis"))
        if has_past_gt:
            out["past_gt"][b, :na], _ = _clean(sc["past_gt"])
        if has_future_gt:
            out["future_gt"][b, :na], _ = _clean(sc["future_gt"])

    return SceneBatch(**{k: jnp.asarray(v) for k, v in out.items()})


def normalize_scene(scene: SceneBatch, state_norm, att_norm, unnorm=False):
    """Norm/unnorm past, futures and lw (reference ``datasets/utils.py:207-227``)."""
    sf = state_norm.unnormalize if unnorm else state_norm.normalize
    af = att_norm.unnormalize if unnorm else att_norm.normalize
    rep = {}
    for k in ("past", "future", "past_gt", "future_gt"):
        v = getattr(scene, k)
        if v is not None:
            rep[k] = sf(v)
    rep["lw"] = af(scene.lw)
    return scene.replace(**rep)
