"""The CVAE traffic model.

TPU-native re-architecture of reference ``models/traffic_model.py``:

- scenes are dense padded ``SceneBatch``es, not torch-geometric graphs;
- the autoregressive decoder (:589-704) is a ``lax.scan`` over future steps
  with carry (prev bicycle state, GRU memory, past feature, pose, map feat);
- multi-sample decoding (:319-370) is an outer ``vmap`` over the latent
  sample axis instead of folding NS into feature dims;
- the per-step map crop is gathered at a ``stop_gradient``-ed position,
  mirroring the reference ``.detach()`` (:694).

Normalization config and bicycle parameters are hashable static fields so
the module can be jit-cached; the map store is passed as a pytree argument.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..dynamics import BikeParams, NUSC_BIKE_PARAMS, bike_step
from ..geometry import transform2frame, normalize_heading
from ..losses.common import log_normal
from ..maps.queries import get_map_crop
from ..maps.store import DEFAULT_BOUNDS
from ..scene import SceneBatch
from .cnn import MapEncoder
from .common import MLP, StackedGRU
from .interaction import SceneInteractionNet


class NormConfig(NamedTuple):
    """Hashable normalization constants (state 6-dim, attributes 2-dim)."""

    state_mean: Tuple[float, ...]
    state_std: Tuple[float, ...]
    att_mean: Tuple[float, ...]
    att_std: Tuple[float, ...]

    @classmethod
    def from_normalizers(cls, state_norm, att_norm):
        import numpy as np

        return cls(
            tuple(np.asarray(state_norm.mean).tolist()),
            tuple(np.asarray(state_norm.std).tolist()),
            tuple(np.asarray(att_norm.mean).tolist()),
            tuple(np.asarray(att_norm.std).tolist()),
        )


def rsample(key, mean, var):
    """Reparameterized Gaussian sample (reference ``traffic_model.py:706-712``)."""
    eps = jax.random.normal(key, mean.shape, mean.dtype)
    return mean + eps * jnp.sqrt(var)


def init_model_params(model, scene, store, key):
    """Initialize parameters with the whole init traced as ONE program.

    Flax's eager ``model.init`` dispatches every traced op as its own tiny
    device executable; on a remote-tunnel runtime (axon) that is thousands
    of ~1 s round trips at production scale — tens of minutes of silent
    startup before anything is logged. Jitting the init makes it one
    compiled program, persisted in the JAX compilation cache so subsequent
    runs of the same configuration start in seconds. The parameters are
    identical to the eager path (same PRNG draws; only op scheduling
    changes), and callers that load a checkpoint immediately overwrite
    them anyway.
    """
    fn = jax.jit(lambda k, s: model.init(k, s, store, k, method="forward"))
    return fn(key, scene)


def _decode_substep(mdl, carry, consts, ext_t, has_ext, do_map_encode):
    """One autoregressive rollout step.

    Mirrors the body of the reference decoder loop
    (``traffic_model.py:626-698``). ``has_ext`` statically selects the
    planner-future injection path (reference :667-675); with injection the
    ego's *recorded* output stays the model's own prediction, but the next
    step's GNN pose, map crop and GRU-memory input see the external future.
    In bicycle mode the internal bicycle state intentionally keeps the
    model's own rollout (reference :679-680 uses cur_bike_state, which is
    never overwritten by ext_future). ``do_map_encode`` statically skips
    the per-step map re-encode (the map_refresh_every knob).
    """
    sem, lw, z, veh_len, mask, map_idx, map_store = consts
    prev_state, mem, cur_past_feat, pos, cur_map_feat = carry
    B, NA = sem.shape[:2]

    dec_in = jnp.concatenate([cur_past_feat, cur_map_feat, sem, z, lw],
                             axis=-1)
    dec_out = mdl.decoder_net(dec_in, pos, sem, mask)  # (B, NA, 2|4)

    if mdl.output_bicycle:
        init_state = mdl.state_unnorm(prev_state)
        new_bike = bike_step(init_state, dec_out[..., 0], dec_out[..., 1],
                             veh_len, mdl.bike)
        cur_bike_state = mdl.state_norm_(new_bike)
        cur_global = cur_bike_state[..., :4]
        cur_local = transform2frame(
            prev_state[..., :4].reshape(B * NA, 4),
            cur_global.reshape(B * NA, 1, 4),
        )[:, 0].reshape(B, NA, 4)
        next_prev = cur_bike_state
    else:
        cur_local = normalize_heading(dec_out)
        cur_global = transform2frame(
            prev_state[..., :4].reshape(B * NA, 4),
            cur_local.reshape(B * NA, 1, 4),
            inverse=True,
        )[:, 0].reshape(B, NA, 4)
        next_prev = cur_global

    out_t = cur_global  # recorded BEFORE external injection

    if has_ext:
        inj_local_ego = transform2frame(
            prev_state[:, 0, :4], ext_t[:, None]
        )[:, 0]
        cur_global = cur_global.at[:, 0].set(ext_t)
        cur_local = cur_local.at[:, 0].set(inj_local_ego)
        if not mdl.output_bicycle:
            next_prev = cur_global

    # memory update (reference :684-691)
    new_past_feat, new_mem = mdl.decoder_memory(cur_local, mem)
    if do_map_encode:
        # re-encode map at detached new position (reference :694-695)
        new_map_feat = mdl.encode_map(
            jax.lax.stop_gradient(cur_global), map_idx, map_store
        )
    else:
        new_map_feat = cur_map_feat
    return (next_prev, new_mem, new_past_feat, cur_global,
            new_map_feat), out_t


def _make_decode_step(has_ext: bool, substeps: int = 1):
    """Scan body: ``substeps`` rollout steps with ONE map re-encode.

    substeps=1 is the reference behavior (map re-encoded every step); k>1
    is the map_refresh_every performance knob (PERF.md) — the crop gather
    dominates rollout time and refreshing every k-th step divides it by k.
    """

    def step(mdl, carry, consts, ext_ts):
        outs = []
        for s in range(substeps):
            ext_t = ext_ts[s] if has_ext else ext_ts
            carry, out_t = _decode_substep(
                mdl, carry, consts, ext_t, has_ext,
                do_map_encode=(s == substeps - 1),
            )
            outs.append(out_t)
        return carry, jnp.stack(outs, axis=0)

    return step


class TrafficModel(nn.Module):
    npast: int
    nfuture: int
    map_obs_size_pix: int
    nclasses: int
    norm: NormConfig
    bike: BikeParams = NUSC_BIKE_PARAMS
    map_feat_size: int = 64
    past_feat_size: int = 64
    future_feat_size: int = 64
    latent_size: int = 32
    output_bicycle: bool = True
    traj_encoder: str = "mlp"  # 'mlp' | 'gru'
    map_bounds: Tuple[float, float, float, float] = DEFAULT_BOUNDS
    conv_kernels: Tuple[int, ...] = (7, 5, 5, 3, 3, 3)
    conv_strides: Tuple[int, ...] = (2, 2, 2, 2, 2, 2)
    conv_filters: Tuple[int, ...] = (16, 32, 64, 64, 128, 128)
    num_memory_layers: int = 3
    compute_dtype: Optional[str] = None  # 'bfloat16' for speed; None = f32
    map_refresh_every: int = 1  # re-encode the map crop every k steps (PERF.md)

    # ---- setup ----------------------------------------------------------
    def setup(self):
        cdt = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        self.map_encoder = MapEncoder(
            self.map_feat_size, self.conv_kernels, self.conv_strides,
            self.conv_filters, dtype=cdt, name="map_encoder",
        )
        if self.traj_encoder == "mlp":
            self.past_encoder = MLP((128, 128, 128, self.past_feat_size),
                                    name="past_encoder")
            self.future_encoder = MLP((128, 128, 128, self.future_feat_size),
                                      name="future_encoder")
        elif self.traj_encoder == "gru":
            self.past_gru = StackedGRU(128, 4, name="past_gru")
            self.past_out = nn.Dense(self.past_feat_size, name="past_out")
            self.future_gru = StackedGRU(128, 4, name="future_gru")
            self.future_out = nn.Dense(self.future_feat_size, name="future_out")
        else:
            raise ValueError(f"unknown traj encoder {self.traj_encoder}")

        msg = 2 * self.past_feat_size
        self.prior_net = SceneInteractionNet(msg, 2 * self.latent_size,
                                             name="prior_net")
        self.posterior_net = SceneInteractionNet(msg, 2 * self.latent_size,
                                                 name="posterior_net")
        self.traj_out_size = 2 if self.output_bicycle else 4
        # decoder GNN runs every rollout step — gets the fast dtype too
        self.decoder_net = SceneInteractionNet(64, self.traj_out_size,
                                               dtype=cdt, name="decoder_net")
        self.decoder_memory = StackedGRU(self.past_feat_size,
                                         self.num_memory_layers,
                                         name="decoder_memory")

    # ---- normalization helpers ------------------------------------------
    def _smean(self, d=6):
        return jnp.asarray(self.norm.state_mean[:d], jnp.float32)

    def _sstd(self, d=6):
        return jnp.asarray(self.norm.state_std[:d], jnp.float32)

    def state_unnorm(self, x):
        d = x.shape[-1]
        return x * self._sstd(d) + self._smean(d)

    def state_norm_(self, x):
        d = x.shape[-1]
        return (x - self._smean(d)) / self._sstd(d)

    def att_unnorm(self, lw):
        return lw * jnp.asarray(self.norm.att_std, jnp.float32) + jnp.asarray(
            self.norm.att_mean, jnp.float32
        )

    # ---- encoders --------------------------------------------------------
    def encode_map(self, pos, map_idx, map_store):
        """Local map feature around each (NORMALIZED) pose.

        :param pos: (B, NA, 4)
        :return: (B, NA, map_feat_size)

        Reference ``traffic_model.py:416-451``.
        """
        B, NA, _ = pos.shape
        pos_unnorm = self.state_unnorm(pos).reshape(B * NA, 4)
        mapixes = jnp.repeat(map_idx, NA)
        # channels-last end to end: the crop epilogue emits NHWC directly
        # into the NHWC-native conv stack (no NCHW materialization).
        # STRIVE_DISABLE_NHWC_CROP restores the NCHW path (A/B diagnostics).
        import os

        layout = ("nchw" if os.environ.get("STRIVE_DISABLE_NHWC_CROP")
                  else "nhwc")
        # emit the crop directly in the compute dtype: the r2 bf16 attempt
        # lost to a separate f32->bf16 cast+relayout pass over the 33 MB
        # crop; unpacking straight to bf16 in the fused epilogue avoids it
        cdt = (jnp.dtype(self.compute_dtype) if self.compute_dtype
               else jnp.float32)
        crop = get_map_crop(
            map_store.raster, map_store.dx, pos_unnorm, mapixes,
            self.map_bounds, L=self.map_obs_size_pix, W=self.map_obs_size_pix,
            dtype=cdt, packed=map_store.packed, min_dx=map_store.min_dx_m,
            layout=layout,
        )
        feat = self.map_encoder(crop, input_layout=layout)
        return feat.reshape(B, NA, self.map_feat_size)

    def _local_traj_feat(self, frame, traj, vis, lw, sem, encoder_mlp=None,
                         encoder_gru=None, encoder_out=None):
        """Transform traj into `frame`, zero invisible steps, append vis+lw,
        then encode with the MLP (flattened) or GRU (per-step) encoder."""
        B, NA, T, _ = traj.shape
        frame_flat = frame.reshape(B * NA, 4)
        kin_flat = traj[..., :4].reshape(B * NA, T, 4)
        local_kin = transform2frame(frame_flat, kin_flat).reshape(B, NA, T, 4)
        local = jnp.concatenate([local_kin, traj[..., 4:]], axis=-1)
        local = jnp.where(vis[..., None] == 0.0, 0.0, local)
        local = jnp.concatenate([local, vis[..., None]], axis=-1)
        att = jnp.broadcast_to(lw[:, :, None, :], (B, NA, T, 2))
        enc_in = jnp.concatenate([local, att], axis=-1)  # (B, NA, T, 9)
        if encoder_mlp is not None:
            flat = jnp.concatenate([enc_in.reshape(B, NA, T * 9), sem], axis=-1)
            return encoder_mlp(flat)
        # GRU path: unrolled over the (short, static) time axis — plain
        # lax.scan can't lift linen submodules, and T <= 16 here
        hs = jnp.zeros((4, B, NA, 128), enc_in.dtype)
        sem_t = jnp.broadcast_to(sem[:, :, None, :], (B, NA, T, sem.shape[-1]))
        xs = jnp.concatenate([enc_in, sem_t], axis=-1)
        out = None
        for t in range(T):
            out, hs = encoder_gru(xs[:, :, t], hs)
        return encoder_out(out)

    def encode_past(self, scene: SceneBatch):
        frame = scene.past[:, :, -1, :4]
        if self.traj_encoder == "mlp":
            return self._local_traj_feat(frame, scene.past, scene.past_vis,
                                         scene.lw, scene.sem,
                                         encoder_mlp=self.past_encoder)
        return self._local_traj_feat(frame, scene.past, scene.past_vis,
                                     scene.lw, scene.sem,
                                     encoder_gru=self.past_gru,
                                     encoder_out=self.past_out)

    def encode_future(self, scene: SceneBatch):
        frame = scene.past[:, :, -1, :4]
        if self.traj_encoder == "mlp":
            return self._local_traj_feat(frame, scene.future, scene.future_vis,
                                         scene.lw, scene.sem,
                                         encoder_mlp=self.future_encoder)
        return self._local_traj_feat(frame, scene.future, scene.future_vis,
                                     scene.lw, scene.sem,
                                     encoder_gru=self.future_gru,
                                     encoder_out=self.future_out)

    # ---- latent heads ----------------------------------------------------
    def prior(self, scene: SceneBatch, map_feat, past_feat):
        x = jnp.concatenate([past_feat, map_feat, scene.sem], axis=-1)
        pos = scene.past[:, :, -1, :4]
        out = self.prior_net(x, pos, scene.sem, scene.mask)
        mean, logvar = jnp.split(out, 2, axis=-1)
        return mean, jnp.exp(logvar)

    def encoder(self, scene: SceneBatch, map_feat, past_feat, future_feat):
        x = jnp.concatenate([past_feat, future_feat, map_feat, scene.sem], axis=-1)
        pos = scene.past[:, :, -1, :4]
        out = self.posterior_net(x, pos, scene.sem, scene.mask)
        mean, logvar = jnp.split(out, 2, axis=-1)
        return mean, jnp.exp(logvar)

    # ---- decoder ---------------------------------------------------------
    def decoder(self, scene: SceneBatch, map_feat, past_feat, z, map_store,
                ext_future: Optional[jnp.ndarray] = None,
                nfuture: Optional[int] = None):
        """Autoregressive rollout (reference :589-704).

        :param z: (B, NA, z) latents
        :param ext_future: optional (B, FT, 4) NORMALIZED planner future
            injected into agent 0 of each scene (open-loop conditioning).
        :return: (B, NA, FT, 4) NORMALIZED global-frame trajectories.
        """
        B, NA = z.shape[:2]
        FT = self.nfuture if nfuture is None else nfuture
        sem, lw = scene.sem, scene.lw
        veh_len = self.att_unnorm(lw)[..., 0]  # (B, NA) unnormalized lengths

        prev_state0 = scene.past[:, :, -1, :]  # (B, NA, 6) normalized
        pos0 = prev_state0[..., :4]
        mem0 = jnp.broadcast_to(
            past_feat[None], (self.num_memory_layers, B, NA, self.past_feat_size)
        )
        carry0 = (prev_state0, mem0, past_feat, pos0, map_feat)

        has_ext = ext_future is not None
        k = self.map_refresh_every
        if k > 1 and FT % k != 0:
            k = 1  # fall back to per-step refresh when k doesn't divide FT
        n_super = FT // k
        if has_ext:
            # (FT, B, 4) -> (n_super, k, B, 4)
            xs = jnp.moveaxis(ext_future, 1, 0).reshape(n_super, k, B, 4)
        else:
            xs = jnp.zeros((n_super, 1), z.dtype)
        consts = (sem, lw, z, veh_len, scene.mask, scene.map_idx, map_store)

        # remat: recompute the step (map gather + CNN + GNN) in the backward
        # pass instead of saving per-step conv activations across the scan —
        # the saved-activation HBM traffic otherwise dominates optimization
        scan = nn.scan(
            nn.remat(_make_decode_step(has_ext, k), prevent_cse=False),
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=(nn.broadcast, 0),
            out_axes=0,
        )
        _, traj = scan(self, carry0, consts, xs)  # (n_super, k, B, NA, 4)
        traj = traj.reshape(FT, B, NA, 4)
        return jnp.moveaxis(traj, 0, 2)  # (B, NA, FT, 4)

    # ---- public API (mirrors reference method set) ------------------------
    def forward(self, scene: SceneBatch, map_store, rng,
                use_post_mean=False, future_sample=False):
        """Training forward pass (reference :178-225)."""
        map_feat = self.encode_map(scene.past[:, :, -1, :4], scene.map_idx,
                                   map_store)
        past_feat = self.encode_past(scene)
        future_feat = self.encode_future(scene)
        prior_mu, prior_var = self.prior(scene, map_feat, past_feat)
        post_mu, post_var = self.encoder(scene, map_feat, past_feat, future_feat)

        k1, k2 = jax.random.split(rng)
        z = post_mu if use_post_mean else rsample(k1, post_mu, post_var)
        future_pred = self.decoder(scene, map_feat, past_feat, z, map_store)
        out = {
            "prior_out": (prior_mu, prior_var),
            "posterior_out": (post_mu, post_var),
            "future_pred": future_pred,
        }
        if future_sample:
            zp = rsample(k2, prior_mu, prior_var)
            out["future_samp"] = self.decoder(scene, map_feat, past_feat, zp,
                                              map_store)
        return out

    __call__ = forward

    def reconstruct(self, scene: SceneBatch, map_store):
        """Posterior-mean reconstruction (reference :227-257)."""
        map_feat = self.encode_map(scene.past[:, :, -1, :4], scene.map_idx,
                                   map_store)
        past_feat = self.encode_past(scene)
        future_feat = self.encode_future(scene)
        post_mu, post_var = self.encoder(scene, map_feat, past_feat, future_feat)
        future_pred = self.decoder(scene, map_feat, past_feat, post_mu, map_store)
        return {"posterior_out": (post_mu, post_var), "future_pred": future_pred}

    def embed(self, scene: SceneBatch, map_store):
        """Prior (+posterior if future present) embedding (reference :372-403)."""
        map_feat = self.encode_map(scene.past[:, :, -1, :4], scene.map_idx,
                                   map_store)
        past_feat = self.encode_past(scene)
        prior_mu, prior_var = self.prior(scene, map_feat, past_feat)
        out = {
            "prior_out": (prior_mu, prior_var),
            "map_feat": map_feat,
            "past_feat": past_feat,
        }
        if scene.future is not None:
            future_feat = self.encode_future(scene)
            out["posterior_out"] = self.encoder(scene, map_feat, past_feat,
                                                future_feat)
        return out

    def decode_embedding(self, z, embed_out, scene: SceneBatch, map_store,
                         ext_future=None, nfuture=None):
        """Decode latents using cached embed() features (reference :405-414).

        :param z: (B, NA, D) or (B, NS, NA, D) — the sample axis is vmapped.
        """
        if z.ndim == 4:
            # vmap over the NS axis; params broadcast, map/past feats closed over
            return {"future_pred": nn.vmap(
                lambda mdl, zz: mdl.decoder(scene, embed_out["map_feat"],
                                            embed_out["past_feat"], zz,
                                            map_store, ext_future=ext_future,
                                            nfuture=nfuture),
                in_axes=1, out_axes=1, variable_axes={"params": None},
                split_rngs={"params": False},
            )(self, z)}
        return {"future_pred": self.decoder(
            scene, embed_out["map_feat"], embed_out["past_feat"], z, map_store,
            ext_future=ext_future, nfuture=nfuture)}

    def sample_batched(self, scene: SceneBatch, map_store, num_samples, rng,
                       include_mean=False, nfuture=None):
        """Prior sampling, batched over NS via vmap (reference :319-370).

        :return: dict with future_pred (B, NS, NA, FT, 4), z_samp
            (B, NS, NA, D), z_logprob / z_mdist (B, NS, NA).
        """
        embed_out = self.embed(scene, map_store)
        prior_mu, prior_var = embed_out["prior_out"]
        B, NA, D = prior_mu.shape
        NS = num_samples
        eps = jax.random.normal(rng, (B, NS, NA, D), prior_mu.dtype)
        z = prior_mu[:, None] + eps * jnp.sqrt(prior_var[:, None])
        if include_mean:
            z = z.at[:, -1].set(prior_mu)
        dec = self.decode_embedding(z, embed_out, scene, map_store,
                                    nfuture=nfuture)
        z_logprob = log_normal(z, prior_mu[:, None], prior_var[:, None])
        z_mdist = jnp.linalg.norm(
            (z - prior_mu[:, None]) / jnp.sqrt(prior_var[:, None]), axis=-1
        )
        return {
            "prior_out": (prior_mu, prior_var),
            "z_samp": z,
            "z_logprob": z_logprob,
            "z_mdist": z_mdist,
            "future_pred": dec["future_pred"],
        }
