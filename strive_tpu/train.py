"""Training loop: jitted data-parallel train/eval steps.

TPU-native equivalent of reference ``train_traffic.py:64-171,306-357``:
one jit-compiled step (forward + loss + grad + Adam update) sharded over a
``scenes`` mesh axis, KL annealing as a traced scalar (no recompiles),
orbax checkpoints with the reference's best/epoch/latest policy.
"""

from __future__ import annotations

import time
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from .losses.training import compute_err, traffic_model_loss
from .normalize import MeanStdNormalizer
from .parallel.mesh import make_mesh, replicate, scene_sharding, shard_batch
from .utils.logger import Logger


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


def compute_kl_weight(cur_epoch, end_epoch, final_kl_weight):
    """Linear KL annealing from 0 (reference ``utils/torch.py:65-67``)."""
    return min(1.0, float(cur_epoch) / end_epoch) * final_kl_weight


def make_train_step(model, tx, loss_weights, state_norm: MeanStdNormalizer,
                    att_norm: MeanStdNormalizer, train=True):
    """Build a jittable (state, scene, map_store, rng, kl_w) -> (state, metrics).

    ``loss_weights['kl']`` is overridden by the traced ``kl_w`` argument so
    KL annealing never retriggers compilation.
    """
    do_sample = (loss_weights.get("coll_veh_prior", 0.0) > 0.0
                 or loss_weights.get("coll_env_prior", 0.0) > 0.0)

    def loss_fn(params, scene, map_store, rng, kl_w):
        pred = model.apply(params, scene, map_store, rng,
                           future_sample=do_sample, method="forward")
        w = dict(loss_weights)
        w["kl"] = kl_w
        loss_out = traffic_model_loss(scene, pred, w, state_norm, att_norm,
                                      map_store)
        err = compute_err(scene, pred, state_norm)
        return loss_out["loss"], {**loss_out, **err}

    def train_step(state: TrainState, scene, map_store, rng, kl_w):
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state.params, scene, map_store, rng, kl_w
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    def eval_step(state: TrainState, scene, map_store, rng, kl_w):
        _, metrics = loss_fn(state.params, scene, map_store, rng, kl_w)
        return state, metrics

    return train_step if train else eval_step


class Trainer:
    """Owns the mesh, jitted steps, and the epoch loop."""

    def __init__(self, model, params, loss_weights, state_norm, att_norm,
                 lr=1e-5, weight_decay=0.0, mesh=None):
        self.model = model
        self.mesh = mesh if mesh is not None else make_mesh()
        if weight_decay > 0.0:
            self.tx = optax.adamw(lr, weight_decay=weight_decay)
        else:
            self.tx = optax.adam(lr)
        self.state = TrainState(params, self.tx.init(params), jnp.zeros((), jnp.int32))
        self.loss_weights = loss_weights

        rep = replicate(self.mesh)
        shard = scene_sharding(self.mesh)
        self.state = jax.device_put(self.state, rep)

        self._train_step = jax.jit(
            make_train_step(model, self.tx, loss_weights, state_norm, att_norm,
                            train=True),
            in_shardings=(rep, shard, rep, rep, rep),
            out_shardings=(rep, rep),
            donate_argnums=(0,),
        )
        self._eval_step = jax.jit(
            make_train_step(model, self.tx, loss_weights, state_norm, att_norm,
                            train=False),
            in_shardings=(rep, shard, rep, rep, rep),
            out_shardings=(rep, rep),
        )

    def run_epoch(self, batches, map_store, rng, kl_weight, train=True,
                  log_every=0, wandb_run=None, step_counter=0):
        """Run one epoch; returns (dict of mean metrics, step_counter).

        Bad batches are skipped instead of killing the epoch (the
        reference's RuntimeError batch-skip, ``train_traffic.py:120-131``).
        """
        step_fn = self._train_step if train else self._eval_step
        agg = {}
        n = 0
        kl_w = jnp.asarray(kl_weight, jnp.float32)
        t0 = time.time()
        for i, scene in enumerate(batches):
            rng, sub = jax.random.split(rng)
            try:
                scene = shard_batch(scene, self.mesh)
                self.state, metrics = step_fn(self.state, scene, map_store,
                                              sub, kl_w)
                loss_val = float(metrics["loss"])
            except RuntimeError as e:
                # Runtime-only batch-skip mirrors the reference
                # (train_traffic.py:120-131 catches RuntimeError; XLA's
                # XlaRuntimeError subclasses RuntimeError). A failure on the
                # very first batch means the step itself is broken (shape
                # bug, bad loss) — re-raise instead of "training" on nothing.
                if n == 0:
                    raise
                Logger.log(f"  caught error in batch {i}: {e}; skipping")
                continue
            n += 1
            step_counter += int(scene.B)
            for k, v in metrics.items():
                if isinstance(v, jnp.ndarray) and v.ndim == 0:
                    agg.setdefault(k, 0.0)
            if log_every and (i + 1) % log_every == 0:
                Logger.log(f"  batch {i + 1}: loss={loss_val:.4f}")
            for k in agg:
                agg[k] += float(metrics[k])
            if wandb_run is not None and train:
                wandb_run.log(
                    {f"Train Batch Mean {k}": float(metrics[k]) for k in agg},
                    step=step_counter,
                )
        out = {k: v / max(n, 1) for k, v in agg.items()}
        out["epoch_time"] = time.time() - t0
        return out, step_counter
