"""Host bridge: run the rule-based planner against device trajectories.

The closed-loop adversarial optimization re-rolls the planner every Adam
iteration on the current (detached) non-ego trajectories (reference
``adv_gen_optim.py:133-139``). The planner is host numpy; two bridges:

- ``make_planner_host_fn``: a plain python function (device array in,
  jnp array out). The chunked closed-loop driver calls it between jitted
  optimization chunks — works on every runtime.
- ``wrap_io_callback``: wraps the host fn in ``jax.experimental.io_callback``
  so it can be traced INSIDE a jitted loop — one host hop per iteration
  with zero python dispatch overhead. Not supported by every PJRT runtime
  (e.g. the axon tunnel); the drivers default to the chunked mode.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import io_callback


def make_planner_host_fn(planner, scene_mask, state_norm, dt, future_len):
    """Build ``fn(future_pred_norm (B, NA, FT, 4)) -> (B, FT, 4)`` NORMALIZED.

    ``planner.reset(...)`` must already have been called. Unnormalizes,
    strips ego + padding, rolls the planner per scene, re-normalizes.
    """
    mask_np = np.asarray(scene_mask)
    B, NA = mask_np.shape
    smean = np.asarray(state_norm.mean)[:4]
    sstd = np.asarray(state_norm.std)[:4]
    plan_t = np.linspace(dt, dt * future_len, future_len)
    # non-ego agents per scene; fully-masked padding scenes contribute
    # their ego only (0 non-ego observations), never a negative count
    counts = np.maximum(mask_np.sum(axis=1) - 1, 0)
    agent_ptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)

    def host_fn(future_pred_norm):
        fp = np.asarray(future_pred_norm) * sstd + smean  # (B, NA, FT, 4)
        nonego = []
        for b in range(B):
            n = max(int(mask_np[b].sum()), 1)
            nonego.append(fp[b, 1:n])
        nonego = (np.concatenate(nonego, axis=0) if nonego
                  else np.empty((0, future_len, 4)))
        out = planner.rollout(nonego, plan_t, agent_ptr, plan_t)  # (B, FT, 4)
        return ((out - smean) / sstd).astype(np.float32)

    return host_fn


def wrap_io_callback(host_fn, B, future_len):
    """Make ``host_fn`` callable inside jit (runtime permitting)."""

    def fn(future_pred_norm):
        return io_callback(
            host_fn,
            jax.ShapeDtypeStruct((B, future_len, 4), jnp.float32),
            future_pred_norm,
        )

    return fn


# kept for backward compatibility with earlier call sites
def make_planner_rollout_fn(planner, scene_mask, state_norm, dt, future_len):
    host_fn = make_planner_host_fn(planner, scene_mask, state_norm, dt,
                                   future_len)
    B = np.asarray(scene_mask).shape[0]
    return wrap_io_callback(host_fn, B, future_len)
