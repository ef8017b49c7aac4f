"""Generic jit-compiled Adam loops over latent variables.

The reference runs eager per-iteration closures (``utils/init_optim.py:29-61``
etc.); here the whole optimization is one compiled ``lax.scan`` — loss,
gradient, and Adam update fused on-device, no host round trips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def run_adam_loop(loss_fn, init_vars, lr, num_iters, return_history=True):
    """Minimize ``loss_fn(vars) -> (loss, aux)`` with Adam.

    :param init_vars: pytree of optimization variables
    :return: (final_vars, losses (num_iters,)) — jit-safe, differentiable-free.
    """
    tx = optax.adam(lr)

    def step(carry, _):
        v, opt_state = carry
        (loss, _aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(v)
        updates, opt_state = tx.update(grads, opt_state, v)
        v = optax.apply_updates(v, updates)
        return (v, opt_state), loss

    (final_vars, _), losses = jax.lax.scan(
        step, (init_vars, tx.init(init_vars)), None, length=num_iters
    )
    return final_vars, (losses if return_history else losses[-1])


def run_lbfgs_loop(loss_fn, init_vars, lr, num_iters, return_history=True):
    """Minimize ``loss_fn(vars) -> (loss, aux)`` with L-BFGS (+ zoom
    linesearch), the reference's optional refine optimizer
    (``refine_traffic_optim.py:53-55,167-173`` uses torch.optim.LBFGS).
    """
    tx = optax.lbfgs(learning_rate=lr)

    def value_fn(v):
        return loss_fn(v)[0]

    def step(carry, _):
        v, opt_state = carry
        (loss, _aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(v)
        updates, opt_state = tx.update(
            grads, opt_state, v, value=loss, grad=grads, value_fn=value_fn)
        v = optax.apply_updates(v, updates)
        return (v, opt_state), loss

    (final_vars, _), losses = jax.lax.scan(
        step, (init_vars, tx.init(init_vars)), None, length=num_iters
    )
    return final_vars, (losses if return_history else losses[-1])


def run_adam_loop_vg(value_and_grad_fn, init_vars, lr, num_iters,
                     return_history=True):
    """Like :func:`run_adam_loop` but the caller supplies
    ``value_and_grad_fn(vars) -> (loss, grads)`` directly.

    Used by the single-decode adversarial iteration: the two
    stop_gradient-partitioned decoder passes (reference
    ``adv_gen_optim.py:119-130``) have identical forward values, so their
    gradients come from ONE ``jax.vjp`` forward plus two (vmapped)
    pullbacks — jax.value_and_grad can't express that sharing.
    """
    tx = optax.adam(lr)

    def step(carry, _):
        v, opt_state = carry
        loss, grads = value_and_grad_fn(v)
        updates, opt_state = tx.update(grads, opt_state, v)
        v = optax.apply_updates(v, updates)
        return (v, opt_state), loss

    (final_vars, _), losses = jax.lax.scan(
        step, (init_vars, tx.init(init_vars)), None, length=num_iters
    )
    return final_vars, (losses if return_history else losses[-1])


def run_adam_loop_vg_refresh(value_and_grad_fn, refresh_fn, init_vars, lr,
                             num_iters, k):
    """Adam loop with a side input recomputed every ``k`` iterations.

    Outer scan over super-steps: each calls ``refresh_fn(vars) -> fut``
    once, then runs ``k`` inner Adam steps with
    ``value_and_grad_fn(vars, fut)`` holding ``fut`` fixed — the chunked
    closed loop (planner re-rolled every k-th Adam iteration, reference
    hardcode refresh in adv_scenario_gen:381-476 is k=1) compiled into
    ONE program. A ``num_iters % k`` remainder runs as a final short
    super-step, so the iteration count is exact.

    :return: (final_vars, losses (num_iters,))
    """
    tx = optax.adam(lr)

    def inner(carry, _):
        v, opt_state, fut = carry
        loss, grads = value_and_grad_fn(v, fut)
        updates, opt_state = tx.update(grads, opt_state, v)
        v = optax.apply_updates(v, updates)
        return (v, opt_state, fut), loss

    def super_step(carry, _, length):
        v, opt_state = carry
        fut = refresh_fn(v)
        (v, opt_state, _), losses = jax.lax.scan(
            inner, (v, opt_state, fut), None, length=length)
        return (v, opt_state), losses

    n_super, rem = divmod(int(num_iters), int(k))
    carry = (init_vars, tx.init(init_vars))
    losses = []
    if n_super:
        carry, ls = jax.lax.scan(
            lambda c, x: super_step(c, x, k), carry, None, length=n_super)
        losses.append(ls.reshape(-1))
    if rem:
        carry, ls = super_step(carry, None, rem)
        losses.append(ls)
    final_vars, _ = carry
    return final_vars, jnp.concatenate(losses)


from collections import OrderedDict

_RUNNER_CACHE = OrderedDict()
_RUNNER_CACHE_MAX = 16  # LRU bound: stale entries pin compiled executables
                        # and their captured arrays (ADVICE r2)


def cached_runner(name, anchors, statics, builder):
    """Memoize a jitted runner across optimization-driver calls.

    The drivers are invoked once per scene batch; building their jitted
    closures fresh each call forces jax to RE-TRACE the whole Adam scan
    (seconds of host time per batch — it dominated scenario throughput,
    PERF.md r2). Runners built here close only over ``anchors`` (objects
    compared by identity, e.g. model/params) and hashable ``statics``;
    every per-batch array must be an argument of the built function, so a
    repeat call with equal shapes reuses the compiled executable.

    :param name: cache namespace (one per call site)
    :param anchors: identity-keyed objects the builder closes over
    :param statics: hashable static config tuple
    :param builder: () -> runner; called only on cache miss
    """
    key = (name, tuple(id(a) for a in anchors), statics)
    ent = _RUNNER_CACHE.get(key)
    if ent is not None and all(a is b for a, b in zip(ent[0], anchors)):
        _RUNNER_CACHE.move_to_end(key)
        return ent[1]
    fn = builder()
    # keep strong refs to anchors so their ids stay valid for the key
    _RUNNER_CACHE[key] = (tuple(anchors), fn)
    while len(_RUNNER_CACHE) > _RUNNER_CACHE_MAX:
        _RUNNER_CACHE.popitem(last=False)
    return fn
