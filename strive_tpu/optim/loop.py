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
