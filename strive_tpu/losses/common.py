"""Gaussian KL / log-likelihood primitives.

Matches reference ``losses/common.py:8-41``.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def kl_normal(qm, qv, pm, pv):
    """Elementwise KL(q || p) between diagonal Gaussians, summed over last dim.

    :param qm, qv: (..., D) q mean / variance
    :param pm, pv: (..., D) p mean / variance
    :return: (...,)
    """
    elem = 0.5 * (jnp.log(pv) - jnp.log(qv) + qv / pv + (qm - pm) ** 2 / pv - 1.0)
    return jnp.sum(elem, axis=-1)


def log_normal(x, m, v):
    """Diagonal-Gaussian log-density summed over the last dim.

    :param x, m, v: (..., D)
    :return: (...,)
    """
    log_prob = (
        -jnp.log(jnp.sqrt(v))
        - math.log(math.sqrt(2 * math.pi))
        - (x - m) ** 2 / (2 * v)
    )
    return jnp.sum(log_prob, axis=-1)
