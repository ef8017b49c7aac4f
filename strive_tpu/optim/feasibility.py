"""Feasibility check: which agents could plausibly attack the ego?

Reference ``utils/scenario_gen.py:30-107`` (determine_feasibility_nusc):
from NS prior samples, an agent is a feasible attacker if some sample comes
within ``feasibility_thresh`` meters of the ego at a step >=
``feasibility_time``, optionally in front of the ego, not separated from it
by non-drivable area, and moving faster than ``feasibility_vel``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..maps.queries import check_line_layer


def determine_feasibility(samples, mask, state_norm, feasibility_thresh,
                          feasibility_time=0, feasibility_vel=0.0,
                          feasibility_infront_min=None,
                          check_non_drivable_separation=True,
                          drivable=None, dx=None, map_idx=None):
    """
    :param samples: (NS, NA, FT, 4) NORMALIZED samples of ONE scene
        (slot 0 = ego)
    :param mask: (NA,) validity
    :return: feasible (NA-1,) bool, feasible_time_step (NA-1,),
        feasible_dist (NA-1,) — all padded-masked (False/FT/inf)
    """
    samples = state_norm.unnormalize(samples)
    ego = samples[:, 0:1]        # (NS, 1, FT, 4)
    agents = samples[:, 1:]      # (NS, NA-1, FT, 4)
    NS, NAm1, FT, _ = agents.shape
    t0 = feasibility_time

    dists = jnp.linalg.norm(
        ego[..., t0:, :2] - agents[..., t0:, :2], axis=-1
    )  # (NS, NA-1, T')
    dists = jnp.moveaxis(dists, 0, 1)  # (NA-1, NS, T')

    if feasibility_infront_min is not None:
        ego_h = ego[..., t0:, 2:4]
        d = agents[..., t0:, :2] - ego[..., t0:, :2]
        n = jnp.linalg.norm(d, axis=-1)
        cossim = jnp.where(n > 1e-9, jnp.sum(d * ego_h, -1) / jnp.maximum(n, 1e-9),
                           -jnp.inf)
        infront = jnp.moveaxis(cossim, 0, 1) >= feasibility_infront_min
        dists = jnp.where(infront, dists, jnp.inf)

    min_samp_dists = jnp.min(dists, axis=1)           # (NA-1, T')
    min_samp_inds = jnp.argmin(dists, axis=1)         # (NA-1, T')
    feasible_dist = jnp.min(min_samp_dists, axis=1)   # (NA-1,)
    feasible_t = jnp.argmin(min_samp_dists, axis=1) + t0
    feasible = jnp.sum(dists < feasibility_thresh, axis=(1, 2)) > 0

    if check_non_drivable_separation:
        assert drivable is not None
        rows = jnp.arange(NAm1)
        best_s = min_samp_inds[rows, feasible_t - t0]       # (NA-1,)
        agent_state = agents[best_s, rows, feasible_t, :2]  # (NA-1, 2)
        ego_state = ego[best_s, 0, feasible_t, :2]
        blocked = check_line_layer(
            drivable, dx, agent_state, ego_state,
            jnp.broadcast_to(map_idx, (NAm1,)),
        )
        feasible = feasible & ~blocked

    vels = jnp.linalg.norm(
        agents[:, :, 1:, :2] - agents[:, :, :-1, :2], axis=-1
    )  # (NS, NA-1, FT-1)
    max_vels = jnp.max(jnp.max(vels, axis=0), axis=-1)  # (NA-1,)
    feasible = feasible & (max_vels > feasibility_vel)

    feasible = feasible & mask[1:]
    return feasible, feasible_t, feasible_dist


def restrict_attackers_to_category(feasible, sem, categories, category,
                                   reduced=False):
    """Keep only feasible candidates of one semantic category.

    Reference ``adv_scenario_gen.py:209-219`` (``--adv_attack_with``): the
    restriction gates FEASIBILITY (which seeds enter the batch) only — the
    adversarial softmin itself stays unrestricted, exactly like the
    reference.

    :param feasible: (NA-1,) bool over non-ego agents (slot 0 = ego)
    :param sem: (NA, NC) one-hot semantics incl. the ego row
    :param categories: ordered category names indexing sem's columns
        (the EFFECTIVE set — post ``reduce_cats``)
    :param category: name that may attack (e.g. 'cyclist'). A category
        absent from the effective set yields an all-False mask — the
        reference simply finds zero candidates of that category and skips
        the scene (``adv_scenario_gen.py:209-219``), it never crashes.
    :param reduced: True when ``categories`` is the REDUCED set
        (``--reduce_cats``); only then is a raw name mapped through
        ``REDUCED_CAT`` (e.g. ``--adv_attack_with bus`` restricts to the
        'truck' column it reduces to). Without reduction an unknown name
        must NOT silently substitute a different category.
    """
    import numpy as np

    from ..normalize import REDUCED_CAT

    cats = list(categories)
    if reduced and category not in cats and REDUCED_CAT.get(category) in cats:
        category = REDUCED_CAT[category]
    if category not in cats:
        return jnp.zeros_like(jnp.asarray(feasible, bool))
    ci = cats.index(category)
    is_cat = np.asarray(sem[1:, ci]) > 0.5
    return jnp.asarray(np.asarray(feasible) & is_cat)
