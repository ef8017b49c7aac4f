"""Checkpointing with orbax.

Matches the reference's triple-checkpoint policy
(``train_traffic.py:340-357``): ``best_eval_model``, ``epoch_%08d_model``,
``latest_model``, each holding {params, opt_state, epoch, min_val_loss}
(reference ``utils/torch.py:20-60``).
"""

from __future__ import annotations

import os

import jax
import numpy as np
import orbax.checkpoint as ocp


def _path(out_dir, name):
    return os.path.abspath(os.path.join(out_dir, name))


def save_state(out_dir, name, params, opt_state, cur_epoch=0,
               min_val_loss=float("inf")):
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": jax.device_get(params),
        "meta": {
            "epoch": np.asarray(cur_epoch),
            "min_val_loss": np.asarray(min_val_loss),
        },
    }
    if opt_state is not None:
        payload["opt_state"] = jax.device_get(opt_state)
    path = _path(out_dir, name)
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def load_state(path, abstract_params=None, abstract_opt_state=None):
    """Restore a checkpoint (raw restore — shapes come from disk; the
    abstract args are accepted for API symmetry but unused).

    :return: (params, opt_state, epoch, min_val_loss)
    """
    del abstract_params, abstract_opt_state
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path))
    return (
        restored["params"],
        restored.get("opt_state"),
        int(restored["meta"]["epoch"]),
        float(restored["meta"]["min_val_loss"]),
    )


def load_params(path):
    """Restore parameters only (for eval/scenario-gen entry points)."""
    params, _, _, _ = load_state(path)
    return params
