"""Golden parity: sample displacement metrics vs the reference
``compute_disp_err`` (``losses/traffic_model.py:297-364``) — the
minADE/minFDE/APD numbers the eval scripts report."""

from types import SimpleNamespace

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import tg_shim


def test_disp_err_parity(reference_src):
    tg_shim.install()
    np.int = int
    np.float = float
    import losses.traffic_model as rltm
    from datasets.utils import MeanStdNormalizer

    from strive_tpu.losses.training import compute_disp_err

    rng = np.random.default_rng(0)
    B, NA, NS, FT = 3, 4, 6, 12
    mean = np.zeros(6, np.float32)
    std = np.array([15.0, 15.0, 1.0, 1.0, 5.0, 1.0], np.float32)

    gt = rng.normal(0, 1, (B, NA, FT, 6)).astype(np.float32)
    h = rng.normal(0, 1, (B, NA, FT, 2)).astype(np.float32)
    gt[..., 2:4] = h / np.linalg.norm(h, axis=-1, keepdims=True)
    pred = rng.normal(0, 1, (B, NS, NA, FT, 4)).astype(np.float32)

    # reference: flattened (NA_total, NS, FT, 4) with ptr
    sizes = [NA] * B
    ptr = np.cumsum([0] + sizes)
    sg = SimpleNamespace(
        future_gt=torch.from_numpy(gt.reshape(B * NA, FT, 6)),
        ptr=torch.from_numpy(ptr))
    ref_pred = {"future_pred": torch.from_numpy(
        pred.transpose(0, 2, 1, 3, 4).reshape(B * NA, NS, FT, 4))}
    ref_norm = MeanStdNormalizer(torch.from_numpy(mean),
                                 torch.from_numpy(std))
    ref = rltm.compute_disp_err(sg, ref_pred, ref_norm)

    class _N:
        @staticmethod
        def unnormalize(x):
            d = x.shape[-1]
            return x * jnp.asarray(std[:d]) + jnp.asarray(mean[:d])

    ours = compute_disp_err(SimpleNamespace(future_gt=jnp.asarray(gt)),
                            jnp.asarray(pred), _N)
    for k in ["pos_minADE", "pos_minFDE", "ang_minADE", "ang_minFDE",
              "APD"]:
        np.testing.assert_allclose(np.asarray(ours[k]), ref[k].numpy(),
                                   rtol=2e-4, atol=2e-4, err_msg=k)
