import numpy as np

from strive_tpu.losses.common import kl_normal, log_normal


def test_kl_self_is_zero(rng):
    m = rng.normal(size=(4, 8)).astype(np.float32)
    v = np.abs(rng.normal(size=(4, 8))).astype(np.float32) + 0.1
    np.testing.assert_allclose(np.asarray(kl_normal(m, v, m, v)), 0.0, atol=1e-5)


def test_parity_with_reference(reference_src, rng):
    import torch
    from losses.common import kl_normal as ref_kl, log_normal as ref_ln

    qm = rng.normal(size=(5, 8)).astype(np.float32)
    qv = (np.abs(rng.normal(size=(5, 8))) + 0.1).astype(np.float32)
    pm = rng.normal(size=(5, 8)).astype(np.float32)
    pv = (np.abs(rng.normal(size=(5, 8))) + 0.1).astype(np.float32)
    x = rng.normal(size=(5, 8)).astype(np.float32)

    np.testing.assert_allclose(
        np.asarray(kl_normal(qm, qv, pm, pv)),
        ref_kl(*map(torch.tensor, (qm, qv, pm, pv))).numpy(),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(log_normal(x, pm, pv)),
        ref_ln(*map(torch.tensor, (x, pm, pv))).numpy(),
        rtol=1e-5, atol=1e-5,
    )
