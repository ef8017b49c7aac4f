import numpy as np
import jax
import jax.numpy as jnp

from strive_tpu.normalize import (
    MeanStdNormalizer,
    state_normalizer_for,
    att_normalizer_for,
)


def test_roundtrip(rng):
    n = state_normalizer_for(("car", "truck"))
    x = rng.normal(size=(4, 3, 6)).astype(np.float32) * 20
    np.testing.assert_allclose(
        np.asarray(n.unnormalize(n.normalize(x))), x, rtol=1e-5, atol=1e-4
    )


def test_partial_dim(rng):
    n = state_normalizer_for(("car", "truck"))
    x = rng.normal(size=(5, 4)).astype(np.float32)
    out4 = np.asarray(n.normalize(x))
    out6 = np.asarray(n.normalize(np.concatenate([x, np.zeros((5, 2), np.float32)], -1)))
    np.testing.assert_allclose(out4, out6[:, :4], atol=1e-6)


def test_position_mean_zero():
    n = state_normalizer_for(("car", "truck"))
    assert float(n.mean[0]) == 0.0 and float(n.mean[1]) == 0.0
    assert float(n.std[0]) == 15.0


def test_att_stats():
    a = att_normalizer_for(("car", "truck"))
    np.testing.assert_allclose(np.asarray(a.mean), [4.844294, 2.021752], atol=1e-6)


def test_pytree_and_jit():
    n = MeanStdNormalizer(np.zeros(2), np.ones(2) * 2)

    @jax.jit
    def f(norm, x):
        return norm.normalize(x)

    out = f(n, jnp.ones((3, 2)))
    np.testing.assert_allclose(np.asarray(out), 0.5)
