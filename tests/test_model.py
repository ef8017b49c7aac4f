import numpy as np
import jax
import jax.numpy as jnp
import pytest

from helpers import init_model, make_scene, tiny_model, tiny_store


@pytest.fixture(scope="module")
def setup():
    return init_model()


def test_forward_shapes(setup):
    model, params, scene, store = setup
    key = jax.random.PRNGKey(1)
    out = model.apply(params, scene, store, key, future_sample=True,
                      method="forward")
    B, NA, FT = scene.B, scene.NA, scene.FT
    assert out["future_pred"].shape == (B, NA, FT, 4)
    assert out["future_samp"].shape == (B, NA, FT, 4)
    assert out["prior_out"][0].shape == (B, NA, model.latent_size)
    assert np.all(np.isfinite(np.asarray(out["future_pred"])))
    # variances positive
    assert np.all(np.asarray(out["prior_out"][1]) > 0)


def test_padded_agents_do_not_affect_real(setup):
    model, params, scene, store = setup
    key = jax.random.PRNGKey(2)
    out1 = model.apply(params, scene, store, key, use_post_mean=True,
                       method="forward")
    # corrupt padded slots
    mask = np.asarray(scene.mask)
    past = np.array(np.asarray(scene.past))
    past[~mask] = 3.21
    scene2 = scene.replace(past=jnp.asarray(past))
    out2 = model.apply(params, scene2, store, key, use_post_mean=True,
                       method="forward")
    real = mask
    np.testing.assert_allclose(
        np.asarray(out1["future_pred"])[real],
        np.asarray(out2["future_pred"])[real],
        atol=1e-5,
    )


def test_embed_decode_matches_reconstruct(setup):
    model, params, scene, store = setup
    emb = model.apply(params, scene, store, method="embed")
    assert "posterior_out" in emb
    post_mu = emb["posterior_out"][0]
    dec = model.apply(params, post_mu, emb, scene, store,
                      method="decode_embedding")
    rec = model.apply(params, scene, store, method="reconstruct")
    np.testing.assert_allclose(
        np.asarray(dec["future_pred"]), np.asarray(rec["future_pred"]), atol=1e-5
    )


def test_sample_batched_shapes(setup):
    model, params, scene, store = setup
    key = jax.random.PRNGKey(3)
    NS = 3
    out = model.apply(params, scene, store, NS, key, True,
                      method="sample_batched")
    B, NA, FT = scene.B, scene.NA, scene.FT
    assert out["future_pred"].shape == (B, NS, NA, FT, 4)
    assert out["z_samp"].shape == (B, NS, NA, model.latent_size)
    assert out["z_logprob"].shape == (B, NS, NA)
    # last sample is the prior mean
    np.testing.assert_allclose(
        np.asarray(out["z_samp"][:, -1]), np.asarray(out["prior_out"][0]),
        atol=1e-6,
    )
    # mdist of mean sample is 0
    np.testing.assert_allclose(np.asarray(out["z_mdist"][:, -1]), 0.0, atol=1e-5)


def test_ext_future_injection(setup):
    model, params, scene, store = setup
    emb = model.apply(params, scene, store, method="embed")
    z = emb["prior_out"][0]
    dec_plain = model.apply(params, z, emb, scene, store,
                            method="decode_embedding")
    ext = scene.future_gt[:, 0, :, :4] + 0.5  # perturbed planner future
    dec_ext = model.apply(params, z, emb, scene, store, ext,
                          method="decode_embedding")
    a = np.asarray(dec_plain["future_pred"])
    b = np.asarray(dec_ext["future_pred"])
    # first step identical (injection affects inputs of later steps only)
    np.testing.assert_allclose(a[:, :, 0], b[:, :, 0], atol=1e-5)
    # later steps of other agents react to the injected ego
    assert np.abs(a[:, 1:, 1:] - b[:, 1:, 1:]).max() > 1e-6


def test_bicycle_speed_limits(setup):
    model, params, scene, store = setup
    emb = model.apply(params, scene, store, method="embed")
    z = emb["prior_out"][0] * 10.0  # extreme latents
    dec = model.apply(params, z, emb, scene, store, method="decode_embedding")
    fut = np.asarray(dec["future_pred"])
    assert np.all(np.isfinite(fut))
    # headings stay unit vectors
    np.testing.assert_allclose(
        np.linalg.norm(fut[..., 2:4], axis=-1), 1.0, atol=1e-4
    )


def test_jitted_init_matches_eager():
    """init_model_params (one-compile init) must produce the same parameter
    tree as Flax's eager ``model.init`` — same PRNG draws, same shapes,
    near-identical values (only XLA op scheduling differs). The jitted
    path exists because eager init dispatches thousands of tiny programs
    through the remote device tunnel (~tens of minutes at prod scale)."""
    from strive_tpu.model.traffic_model import init_model_params

    rng = np.random.default_rng(3)
    scene = make_scene(rng)
    model = tiny_model()
    store = tiny_store()
    key = jax.random.PRNGKey(3)
    eager = model.init(key, scene, store, key, method="forward")
    jitted = init_model_params(model, scene, store, key)
    e_leaves, e_tree = jax.tree_util.tree_flatten(eager)
    j_leaves, j_tree = jax.tree_util.tree_flatten(jitted)
    assert e_tree == j_tree
    for e, j in zip(e_leaves, j_leaves):
        assert e.shape == j.shape and e.dtype == j.dtype
        np.testing.assert_allclose(np.asarray(e), np.asarray(j),
                                   rtol=1e-6, atol=1e-6)
