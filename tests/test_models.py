"""Model-zoo shape/behavior tests: autoencoder, transporter, extraction."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keypoints_tpu.configs import get_config
from keypoints_tpu.models import KeypointAutoencoder, Transporter
from keypoints_tpu.training import (build_model, init_state, make_extract_fn,
                                    make_train_step)


def small_cfg(name="pong64", **over):
    cfg = get_config(name)
    cfg = cfg.override(**{
        "model.encoder_filters": (8, 16),
        "model.encoder_strides": (2, 2),
        "model.decoder_filters": (16, 8),
        "model.decoder_upsample": (True, True),
        "model.groups": 4,
        "data.image_size": 32,
        "train.batch_size": 8,
        "train.compute_dtype": "float32",
        **over})
    return cfg


def test_autoencoder_shapes():
    cfg = small_cfg()
    model = build_model(cfg)
    x = jnp.zeros((2, 1, 32, 32))
    params = model.init(jax.random.PRNGKey(0), x, x)["params"]
    recon, kp = model.apply({"params": params}, x, x)
    assert recon.shape == (2, 1, 32, 32)
    assert kp.shape == (2, 4, 2)
    assert np.isfinite(np.asarray(recon)).all()


def test_transporter_shapes_and_stopgrad():
    cfg = small_cfg(**{"train.model_kind": "transporter"})
    model = build_model(cfg)
    x = jnp.ones((2, 1, 32, 32)) * 0.5
    params = model.init(jax.random.PRNGKey(0), x, x)["params"]
    recon, kp = model.apply({"params": params}, x, x)
    assert recon.shape == (2, 1, 32, 32)
    assert kp.shape == (2, 4, 2)

    # Gradient w.r.t. a source-only perturbation must be zero through the
    # stop-gradded source branch... but source also feeds phi_s which is
    # stopped; target branch grads must be nonzero.
    def loss(params):
        r, _ = model.apply({"params": params}, x, x + 0.01)
        return jnp.mean(r ** 2)
    g = jax.grad(loss)(params)
    gn = float(jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(jnp.abs(b)), g, 0.0))
    assert gn > 0


def test_extract_keypoints_range():
    cfg = small_cfg()
    model = build_model(cfg)
    state = init_state(cfg, jax.random.PRNGKey(0))
    extract = jax.jit(make_extract_fn(cfg, model))
    kp = extract(state.params, jnp.array(
        np.random.RandomState(0).rand(4, 1, 32, 32), jnp.float32))
    kp = np.asarray(kp)
    assert kp.shape == (4, 4, 2)
    assert (kp >= -1.001).all() and (kp <= 1.001).all()


@pytest.mark.parametrize("variant", ["marginal", "joint"])
def test_softmax_variant_flag_wires_through(variant):
    cfg = small_cfg(**{"model.softmax_variant": variant})
    model = build_model(cfg)
    x = jnp.zeros((1, 1, 32, 32))
    params = model.init(jax.random.PRNGKey(0), x, x)["params"]
    _, kp = model.apply({"params": params}, x, x)
    assert kp.shape == (1, 4, 2)


def test_train_step_runs_and_is_finite():
    cfg = small_cfg()
    model = build_model(cfg)
    state = init_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, model))
    batch = (jnp.array(np.random.RandomState(1).rand(8, 1, 32, 32), jnp.float32),
             jnp.array(np.random.RandomState(2).rand(8, 1, 32, 32), jnp.float32))
    state2, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert int(state2.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0


def test_upconv2x_custom_vjp_matches_autodiff():
    """_upconv2x's hand-written grads (no dy reverses) must equal XLA's
    autodiff of the lhs-dilated conv formulation, for both x and k2."""
    from keypoints_tpu.models.nets import _UP_DN, _upconv2x

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 6, 6, 5), jnp.float32)
    k2 = jnp.asarray(rs.randn(4, 4, 5, 7) * 0.2, jnp.float32)

    def ref(x, k2):
        return jax.lax.conv_general_dilated(
            x, k2, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
            dimension_numbers=_UP_DN)

    y_ref = ref(x, k2)
    y = _upconv2x(x, k2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)
    assert y.shape == (2, 12, 12, 7)

    cot = jnp.asarray(rs.randn(*y.shape), jnp.float32)
    ga = jax.grad(lambda *a: jnp.vdot(ref(*a), cot), argnums=(0, 1))(x, k2)
    gc = jax.grad(lambda *a: jnp.vdot(_upconv2x(*a), cot), argnums=(0, 1))(
        x, k2)
    np.testing.assert_allclose(np.asarray(gc[0]), np.asarray(ga[0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gc[1]), np.asarray(ga[1]),
                               rtol=1e-5, atol=1e-5)


def test_extract_many_matches_per_batch():
    """make_extract_many_fn (one-dispatch bulk labeling, VERDICT r4 #3)
    returns exactly the stacked per-batch extractions."""
    from keypoints_tpu.configs import get_config
    from keypoints_tpu.training import (build_model, init_state,
                                        make_extract_fn,
                                        make_extract_many_fn)

    cfg = get_config("pong64").override(**{
        "model.encoder_filters": (8, 16), "model.encoder_strides": (2, 2),
        "model.decoder_filters": (16, 8),
        "model.decoder_upsample": (True, True), "model.groups": 4,
        "data.image_size": 32, "train.compute_dtype": "float32"})
    model = build_model(cfg)
    state = init_state(cfg, jax.random.PRNGKey(0))
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (3, 4, 1, 32, 32))
    single = jax.jit(make_extract_fn(cfg, model))
    many = jax.jit(make_extract_many_fn(cfg, model))
    got = np.asarray(many(state.params, imgs))
    want = np.stack([np.asarray(single(state.params, b)) for b in imgs])
    assert got.shape == (3, 4, cfg.model.num_keypoints, 2)
    np.testing.assert_allclose(got, want, atol=1e-6)
