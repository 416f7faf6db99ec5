"""Full-model golden parity (SURVEY.md §4.1 / BASELINE.json:5).

Convert the golden torch autoencoder's weights into the flax model and demand
forward-pass agreement: reconstruction to fp32 tolerance, keypoint coords to
<1e-3 L2 on a fixed eval batch — the project's binding parity bars.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from keypoints_tpu.checkpoint import (assert_tree_shapes_match,
                                      convert_torch_state_dict)
from keypoints_tpu.configs import get_config
from keypoints_tpu.training import build_model
from tests.golden.torch_model import (TorchKeypointAutoencoder,
                                      rename_map_for_flax)

FILTERS = (16, 32)
STRIDES = (2, 2)
DEC_FILTERS = (32, 16)
DEC_UP = (True, True)


def _flax_params_from_torch(tnet):
    converted = convert_torch_state_dict(tnet.state_dict(),
                                         rename=rename_map_for_flax())
    return converted


@pytest.mark.parametrize("variant", ["marginal", "joint"])
def test_full_forward_parity(variant):
    torch.manual_seed(0)
    tnet = TorchKeypointAutoencoder(
        num_keypoints=4, in_channels=1, out_channels=1, sigma=0.12,
        temperature=0.8, variant=variant, encoder_filters=FILTERS,
        encoder_strides=STRIDES, decoder_filters=DEC_FILTERS,
        decoder_upsample=DEC_UP, groups=4).eval()

    cfg = get_config("pong64").override(**{
        "model.encoder_filters": FILTERS,
        "model.encoder_strides": STRIDES,
        "model.decoder_filters": DEC_FILTERS,
        "model.decoder_upsample": DEC_UP,
        "model.groups": 4,
        "model.num_keypoints": 4,
        "model.sigma": 0.12,
        "model.temperature": 0.8,
        "model.softmax_variant": variant,
        "data.image_size": 32,
        "train.compute_dtype": "float32"})
    model = build_model(cfg)

    x = jnp.zeros((1, 1, 32, 32))
    ref = model.init(jax.random.PRNGKey(0), x, x)["params"]
    params = _flax_params_from_torch(tnet)
    assert_tree_shapes_match(params, ref)

    rs = np.random.RandomState(3)
    src = rs.rand(4, 1, 32, 32).astype(np.float32)
    tgt = rs.rand(4, 1, 32, 32).astype(np.float32)

    with torch.no_grad():
        want_recon, want_kp = tnet(torch.tensor(src), torch.tensor(tgt))
    got_recon, got_kp = model.apply({"params": params},
                                    jnp.asarray(src), jnp.asarray(tgt))

    # keypoint parity: < 1e-3 L2 per keypoint (the BASELINE bar, with huge
    # margin — identical fp32 math should agree to ~1e-6)
    l2 = np.linalg.norm(np.asarray(got_kp) - want_kp.numpy(), axis=-1)
    assert l2.max() < 1e-3, l2.max()
    np.testing.assert_allclose(np.asarray(got_recon), want_recon.numpy(),
                               atol=5e-5)

    # loss parity within fp32 tolerance
    t_loss = float(((want_recon - torch.tensor(tgt)) ** 2).mean())
    j_loss = float(jnp.mean((got_recon - jnp.asarray(tgt)) ** 2))
    assert abs(t_loss - j_loss) < 1e-6


@pytest.mark.parametrize("variant", ["marginal", "joint"])
def test_transporter_forward_parity(variant):
    """Transporter transport equation + masks: forward agreement (VERDICT r1
    missing #2 — the place a silent sign/mask error survives ops-level tests)."""
    from tests.golden.torch_model import TorchTransporter

    torch.manual_seed(7)
    tnet = TorchTransporter(
        num_keypoints=3, in_channels=1, out_channels=1, sigma=0.15,
        temperature=0.9, variant=variant, encoder_filters=FILTERS,
        encoder_strides=STRIDES, decoder_filters=DEC_FILTERS,
        decoder_upsample=DEC_UP, groups=4).eval()

    cfg = get_config("transporter_atari").override(**{
        "model.encoder_filters": FILTERS,
        "model.encoder_strides": STRIDES,
        "model.decoder_filters": DEC_FILTERS,
        "model.decoder_upsample": DEC_UP,
        "model.groups": 4,
        "model.num_keypoints": 3,
        "model.sigma": 0.15,
        "model.temperature": 0.9,
        "model.softmax_variant": variant,
        "data.image_size": 32,
        "train.compute_dtype": "float32"})
    model = build_model(cfg)

    x = jnp.zeros((1, 1, 32, 32))
    ref = model.init(jax.random.PRNGKey(0), x, x)["params"]
    params = _flax_params_from_torch(tnet)
    assert_tree_shapes_match(params, ref)

    rs = np.random.RandomState(11)
    src = rs.rand(4, 1, 32, 32).astype(np.float32)
    tgt = rs.rand(4, 1, 32, 32).astype(np.float32)

    with torch.no_grad():
        want_recon, want_kp = tnet(torch.tensor(src), torch.tensor(tgt))
    got_recon, got_kp = model.apply({"params": params},
                                    jnp.asarray(src), jnp.asarray(tgt))

    l2 = np.linalg.norm(np.asarray(got_kp) - want_kp.numpy(), axis=-1)
    assert l2.max() < 1e-3, l2.max()
    np.testing.assert_allclose(np.asarray(got_recon), want_recon.numpy(),
                               atol=5e-5)


@pytest.mark.slow
def test_transporter_gradient_parity():
    """Parameter-gradient agreement pins the stop-grad recipe: torch
    ``.detach()`` on the source branch must equal ``lax.stop_gradient``.
    A missing/extra stop-grad or a flipped (1-G) mask changes these grads."""
    from tests.golden.torch_model import TorchTransporter

    torch.manual_seed(9)
    tnet = TorchTransporter(
        num_keypoints=3, in_channels=1, out_channels=1, sigma=0.15,
        temperature=0.9, variant="marginal", encoder_filters=FILTERS,
        encoder_strides=STRIDES, decoder_filters=DEC_FILTERS,
        decoder_upsample=DEC_UP, groups=4)

    cfg = get_config("transporter_atari").override(**{
        "model.encoder_filters": FILTERS,
        "model.encoder_strides": STRIDES,
        "model.decoder_filters": DEC_FILTERS,
        "model.decoder_upsample": DEC_UP,
        "model.groups": 4,
        "model.num_keypoints": 3,
        "model.sigma": 0.15,
        "model.temperature": 0.9,
        "data.image_size": 32,
        "train.compute_dtype": "float32"})
    model = build_model(cfg)
    params = _flax_params_from_torch(tnet)

    rs = np.random.RandomState(13)
    src = rs.rand(2, 1, 32, 32).astype(np.float32)
    tgt = rs.rand(2, 1, 32, 32).astype(np.float32)

    # torch grads
    ts, tt = torch.tensor(src), torch.tensor(tgt)
    recon, _ = tnet(ts, tt)
    loss_t = ((recon - tt) ** 2).mean()
    loss_t.backward()
    tgrads = {n: p.grad if p.grad is not None else torch.zeros_like(p)
              for n, p in tnet.named_parameters()}
    g_torch = convert_torch_state_dict(tgrads, rename=rename_map_for_flax())

    # jax grads
    def loss_fn(p):
        r, _ = model.apply({"params": p}, jnp.asarray(src), jnp.asarray(tgt))
        return jnp.mean((r - jnp.asarray(tgt)) ** 2)

    g_jax = jax.grad(loss_fn)(params)

    flat_t = {"/".join(str(k.key) for k in path): np.asarray(v) for path, v
              in jax.tree_util.tree_flatten_with_path(g_torch)[0]}
    flat_j = {"/".join(str(k.key) for k in path): np.asarray(v) for path, v
              in jax.tree_util.tree_flatten_with_path(g_jax)[0]}
    assert set(flat_t) == set(flat_j)
    # source-branch stop-grads: encoder still gets grads through the TARGET
    # branch, so nothing should be exactly zero except by symmetry accident
    for name in flat_j:
        np.testing.assert_allclose(flat_j[name], flat_t[name], atol=2e-5,
                                   err_msg=name)


def test_extract_keypoints_parity():
    torch.manual_seed(1)
    tnet = TorchKeypointAutoencoder(
        num_keypoints=4, in_channels=1, out_channels=1,
        encoder_filters=FILTERS, encoder_strides=STRIDES,
        decoder_filters=DEC_FILTERS, decoder_upsample=DEC_UP,
        groups=4).eval()
    cfg = get_config("pong64").override(**{
        "model.encoder_filters": FILTERS,
        "model.encoder_strides": STRIDES,
        "model.decoder_filters": DEC_FILTERS,
        "model.decoder_upsample": DEC_UP,
        "model.groups": 4,
        "data.image_size": 32,
        "train.compute_dtype": "float32"})
    model = build_model(cfg)
    params = _flax_params_from_torch(tnet)

    x = np.random.RandomState(5).rand(8, 1, 32, 32).astype(np.float32)
    with torch.no_grad():
        want = tnet.extract_keypoints(torch.tensor(x)).numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x),
                                 method=model.extract_keypoints))
    assert np.linalg.norm(got - want, axis=-1).max() < 1e-3


def test_autoencoder_gradient_parity():
    """Parameter-gradient agreement for the Jakab autoencoder — pins the
    decoder's fused-upsample custom VJP (models/nets.py::_upconv2x) against
    torch autograd of the plain upsample+conv formulation, end to end
    through the full model (forward parity alone cannot catch a wrong
    hand-written backward)."""
    torch.manual_seed(5)
    tnet = TorchKeypointAutoencoder(
        num_keypoints=4, in_channels=1, out_channels=1, sigma=0.12,
        temperature=0.8, variant="marginal", encoder_filters=FILTERS,
        encoder_strides=STRIDES, decoder_filters=DEC_FILTERS,
        decoder_upsample=DEC_UP, groups=4)

    cfg = get_config("pong64").override(**{
        "model.encoder_filters": FILTERS,
        "model.encoder_strides": STRIDES,
        "model.decoder_filters": DEC_FILTERS,
        "model.decoder_upsample": DEC_UP,
        "model.groups": 4,
        "model.num_keypoints": 4,
        "model.sigma": 0.12,
        "model.temperature": 0.8,
        "data.image_size": 32,
        "train.compute_dtype": "float32"})
    model = build_model(cfg)
    params = _flax_params_from_torch(tnet)

    rs = np.random.RandomState(7)
    src = rs.rand(2, 1, 32, 32).astype(np.float32)
    tgt = rs.rand(2, 1, 32, 32).astype(np.float32)

    ts, tt = torch.tensor(src), torch.tensor(tgt)
    recon, _ = tnet(ts, tt)
    ((recon - tt) ** 2).mean().backward()
    tgrads = {n: p.grad if p.grad is not None else torch.zeros_like(p)
              for n, p in tnet.named_parameters()}
    g_torch = convert_torch_state_dict(tgrads, rename=rename_map_for_flax())

    def loss_fn(p):
        r, _ = model.apply({"params": p}, jnp.asarray(src), jnp.asarray(tgt))
        return jnp.mean((r - jnp.asarray(tgt)) ** 2)

    g_jax = jax.grad(loss_fn)(params)

    flat_t = {"/".join(str(k.key) for k in path): np.asarray(v) for path, v
              in jax.tree_util.tree_flatten_with_path(g_torch)[0]}
    flat_j = {"/".join(str(k.key) for k in path): np.asarray(v) for path, v
              in jax.tree_util.tree_flatten_with_path(g_jax)[0]}
    assert set(flat_t) == set(flat_j)
    for name in flat_j:
        np.testing.assert_allclose(flat_j[name], flat_t[name], atol=2e-5,
                                   err_msg=name)
