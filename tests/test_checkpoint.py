"""Checkpoint round-trips (SURVEY.md §4.5): Orbax save/restore equality and
torch→flax weight conversion verified by forward-pass agreement.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from keypoints_tpu import checkpoint as ckpt
from keypoints_tpu.configs import get_config
from keypoints_tpu.training import init_state


def _small_cfg():
    return get_config("pong64").override(**{
        "model.encoder_filters": (8, 16),
        "model.encoder_strides": (2, 2),
        "model.decoder_filters": (16, 8),
        "model.decoder_upsample": (True, True),
        "model.groups": 4,
        "data.image_size": 32,
        "train.compute_dtype": "float32"})


def test_orbax_roundtrip(tmp_path):
    cfg = _small_cfg()
    state = init_state(cfg, jax.random.PRNGKey(0))
    mgr = ckpt.make_manager(str(tmp_path / "ck"), max_to_keep=2)
    ckpt.save(mgr, 0, state._asdict())
    mgr.wait_until_finished()
    step, restored = ckpt.restore_latest(mgr, state._asdict())
    assert step == 0
    for a, b in zip(jax.tree_util.tree_leaves(state._asdict()),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_max_to_keep(tmp_path):
    cfg = _small_cfg()
    state = init_state(cfg, jax.random.PRNGKey(0))._asdict()
    mgr = ckpt.make_manager(str(tmp_path / "ck"), max_to_keep=2)
    for s in (0, 1, 2, 3):
        ckpt.save(mgr, s, state)
    mgr.wait_until_finished()
    assert mgr.latest_step() == 3
    assert sorted(mgr.all_steps()) == [2, 3]


class _TorchConvNet(torch.nn.Module):
    """Same arch as a 2-block flax Encoder, torch conventions."""

    def __init__(self):
        super().__init__()
        self.conv0 = torch.nn.Conv2d(1, 8, 3, stride=2, padding=1)
        self.gn0 = torch.nn.GroupNorm(4, 8)
        self.conv1 = torch.nn.Conv2d(8, 16, 3, stride=2, padding=1)
        self.gn1 = torch.nn.GroupNorm(4, 16)

    def forward(self, x):
        x = torch.relu(self.gn0(self.conv0(x)))
        return torch.relu(self.gn1(self.conv1(x)))


def test_torch_conversion_forward_agreement():
    """Convert a torch net's weights into the flax Encoder → same outputs."""
    from keypoints_tpu.models import Encoder

    tnet = _TorchConvNet().eval()
    x = np.random.RandomState(0).rand(2, 1, 16, 16).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.tensor(x)).numpy()           # NCHW

    params = ckpt.convert_torch_state_dict(
        tnet.state_dict(),
        rename={"conv0": "Conv_0", "gn0": "GroupNorm_0",
                "conv1": "Conv_1", "gn1": "GroupNorm_1"})
    enc = Encoder(filters=(8, 16), strides=(2, 2), groups=4)
    ref = enc.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 16, 16, 1)))["params"]
    ckpt.assert_tree_shapes_match(params, ref)
    got = enc.apply({"params": params},
                    jnp.asarray(x).transpose(0, 2, 3, 1))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_conversion_shape_mismatch_raises():
    from keypoints_tpu.models import Encoder
    tnet = _TorchConvNet()
    params = ckpt.convert_torch_state_dict(tnet.state_dict())  # no rename
    enc = Encoder(filters=(8, 16), strides=(2, 2), groups=4)
    ref = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)))["params"]
    with pytest.raises(ValueError):
        ckpt.assert_tree_shapes_match(params, ref)


def test_convert_cli(tmp_path):
    """torch .pt → Orbax checkpoint via the CLI, restorable afterwards."""
    import json
    tnet = _TorchConvNet()
    pt = tmp_path / "ref.pt"
    torch.save(tnet.state_dict(), pt)
    rename = {"conv0": "Conv_0", "gn0": "GroupNorm_0",
              "conv1": "Conv_1", "gn1": "GroupNorm_1"}
    rn = tmp_path / "rename.json"
    rn.write_text(json.dumps(rename))
    out = tmp_path / "orbax"
    ckpt._cli(["convert", str(pt), str(out), "--rename", str(rn)])
    mgr = ckpt.make_manager(str(out))
    assert mgr.latest_step() == 0
    params = ckpt.convert_torch_state_dict(tnet.state_dict(), rename)
    restored = mgr.restore(0, args=__import__("orbax.checkpoint", fromlist=["args"])
                           .args.StandardRestore({"params": params}))
    got = jax.tree_util.tree_leaves(restored["params"])
    want = jax.tree_util.tree_leaves(params)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_extract_roundtrip(tmp_path):
    """AOT serving artifact: export the extractor with params baked in,
    reload from bytes on disk, and match the live model's keypoints."""
    import jax
    import jax.numpy as jnp

    from keypoints_tpu.configs import get_config
    from keypoints_tpu.export import export_extract, load_extract
    from keypoints_tpu.training import (build_model, init_state,
                                        make_extract_fn)

    cfg = get_config("pong64").override(**{
        "model.encoder_filters": (8, 16), "model.encoder_strides": (2, 2),
        "model.decoder_filters": (16, 8),
        "model.decoder_upsample": (True, True), "model.groups": 4,
        "data.image_size": 32, "train.compute_dtype": "float32"})
    state = init_state(cfg, jax.random.PRNGKey(0))

    data = export_extract(cfg, state.params, batch=4)
    path = tmp_path / "extract.shlo"
    path.write_bytes(data)

    extract = load_extract(str(path))
    imgs = jnp.asarray(np.random.RandomState(3).rand(4, 1, 32, 32),
                       jnp.float32)
    got = np.asarray(extract(imgs))
    model = build_model(cfg)
    want = np.asarray(jax.jit(make_extract_fn(cfg, model))(state.params,
                                                           imgs))
    assert got.shape == (4, cfg.model.num_keypoints, 2)
    np.testing.assert_allclose(got, want, atol=1e-6)
