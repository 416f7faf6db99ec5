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


# slow tier (r5 suite budget): retention policy only — the default set
# still covers save/restore via test_orbax_roundtrip + the e2e resumes
@pytest.mark.slow
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


def test_export_torch_exact_roundtrip():
    """torch → flax → torch is the identity on names AND values."""
    tnet = _TorchConvNet()
    rename = {"conv0": "Conv_0", "gn0": "GroupNorm_0",
              "conv1": "Conv_1", "gn1": "GroupNorm_1"}
    params = ckpt.convert_torch_state_dict(tnet.state_dict(), rename)
    back = ckpt.export_torch_state_dict(
        params, rename={v: k for k, v in rename.items()})
    want = {k: v.numpy() for k, v in tnet.state_dict().items()}
    assert set(back) == set(want)
    for k in want:
        np.testing.assert_array_equal(back[k], want[k])


# slow tier (r5 suite budget): the flax->torch EXPORT direction; the
# default set keeps the torch->flax conversion agreement test
@pytest.mark.slow
def test_export_torch_forward_agreement(tmp_path):
    """Flax-trained weights load into the golden torch model (strict) and
    reproduce the flax forward — TPU-trained checkpoints are usable from the
    reference's torch world (the reverse of [B:5] loadability)."""
    from keypoints_tpu.training import build_model
    from tests.golden.torch_model import (TorchKeypointAutoencoder,
                                          rename_map_for_flax)

    cfg = _small_cfg()
    state = init_state(cfg, jax.random.PRNGKey(42))
    pt = tmp_path / "exported.pt"
    ckpt.save_torch_checkpoint(
        str(pt), state.params,
        rename={v: k for k, v in rename_map_for_flax().items()})

    m = cfg.model
    tnet = TorchKeypointAutoencoder(
        num_keypoints=m.num_keypoints, in_channels=1, out_channels=1,
        sigma=m.sigma, temperature=m.temperature, variant=m.softmax_variant,
        encoder_filters=m.encoder_filters, encoder_strides=m.encoder_strides,
        decoder_filters=m.decoder_filters, decoder_upsample=m.decoder_upsample,
        groups=m.groups).eval()
    sd = torch.load(str(pt), map_location="cpu", weights_only=True)
    tnet.load_state_dict(sd, strict=True)

    rs = np.random.RandomState(5)
    src = rs.rand(2, 1, 32, 32).astype(np.float32)
    tgt = rs.rand(2, 1, 32, 32).astype(np.float32)
    model = build_model(cfg)
    got_recon, got_kp = model.apply({"params": state.params},
                                    jnp.asarray(src), jnp.asarray(tgt))
    with torch.no_grad():
        want_recon, want_kp = tnet(torch.tensor(src), torch.tensor(tgt))
    l2 = np.linalg.norm(np.asarray(got_kp) - want_kp.numpy(), axis=-1)
    assert l2.max() < 1e-3, l2.max()
    np.testing.assert_allclose(np.asarray(got_recon), want_recon.numpy(),
                               atol=5e-5)


@pytest.mark.slow
def test_export_torch_cli(tmp_path):
    """Orbax training checkpoint → .pt via the CLI; values match params."""
    cfg = _small_cfg()
    state = init_state(cfg, jax.random.PRNGKey(0))
    ckdir = tmp_path / "ck"
    mgr = ckpt.make_manager(str(ckdir))
    ckpt.save(mgr, 7, state._asdict())
    mgr.wait_until_finished()

    out = tmp_path / "export.pt"
    # an overridden config exports through the CLI with --override (the
    # restore template must match the trained shapes)
    ckpt._cli(["export-torch", str(ckdir), str(out), "--preset", "pong64",
               "--override",
               "model.encoder_filters=(8,16)", "model.encoder_strides=(2,2)",
               "model.decoder_filters=(16,8)",
               "model.decoder_upsample=(True,True)", "model.groups=4",
               "data.image_size=32", "train.compute_dtype=float32"])
    sd = torch.load(str(out), map_location="cpu", weights_only=True)
    flat = {".".join(str(k.key) for k in path): v for path, v in
            jax.tree_util.tree_flatten_with_path(state.params)[0]}
    assert len(sd) == len(flat)

    # preset-true CLI path
    cfg2 = get_config("pong64")
    state2 = init_state(cfg2, jax.random.PRNGKey(1))
    ckdir2 = tmp_path / "ck2"
    mgr2 = ckpt.make_manager(str(ckdir2))
    ckpt.save(mgr2, 3, state2._asdict())
    mgr2.wait_until_finished()
    out2 = tmp_path / "export2.pt"
    ckpt._cli(["export-torch", str(ckdir2), str(out2), "--preset", "pong64"])
    sd2 = torch.load(str(out2), map_location="cpu", weights_only=True)
    kp_kernel = np.asarray(state2.params["keynet"]["head"]["kernel"])
    np.testing.assert_allclose(sd2["keynet.head.weight"].numpy(),
                               np.transpose(kp_kernel, (3, 2, 0, 1)),
                               atol=0)


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
