"""Config system tests: presets, dotted overrides, type coercion."""

import pytest

from keypoints_tpu.configs import PRESETS, get_config


def test_all_five_baseline_presets_exist():
    assert set(PRESETS) == {"pong64", "celeba128", "transporter_atari",
                            "pose256", "dp_celeba"}


def test_preset_fields_match_baseline_spec():
    # [B:7] Pong 64x64 gray, 4 kp
    p = get_config("pong64")
    assert (p.model.num_keypoints, p.data.image_size, p.data.channels) == (4, 64, 1)
    # [B:8] CelebA 128, 10 kp
    c = get_config("celeba128")
    assert (c.model.num_keypoints, c.data.image_size) == (10, 128)
    # [B:9] transporter
    t = get_config("transporter_atari")
    assert t.train.model_kind == "transporter"
    assert t.data.pair_mode == "temporal"
    # [B:10] pose 256, 16 kp, perceptual
    q = get_config("pose256")
    assert (q.model.num_keypoints, q.data.image_size, q.train.loss) == (16, 256, "perceptual")
    # [B:11] DP
    d = get_config("dp_celeba")
    assert d.train.data_parallel and d.train.batch_size == 256


def test_override_nested_and_top_level():
    cfg = get_config("pong64").override(**{"train.lr": 3e-4, "name": "x"})
    assert cfg.train.lr == 3e-4 and cfg.name == "x"
    # original untouched (frozen dataclasses)
    assert get_config("pong64").train.lr == 1e-3


def test_override_type_coercion():
    # CLI passes strings/ints; values are coerced to the field's type
    cfg = get_config("pong64").override(**{"train.batch_size": 16.0})
    assert cfg.train.batch_size == 16 and isinstance(cfg.train.batch_size, int)


def test_override_tuple_from_string_parses_not_chars():
    cfg = get_config("pong64").override(**{"model.encoder_filters": "(8, 16)"})
    assert cfg.model.encoder_filters == (8, 16)
    cfg2 = get_config("pong64").override(**{"model.encoder_filters": [8, 16]})
    assert cfg2.model.encoder_filters == (8, 16)
    with pytest.raises(TypeError, match="tuple"):
        get_config("pong64").override(**{"model.encoder_filters": 8.5})


def test_override_bool_from_string():
    cfg = get_config("dp_celeba").override(**{"train.data_parallel": "false"})
    assert cfg.train.data_parallel is False
    with pytest.raises(TypeError, match="bool"):
        get_config("dp_celeba").override(**{"train.data_parallel": "maybe"})


def test_unknown_preset_raises():
    with pytest.raises(KeyError, match="unknown preset"):
        get_config("nope")


def test_unknown_field_raises():
    with pytest.raises((TypeError, AttributeError)):
        get_config("pong64").override(**{"train.nonexistent": 1})


def test_apply_overrides_shared_cli_parser():
    """The ONE CLI override parser (train/eval/export all route here)."""
    from keypoints_tpu.configs import apply_overrides
    cfg = apply_overrides(get_config("pong64"), [
        "train.lr=3e-4",                    # float literal
        "data.image_size=32",               # int literal
        "name=run-a",                       # non-literal stays a string
        "model.encoder_filters=(4, 8)",     # tuple literal
        "train.vgg_ckpt=/tmp/vgg16.pth",    # path: SyntaxError branch
    ])
    assert cfg.train.lr == 3e-4
    assert cfg.data.image_size == 32
    assert cfg.name == "run-a"
    assert cfg.model.encoder_filters == (4, 8)
    assert cfg.train.vgg_ckpt == "/tmp/vgg16.pth"
