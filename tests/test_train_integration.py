"""Behavioral integration tests (SURVEY.md §4.3): loss decreases over ~150
steps on synthetic data and keypoints lock onto the moving dot.

Notes from convergence probing (recorded so future sessions don't re-derive):
* The Gaussian bottleneck σ must span ≥ ~2 px of the *heatmap-resolution*
  grid or the keypoint gradient dies — on the 16² test grid that means
  σ ≈ 0.3 normalized. The published σ≈0.1 is fine for the real 128²→32² configs.
* Source/target dot positions must be independent (large shift); otherwise the
  appearance stream leaks geometry and the bottleneck is bypassed.
* Multi-dot discovery (4 dots / 4 kp) does not converge within CPU-test budget
  (~300 steps); it's covered by the long-horizon TPU benchmark runs instead.
"""

import numpy as np

import jax
import jax.numpy as jnp

from keypoints_tpu.configs import get_config
from keypoints_tpu.data.synthetic import moving_dots_pair, scripted_pong_pair
from keypoints_tpu.training import (build_model, init_state, make_extract_fn,
                                    make_train_step)


def _cfg(kind="autoencoder", keypoints=1):
    return get_config("pong64").override(**{
        "model.encoder_filters": (16, 32),
        "model.encoder_strides": (2, 1),       # 32² images → 16² heatmaps
        "model.decoder_filters": (32, 16),
        "model.decoder_upsample": (True, False),
        "model.groups": 4,
        "model.num_keypoints": keypoints,
        "model.sigma": 0.3,
        "data.image_size": 32,
        "train.model_kind": kind,
        "train.batch_size": 16,
        "train.compute_dtype": "float32",
        "train.lr": 2e-3,
        "train.warmup_steps": 10,
        "train.steps": 300,
    })


def _run(cfg, pair_fn, steps):
    model = build_model(cfg)
    state = init_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, model))
    losses = []
    for i in range(steps):
        src, tgt, _ = pair_fn(jax.random.PRNGKey(1000 + i))
        state, m = step(state, (src, tgt), jax.random.PRNGKey(2))
        losses.append(float(m["loss"]))
    return state, losses


def _one_dot(key):
    return moving_dots_pair(key, 16, 32, num_dots=1, channels=1, sigma=0.12,
                            max_shift=0.8)


def test_autoencoder_discovers_the_dot():
    """The core behavioral claim: unsupervised keypoint discovery works."""
    cfg = _cfg("autoencoder", keypoints=1)
    state, losses = _run(cfg, _one_dot, steps=150)
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.5

    extract = jax.jit(make_extract_fn(cfg, build_model(cfg)))
    _, tgt, pos = _one_dot(jax.random.PRNGKey(77))
    kp = np.asarray(extract(state.params, tgt))       # (B, 1, 2)
    d = np.linalg.norm(np.asarray(pos) - kp, axis=-1)
    assert np.median(d) < 0.15, np.median(d)


def test_transporter_loss_decreases_on_pong():
    cfg = _cfg("transporter", keypoints=4)
    state, losses = _run(
        cfg, lambda k: scripted_pong_pair(k, 16, 32), steps=60)
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.7


def test_training_is_deterministic():
    """Same seed → bit-identical loss trajectory (pure functional stack)."""
    cfg = _cfg("autoencoder", keypoints=1)

    def run():
        model = build_model(cfg)
        state = init_state(cfg, jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(cfg, model))
        losses = []
        for i in range(5):
            src, tgt, _ = _one_dot(jax.random.PRNGKey(100 + i))
            state, m = step(state, (src, tgt), jax.random.PRNGKey(2))
            losses.append(float(m["loss"]))
        return losses

    assert run() == run()


def test_grad_accum_matches_full_batch():
    """grad_accum=4 produces the same step as one full-batch step (mean loss
    ⇒ averaged micro-grads ARE the full gradient), in both temporal and
    warp pair modes — a pure activation-memory/batch-size trade."""
    import pytest

    for over in ({}, {"data.pair_mode": "warp"}):
        cfg = _cfg().override(**over)
        model = build_model(cfg)
        state0 = init_state(cfg, jax.random.PRNGKey(0))
        src, tgt, _ = _one_dot(jax.random.PRNGKey(7))
        batch = src if cfg.data.pair_mode == "warp" else (src, tgt)

        step_full = jax.jit(make_train_step(cfg, model))
        step_acc = jax.jit(make_train_step(
            cfg.override(**{"train.grad_accum": 4}), model))
        rng = jax.random.PRNGKey(3)
        sf, mf = step_full(state0, batch, rng)
        sa, ma = step_acc(state0, batch, rng)
        np.testing.assert_allclose(float(mf["loss"]), float(ma["loss"]),
                                   rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(sf.params),
                        jax.tree_util.tree_leaves(sa.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)

    # config validation: non-divisible and nonsense values fail loudly
    with pytest.raises(ValueError, match="not divisible"):
        make_train_step(_cfg().override(**{"train.grad_accum": 5}),
                        build_model(_cfg()))
    with pytest.raises(ValueError, match=">= 1"):
        make_train_step(_cfg().override(**{"train.grad_accum": 0}),
                        build_model(_cfg()))
