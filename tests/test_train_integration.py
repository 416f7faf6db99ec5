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


def test_heldout_scoring_pair_unseen_by_training(tmp_path):
    """Best-checkpoint scoring data is held out of training for
    store-backed sources (VERDICT r3 #6): the batch iterator never yields
    tail content (marked 255), and heldout_scoring_pair returns exactly
    that tail."""
    from keypoints_tpu.data.records import FrameStore, episode_pairs
    from keypoints_tpu.train import (heldout_scoring_pair,
                                     make_batch_iterator, scoring_holdout)

    n, size = 64, 16
    frames = np.zeros((n, 3, size, size), np.uint8)
    frames[-8:] = 255
    FrameStore.write(str(tmp_path / f"celeba_{size}.npy"), frames)

    cfg = get_config("celeba128").override(**{
        "data.data_dir": str(tmp_path), "data.image_size": size,
        "train.batch_size": 16})
    # reserve sized for eval batches too (min(64, n//4)), not just the
    # 8 scoring rows — VERDICT r4 review: eval must never reach into
    # trained rows
    assert scoring_holdout(cfg, n) == 16
    src = make_batch_iterator(cfg)
    it = iter(src)
    for _ in range(10):
        batch = next(it)
        assert float(np.asarray(batch).max()) < 1.0      # tail never seen
    pair = heldout_scoring_pair(cfg)
    assert pair is not None
    # warp-mode pair of the all-255 tail: border padding keeps it ~1.0
    # everywhere (color jitter scales around the mean, so not exactly 1)
    assert float(np.asarray(pair[0]).mean()) > 0.5
    assert pair[0].shape == (8, 3, size, size)

    # temporal mode: the held-out pair is exactly the tail pair rows
    pairs = episode_pairs([n])
    FrameStore.write(str(tmp_path / f"atari_{size}.npy"),
                     frames[:, :1], pairs)
    cfg_t = get_config("transporter_atari").override(**{
        "data.data_dir": str(tmp_path), "data.image_size": size,
        "train.batch_size": 16})
    it_t = iter(make_batch_iterator(cfg_t))
    for _ in range(10):
        a, b = next(it_t)
        assert float(np.asarray(b).max()) < 1.0
    a, b = heldout_scoring_pair(cfg_t)
    ij = pairs[-8:]
    np.testing.assert_allclose(np.asarray(a),
                               frames[ij[:, 0], :1].astype(np.float32) / 255)

    # tiny store: no holdout, scoring falls back (documented legacy draw)
    FrameStore.write(str(tmp_path / f"celeba_{size}.npy"), frames[:16])
    assert scoring_holdout(cfg, 16) == 0
    assert heldout_scoring_pair(cfg) is None

    # synthetic datasets need no holdout (independent keys are unseen)
    assert heldout_scoring_pair(get_config("pong64")) is None


def test_keypoint_diversity_term_mechanics():
    """Opt-in diversity loss (VERDICT-r4 extension, training.make_loss_fn):
    off by default (value identical to the plain objective), active when
    keypoints sit closer than the margin, annealed to exactly zero past
    train.diversity_steps (so late training optimizes the published
    objective bit-for-bit)."""
    from keypoints_tpu.training import make_loss_fn

    cfg = _cfg("autoencoder", keypoints=2)
    model = build_model(cfg)
    state = init_state(cfg, jax.random.PRNGKey(0))
    src, tgt, _ = _one_dot(jax.random.PRNGKey(5))

    v_off, aux_off = make_loss_fn(cfg, model)(state.params, src, tgt)
    assert "diversity" not in aux_off

    # margin larger than the image diagonal → every pair is inside the
    # hinge → the term must be strictly positive and raise the loss
    cfg_on = cfg.override(**{"train.keypoint_diversity": 1.0,
                             "train.diversity_margin": 4.0})
    lf = make_loss_fn(cfg_on, model)
    v_on, aux_on = lf(state.params, src, tgt)
    assert float(aux_on["diversity"]) > 0
    assert float(v_on) > float(v_off)
    # annealed to zero: lam_scale=0 recovers the plain objective exactly
    v_zero, _ = lf(state.params, src, tgt, 0.0)
    assert float(v_zero) == float(v_off)

    # the traced schedule inside the step: past diversity_steps the loss
    # equals the diversity-free step's loss bit-for-bit
    cfg_sched = cfg_on.override(**{"train.diversity_steps": 3})
    step_d = jax.jit(make_train_step(cfg_sched, model))
    step_0 = jax.jit(make_train_step(cfg, model))
    import dataclasses
    st = init_state(cfg_sched, jax.random.PRNGKey(0))
    st = st._replace(step=jnp.asarray(3, jnp.int32))   # scale clips to 0
    _, m_d = step_d(st, (src, tgt), jax.random.PRNGKey(2))
    _, m_0 = step_0(st, (src, tgt), jax.random.PRNGKey(2))
    assert float(m_d["loss"]) == float(m_0["loss"])
