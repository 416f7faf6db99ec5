"""Exactness tests for the measured-negative/tie kernels kept as records.

These kernels live in ``keypoints_tpu.kernels.experimental`` and are NOT
dispatched anywhere (VERDICT r2 weak #5 relocation); the tests pin that the
records stay correct so their measured numbers remain meaningful.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keypoints_tpu.data.augment import (WarpConfig, random_warp_grid,
                                        warp_y_window)
from keypoints_tpu.kernels.experimental import (warp_bilinear_rowwin,
                                                warp_bilinear_tree)
from keypoints_tpu.ops.warp import grid_sample


@pytest.mark.parametrize("padding", ["zeros", "border"])
def test_warp_rowwin_packed_matches_oracle(padding):
    """The measured-negative per-row windowed kernel stays EXACT: agreement
    with grid_sample to bf16 resolution."""
    cfg = WarpConfig()
    img = jnp.asarray(np.random.RandomState(21).rand(3, 3, 64, 64),
                      jnp.float32)
    g = random_warp_grid(jax.random.PRNGKey(21), 3, 64, 64, cfg)
    win = warp_y_window(cfg, 64)
    got = warp_bilinear_rowwin(img.astype(jnp.bfloat16), g, padding, True,
                               y_window=win, interpret=True)
    assert got.dtype == jnp.bfloat16
    want = grid_sample(img, g, padding, True)
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want),
                               atol=2e-2)


@pytest.mark.parametrize("padding", ["zeros", "border"])
def test_warp_tree_yselect_matches_oracle(padding):
    """The select-tree y-select variant (measured tie with the mask-reduce)
    stays exact, windowed and not."""
    cfg = WarpConfig()
    img = jnp.asarray(np.random.RandomState(23).rand(3, 3, 64, 64),
                      jnp.float32)
    g = random_warp_grid(jax.random.PRNGKey(23), 3, 64, 64, cfg)
    want = grid_sample(img, g, padding, True)
    for win in (warp_y_window(cfg, 64), None):
        got = warp_bilinear_tree(img.astype(jnp.bfloat16), g, padding,
                                 True, y_window=win, interpret=True)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want), atol=2e-2)


def test_tree_violated_window_degradation_modes():
    """With the window invariant VIOLATED (window smaller than the real
    per-block y spread), each kernel's documented degradation mode holds:

    * the SHIPPED mask-reduce path clamps out-of-band in-image samples to
      the band-edge row (r4 ADVICE medium #2 fix: a violated band
      degrades to a locally clamped warp — NEVER silently-black rows);
    * the recorded tree kernel keeps its historical zero-fill semantics
      (this file is a measured-negative lab notebook, not a shipping
      path), exercised at the failing alignment the r2 fix targeted:
      y_window=32 → win=64 → win_p=32, a power of two, where the pre-fix
      tree had no zero-pad row and clamped onto the last REAL row.
    """
    from keypoints_tpu.kernels.warp_pallas import warp_bilinear_pallas
    img_np = np.random.RandomState(29).rand(1, 3, 128, 64) * 0.8 + 0.1
    img = jnp.asarray(img_np, jnp.float32).astype(jnp.bfloat16)
    ho, wo = 64, 64
    xs = jnp.linspace(-0.9, 0.9, wo)
    # y alternates between extremes inside every 8-row block → per-block
    # spread ≈ the full 128-row image, violating y_window=32 by far.
    ys = jnp.where(jnp.arange(ho) % 2 == 0, -0.9, 0.9)
    gx, gy = jnp.meshgrid(xs, ys)
    g = jnp.stack([gx, gy], axis=-1)[None]
    got_tree = warp_bilinear_tree(img, g, "zeros", True,
                                  y_window=32, interpret=True)
    got_mask = warp_bilinear_pallas(img, g, "zeros", True,
                                    y_window=32, interpret=True)
    tree = np.asarray(got_tree, np.float32)
    mask = np.asarray(got_mask, np.float32)
    # in-window rows agree between the two kernels
    np.testing.assert_allclose(tree[:, :, ::2], mask[:, :, ::2], atol=2e-2)
    # tree: the violated window zeroed the out-of-window samples
    assert np.all(np.abs(tree[:, :, 1::2]) < 1e-6)
    # shipped kernel: every pixel is a REAL (clamped) sample — all inputs
    # are >= 0.1, so no silently-black rows anywhere
    assert np.all(mask > 1e-3)
