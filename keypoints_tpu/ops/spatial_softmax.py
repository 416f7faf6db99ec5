"""Spatial softmax (soft-argmax): heatmaps → normalized keypoint coordinates.

The keypoint bottleneck of the Jakab-2018 autoencoder and the Kulkarni-2019
Transporter (SURVEY.md §2.1, provenance [PAPER][B:5]). Two published variants:

* ``joint``   — 2-D softmax over the full H*W plane, then expectations of the
  (x, y) coordinate grids under that distribution.
* ``marginal``— sum the heatmap over rows / columns first, softmax each 1-D
  marginal separately, take 1-D expectations. (The variant the reference is
  recalled to use, SURVEY.md "Parity risk #1"; both are provided behind a flag
  and golden tests pin each against an independent torch implementation.)

All functions operate on NCHW heatmaps ``(B, K, H, W)`` and return coordinates
``(B, K, 2)`` stored ``(x, y)`` in [-1, 1] per ``keypoints_tpu.coords``.

This module is the pure-``jnp`` XLA path; it doubles as the correctness oracle
for the fused Pallas kernel in ``keypoints_tpu.kernels.spatial_softmax_pallas``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from keypoints_tpu.coords import DEFAULT_ALIGN_CORNERS, axis_coords


def spatial_softmax2d(heatmaps: jnp.ndarray, temperature: float = 1.0,
                      align_corners: bool = DEFAULT_ALIGN_CORNERS) -> jnp.ndarray:
    """Joint 2-D soft-argmax. ``(B, K, H, W) -> (B, K, 2)`` with ``(x, y)``."""
    b, k, h, w = heatmaps.shape
    logits = heatmaps.reshape(b, k, h * w) / temperature
    probs = jax.nn.softmax(logits, axis=-1)
    xs = axis_coords(w, align_corners, heatmaps.dtype)
    ys = axis_coords(h, align_corners, heatmaps.dtype)
    # E[x] under p(u,v): sum_v p(u,v) x_v — grid is separable so flatten once.
    grid_x = jnp.tile(xs, h)                     # (H*W,) x varies fastest
    grid_y = jnp.repeat(ys, w)                   # (H*W,)
    ex = probs @ grid_x
    ey = probs @ grid_y
    return jnp.stack([ex, ey], axis=-1)


def marginal_softmax(heatmaps: jnp.ndarray, temperature: float = 1.0,
                     align_corners: bool = DEFAULT_ALIGN_CORNERS) -> jnp.ndarray:
    """Marginal soft-argmax: softmax over row/col sums. ``(B,K,H,W) -> (B,K,2)``.

    ``x`` comes from the width marginal ``sum_h heatmap``; ``y`` from the height
    marginal ``sum_w heatmap``.

    B and K are flattened into one leading axis before the reduces: same
    math, but the 4-D ``reduce(dims={2})``/``reduce(dims={3})`` pair trips
    an XLA:TPU layout-assignment bug at batch 1 ("Expected instruction to
    have shape equal to f32[K,H], actual f32[H,K]", v5e, jax 0.9 — hit by
    the b1 serving bucket); the flattened 3-D reduces compile at every
    batch size.
    """
    b, k, h, w = heatmaps.shape
    flat = heatmaps.reshape(b * k, h, w)
    hx = flat.sum(axis=1)                        # (B*K, W)  width marginal
    hy = flat.sum(axis=2)                        # (B*K, H)  height marginal
    px = jax.nn.softmax(hx / temperature, axis=-1)
    py = jax.nn.softmax(hy / temperature, axis=-1)
    xs = axis_coords(w, align_corners, heatmaps.dtype)
    ys = axis_coords(h, align_corners, heatmaps.dtype)
    ex = px @ xs
    ey = py @ ys
    return jnp.stack([ex, ey], axis=-1).reshape(b, k, 2)


def spatial_softmax(heatmaps: jnp.ndarray, temperature: float = 1.0,
                    variant: str = "marginal",
                    align_corners: bool = DEFAULT_ALIGN_CORNERS) -> jnp.ndarray:
    """Dispatch between the two published soft-argmax variants."""
    if variant == "joint":
        return spatial_softmax2d(heatmaps, temperature, align_corners)
    if variant == "marginal":
        return marginal_softmax(heatmaps, temperature, align_corners)
    raise ValueError(f"unknown spatial softmax variant: {variant!r}")
