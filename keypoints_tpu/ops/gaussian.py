"""Gaussian heatmap rasterizer: keypoint coordinates → isotropic Gaussian maps.

The inverse of the spatial softmax (SURVEY.md §2.1, provenance [PAPER][B:5]):
each keypoint ``(x_k, y_k)`` in normalized [-1, 1] coordinates is rendered as

    G_k(u, v) = exp(-((u - x_k)^2 + (v - y_k)^2) / (2 sigma^2))

on an ``H x W`` grid. Because the kernel is isotropic it factorizes into an
outer product of two 1-D Gaussians — one O(K*(H+W)) exp pass plus an outer
product instead of O(K*H*W) exps. ``sigma`` is in normalized units (the Jakab /
Transporter papers use ~0.05–0.1).

Pure-``jnp`` XLA path; oracle for ``keypoints_tpu.kernels.gaussian_pallas``.
"""

from __future__ import annotations

import jax.numpy as jnp

from keypoints_tpu.coords import DEFAULT_ALIGN_CORNERS, axis_coords


def gaussian_maps(keypoints: jnp.ndarray, height: int, width: int,
                  sigma: float = 0.1,
                  align_corners: bool = DEFAULT_ALIGN_CORNERS) -> jnp.ndarray:
    """Render ``(B, K, 2)`` keypoints (``(x, y)`` order) to ``(B, K, H, W)`` maps."""
    x = keypoints[..., 0]                                    # (B, K)
    y = keypoints[..., 1]
    us = axis_coords(width, align_corners, keypoints.dtype)   # (W,)
    vs = axis_coords(height, align_corners, keypoints.dtype)  # (H,)
    inv = 1.0 / (2.0 * sigma * sigma)
    gx = jnp.exp(-((us[None, None, :] - x[..., None]) ** 2) * inv)  # (B, K, W)
    gy = jnp.exp(-((vs[None, None, :] - y[..., None]) ** 2) * inv)  # (B, K, H)
    return gy[..., :, None] * gx[..., None, :]               # (B, K, H, W)
