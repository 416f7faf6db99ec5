"""Coordinate conventions — the single source of truth for every grid in the framework.

Convention (matches the reference's use of ``torch.nn.functional.grid_sample`` /
``affine_grid``; see SURVEY.md §2.1 "Coordinate convention", provenance [B:5]):

* Keypoints and sampling grids live on a normalized ``[-1, 1] x [-1, 1]`` square.
* ``x`` indexes the **width** (last) axis, ``y`` indexes the **height** axis.
* A keypoint is stored as ``(x, y)`` — width first — matching grid_sample's
  ``grid[..., 0] = x, grid[..., 1] = y`` layout.
* ``align_corners`` semantics are explicit everywhere:
    - ``align_corners=True``:  pixel *centers* of the first/last pixel map to -1/+1.
      ``coord(i) = -1 + 2*i/(n-1)``.
    - ``align_corners=False``: pixel *edges* map to -1/+1 (torch >= 1.3 default).
      ``coord(i) = -1 + (2*i + 1)/n``.

The whole framework defaults to ``align_corners=True`` (the convention of the
era of the reference and of the Jakab/Transporter papers' public code); every
function takes it as an argument so parity tests can pin either.
"""

from __future__ import annotations

import jax.numpy as jnp

DEFAULT_ALIGN_CORNERS = True


def axis_coords(n: int, align_corners: bool = DEFAULT_ALIGN_CORNERS,
                dtype=jnp.float32) -> jnp.ndarray:
    """Normalized coordinates of ``n`` pixels along one axis, in [-1, 1].

    Returns shape ``(n,)``.
    """
    i = jnp.arange(n, dtype=dtype)
    if align_corners:
        if n == 1:
            return jnp.zeros((1,), dtype=dtype)
        return -1.0 + 2.0 * i / (n - 1)
    return -1.0 + (2.0 * i + 1.0) / n


def coord_grid(height: int, width: int,
               align_corners: bool = DEFAULT_ALIGN_CORNERS,
               dtype=jnp.float32) -> jnp.ndarray:
    """Dense normalized grid of shape ``(height, width, 2)`` with ``(x, y)`` last.

    ``grid[i, j] = (x_j, y_i)`` — identical layout to the identity grid produced
    by ``torch.nn.functional.affine_grid`` with an identity theta.
    """
    ys = axis_coords(height, align_corners, dtype)
    xs = axis_coords(width, align_corners, dtype)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([gx, gy], axis=-1)


def normalized_to_pixel(coords: jnp.ndarray, size: int,
                        align_corners: bool = DEFAULT_ALIGN_CORNERS) -> jnp.ndarray:
    """Map normalized [-1, 1] coords to (fractional) pixel indices on an axis of ``size``.

    Inverse of :func:`axis_coords` evaluated at arbitrary points; matches
    grid_sample's unnormalization exactly.
    """
    coords = jnp.asarray(coords)
    if align_corners:
        return (coords + 1.0) * 0.5 * (size - 1)
    return (coords + 1.0) * 0.5 * size - 0.5


def pixel_to_normalized(idx: jnp.ndarray, size: int,
                        align_corners: bool = DEFAULT_ALIGN_CORNERS) -> jnp.ndarray:
    """Map (fractional) pixel indices to normalized [-1, 1] coordinates."""
    idx = jnp.asarray(idx, dtype=jnp.float32)
    if align_corners:
        if size == 1:
            return jnp.zeros_like(idx)
        return idx * 2.0 / (size - 1) - 1.0
    return (2.0 * idx + 1.0) / size - 1.0
