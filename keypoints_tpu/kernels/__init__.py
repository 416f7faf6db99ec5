"""Pallas TPU kernels with automatic XLA fallback.

``spatial_softmax`` / ``gaussian_maps`` here dispatch to the fused Pallas
kernels on TPU and to the pure-jnp oracles elsewhere (CPU tests, interpret
debugging). The jnp paths are the correctness oracles — see tests/test_kernels.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from keypoints_tpu.coords import DEFAULT_ALIGN_CORNERS
from keypoints_tpu.kernels.gaussian_pallas import gaussian_maps_pallas
from keypoints_tpu.kernels.spatial_softmax_pallas import spatial_softmax_pallas
from keypoints_tpu.kernels.warp_pallas import (MAX_LANES, _ROWS_PER_PROGRAM,
                                               warp_bilinear_pallas)
from keypoints_tpu.ops.gaussian import gaussian_maps as _gaussian_jnp
from keypoints_tpu.ops.spatial_softmax import spatial_softmax as _softmax_jnp
from keypoints_tpu.ops.warp import grid_sample as _grid_sample_jnp


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def spatial_softmax(heatmaps: jnp.ndarray, temperature: float = 1.0,
                    variant: str = "marginal",
                    align_corners: bool = DEFAULT_ALIGN_CORNERS) -> jnp.ndarray:
    # Measured on TPU v5e (difference-method bench, 2026-08-16): the fused
    # flat-layout joint kernel beats XLA ~1.8x fwd / ~1.4x vjp; the marginal
    # variant's 3-D-block kernel loses to XLA's fused reduce (~2.9x), so the
    # marginal path stays on XLA until the lane-segment-sum layout lands.
    if _on_tpu() and variant == "joint":
        return spatial_softmax_pallas(heatmaps, temperature, variant,
                                      align_corners)
    return _softmax_jnp(heatmaps, temperature, variant, align_corners)


def gaussian_maps(keypoints: jnp.ndarray, height: int, width: int,
                  sigma: float = 0.1,
                  align_corners: bool = DEFAULT_ALIGN_CORNERS) -> jnp.ndarray:
    if _on_tpu():
        return gaussian_maps_pallas(keypoints, height, width, sigma,
                                    align_corners)
    return _gaussian_jnp(keypoints, height, width, sigma, align_corners)


def warp_sample(image: jnp.ndarray, grid: jnp.ndarray,
                padding_mode: str = "zeros",
                align_corners: bool = DEFAULT_ALIGN_CORNERS,
                y_window: int | None = None) -> jnp.ndarray:
    """Bilinear warp for the *data path* (augmentation — no gradient).

    Dispatches to the fused Pallas warp on TPU (with natural operand layouts
    the full aug pipeline runs ~20x faster than via XLA's element gather at
    128²; see kernels/warp_pallas.py and docs/DESIGN.md) when the shape fits
    its one-lane-tile constraint; everywhere else — CPU, >128-wide images,
    or paths needing gradients — use :func:`keypoints_tpu.ops.warp.grid_sample`.
    """
    b, c, h, w = image.shape
    ho, wo = grid.shape[1:3]
    # Multi-tile widths (>128) compile but take many minutes through this
    # environment's remote Mosaic compiler — keep the dispatcher at one lane
    # tile until that's resolved; wider shapes use the XLA path.
    if (_on_tpu() and w <= MAX_LANES and wo <= MAX_LANES
            and ho % _ROWS_PER_PROGRAM == 0):
        return warp_bilinear_pallas(image, grid, padding_mode, align_corners,
                                    y_window=y_window)
    return _grid_sample_jnp(image, grid, padding_mode, align_corners)


__all__ = ["spatial_softmax", "gaussian_maps", "warp_sample",
           "spatial_softmax_pallas", "gaussian_maps_pallas",
           "warp_bilinear_pallas"]


def extract_and_render(heatmaps: jnp.ndarray, out_height: int, out_width: int,
                       temperature: float = 1.0, sigma: float = 0.1,
                       variant: str = "marginal",
                       align_corners: bool = DEFAULT_ALIGN_CORNERS
                       ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """The keypoint bottleneck in one shot: heatmaps → (coords, Gaussian maps).

    On TPU with the joint variant this is the fully fused Pallas kernel
    (extract → re-render without leaving VMEM, SURVEY §2.2); otherwise the
    soft-argmax and raster dispatch separately.
    """
    if _on_tpu() and variant == "joint":
        from keypoints_tpu.kernels.fused_bottleneck import \
            softargmax_raster_fused
        return softargmax_raster_fused(heatmaps, out_height, out_width,
                                       temperature, sigma, align_corners)
    kp = spatial_softmax(heatmaps, temperature, variant, align_corners)
    return kp, gaussian_maps(kp, out_height, out_width, sigma, align_corners)
