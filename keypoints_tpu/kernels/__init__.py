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
from keypoints_tpu.ops.gaussian import gaussian_maps as _gaussian_jnp
from keypoints_tpu.ops.spatial_softmax import spatial_softmax as _softmax_jnp


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


__all__ = ["spatial_softmax", "gaussian_maps", "spatial_softmax_pallas",
           "gaussian_maps_pallas"]
