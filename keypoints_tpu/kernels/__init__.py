"""Pallas TPU kernels with automatic XLA fallback.

``spatial_softmax`` / ``gaussian_maps`` here dispatch to the fused Pallas
kernels on TPU and to the pure-jnp oracles elsewhere (CPU tests, interpret
debugging). The jnp paths are the correctness oracles — see tests/test_kernels.py.
"""

from __future__ import annotations

import contextlib
import threading

import jax
import jax.numpy as jnp

from keypoints_tpu.coords import DEFAULT_ALIGN_CORNERS
from keypoints_tpu.kernels.gaussian_pallas import gaussian_maps_pallas
from keypoints_tpu.kernels.spatial_softmax_pallas import spatial_softmax_pallas
from keypoints_tpu.kernels.warp_pallas import (MAX_LANES, _ROWS_PER_PROGRAM,
                                               warp_bilinear_pallas,
                                               warp_field_pallas)
from keypoints_tpu.ops.gaussian import gaussian_maps as _gaussian_jnp
from keypoints_tpu.ops.spatial_softmax import spatial_softmax as _softmax_jnp
from keypoints_tpu.ops.warp import grid_sample as _grid_sample_jnp


_LOCAL = threading.local()


@contextlib.contextmanager
def xla_only():
    """Force the pure-jnp (XLA) paths for code traced inside this block.

    Mosaic ``pallas_call``s lower only for TPU, so a program that must also
    run elsewhere — a multi-platform ``jax.export`` artifact (``--platforms
    tpu cpu``) being the real case — has to trace the jnp oracles instead.
    Thread-local so a serving process exporting in one thread does not
    deroute the hot path in another."""
    prev = getattr(_LOCAL, "xla_only", False)
    _LOCAL.xla_only = True
    try:
        yield
    finally:
        _LOCAL.xla_only = prev


def _on_tpu() -> bool:
    return (jax.default_backend() == "tpu"
            and not getattr(_LOCAL, "xla_only", False))


def spatial_softmax(heatmaps: jnp.ndarray, temperature: float = 1.0,
                    variant: str = "marginal",
                    align_corners: bool = DEFAULT_ALIGN_CORNERS) -> jnp.ndarray:
    # Measured on TPU v5e (fori-loop difference bench, 2026-08-16): the fused
    # flat-layout joint kernel beats XLA ~1.8x fwd / ~1.4x vjp (XLA
    # materializes the 2-D softmax probabilities in HBM). The MARGINAL
    # variant stays on XLA by measurement, not omission — three Pallas
    # designs were built and benchmarked at the preset shapes
    # (B=128,K=10,32²):
    #   * (R,H,W) 3-D blocks: W<128 pads lanes — 2.9x slower than XLA;
    #   * flat-layout circular-roll trees (benchmarks/bench_marginal.py,
    #     r2): ~log2(HW) VPU passes — 49us vs XLA 11us fwd;
    #   * flat-layout MXU indicator-matmul (the version in
    #     spatial_softmax_pallas.py, tested + shipped): 29us vs XLA 11us.
    # XLA's fused two-pass reduce is ~2x off the single-HBM-read floor
    # (~6.5us) and the op is ~0.03% of the train step; no one-pass Mosaic
    # schedule exists under the documented layout limits (no lane-splitting
    # reshape, no stride-W segment reduce), so XLA is the TPU-optimal
    # routing for this variant.
    # Batch-1 marginal ALSO goes to Pallas — not for speed: XLA:TPU's
    # layout assignment miscompiles the fused NHWC-transpose + marginal
    # reduces at B=1 ("Expected instruction to have shape equal to
    # f32[K,H], actual f32[H,K]", v5e / jax 0.9 remote compile — hit by
    # the b1 serving bucket; every B>1 compiles fine). The Pallas kernel
    # sidesteps the buggy fusion and is oracle-tested at this shape.
    if _on_tpu() and (variant == "joint"
                      or (variant == "marginal" and heatmaps.shape[0] == 1)):
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
                y_window: int | None = None,
                y_row_advance: float | None = None) -> jnp.ndarray:
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
                                    y_window=y_window,
                                    y_row_advance=y_row_advance)
    return _grid_sample_jnp(image, grid, padding_mode, align_corners)


def warp_sample_field(image: jnp.ndarray, field: jnp.ndarray,
                      out_height: int, out_width: int,
                      padding_mode: str = "zeros",
                      align_corners: bool = DEFAULT_ALIGN_CORNERS,
                      y_window: int | None = None,
                      y_row_advance: float | None = None) -> jnp.ndarray:
    """Warp from a coarse (B, F, F, 2) field (data path — no gradient).

    Measured routing (v5e, 2026-08-16):

    * ``wo <= 128``: upsample the field in XLA + the dense-grid Pallas warp.
      XLA's upsample OVERLAPS with the sibling warp's pallas call inside a
      fused aug step (make_pair 3.5 ms vs 4.6 ms all-pallas at 128²/b128),
      so all-in-kernel is a net LOSS at one lane tile.
    * ``wo > 128`` on TPU: the field kernel — the dense grid never exists,
      output chunking rides the pallas grid, and 256² compiles in ~2 s
      (round 1: >15 min, dispatcher capped at 128, XLA gather fallback
      measured ~0.5 s/step at pose256 shapes).
    """
    b, c, h, w = image.shape
    ho, wo = int(out_height), int(out_width)
    span = min(wo, MAX_LANES)
    if (_on_tpu() and wo > MAX_LANES and w <= 4 * MAX_LANES
            and wo % span == 0 and ho % _ROWS_PER_PROGRAM == 0):
        return warp_field_pallas(image, field, ho, wo, padding_mode,
                                 align_corners, y_window=y_window,
                                 y_row_advance=y_row_advance)
    from keypoints_tpu.ops.warp import upsample_field_aligned
    grid = upsample_field_aligned(field, ho, wo)
    return warp_sample(image, grid, padding_mode, align_corners,
                       y_window=y_window, y_row_advance=y_row_advance)


__all__ = ["spatial_softmax", "gaussian_maps", "warp_sample",
           "warp_sample_field", "xla_only", "spatial_softmax_pallas",
           "gaussian_maps_pallas", "warp_bilinear_pallas",
           "warp_field_pallas"]


def extract_and_render(heatmaps: jnp.ndarray, out_height: int, out_width: int,
                       temperature: float = 1.0, sigma: float = 0.1,
                       variant: str = "marginal",
                       align_corners: bool = DEFAULT_ALIGN_CORNERS
                       ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """The keypoint bottleneck in one shot: heatmaps → (coords, Gaussian maps).

    On TPU with the joint variant this is the fully fused Pallas kernel
    (extract → re-render without leaving VMEM, SURVEY §2.2); the marginal
    variant's fused kernel exists too (``softargmax_raster_fused(...,
    variant="marginal")``, tested) but measured SLOWER than XLA-softmax +
    Pallas-raster at the preset shapes (27us vs 19us — the in-kernel
    marginal reduce costs more than XLA's, see ``spatial_softmax`` above),
    so marginal dispatches the two stages separately: that IS the minimal
    HBM schedule for this variant (heatmap read once by the XLA reduce,
    (N,2) coords are the only intermediate, maps written once by the
    raster).
    """
    if _on_tpu() and variant == "joint":
        from keypoints_tpu.kernels.fused_bottleneck import \
            softargmax_raster_fused
        return softargmax_raster_fused(heatmaps, out_height, out_width,
                                       temperature, sigma, align_corners)
    kp = spatial_softmax(heatmaps, temperature, variant, align_corners)
    return kp, gaussian_maps(kp, out_height, out_width, sigma, align_corners)
