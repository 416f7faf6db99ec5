"""Fused Pallas Gaussian rasterizer: (x, y) → isotropic heatmaps, one VMEM pass.

SURVEY.md §2.2 kernel #2 / [B:5]: renders each keypoint's Gaussian directly in
VMEM from in-kernel coordinate iotas — HBM traffic is the 2 input floats and
the output tile (which any implementation pays); the distance/exp
intermediates never leave the chip.

Same flat ``(N, H*W)`` lane-native layout as the softmax kernel (see its
docstring for why 3-D blocks waste lanes at W<128). The squared distance is
computed directly on the flat coordinate planes — one fused VPU expression,
no factorized outer product needed since nothing is materialized anyway.

Custom VJP: d/dx_k Σ g·G = Σ g · G · (u - x_k)/σ²; the backward recomputes G
in-kernel and emits just (N, 2) gradients.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from keypoints_tpu.coords import DEFAULT_ALIGN_CORNERS
from keypoints_tpu.kernels.spatial_softmax_pallas import (_block_rows,
                                                          _flat_coord_planes,
                                                          _flat_spec,
                                                          _kp_spec)


def _fwd_kernel(kp_ref, out_ref, *, hw, sigma, align_corners):
    ux, vy = _flat_coord_planes(*hw, align_corners)           # (1, HW)
    kp = kp_ref[...]                                          # (R, 2)
    inv = 1.0 / (2.0 * sigma * sigma)
    d2 = (ux - kp[:, 0:1]) ** 2 + (vy - kp[:, 1:2]) ** 2      # (R, HW)
    out_ref[...] = jnp.exp(-d2 * inv).astype(out_ref.dtype)


def _bwd_kernel(kp_ref, g_ref, out_ref, *, hw, sigma, align_corners):
    ux, vy = _flat_coord_planes(*hw, align_corners)
    kp = kp_ref[...]
    inv = 1.0 / (2.0 * sigma * sigma)
    dx_u = ux - kp[:, 0:1]                                    # (R, HW)
    dy_v = vy - kp[:, 1:2]
    gmap = jnp.exp(-(dx_u ** 2 + dy_v ** 2) * inv)
    w_g = g_ref[...].astype(jnp.float32) * gmap
    inv_s2 = 1.0 / (sigma * sigma)
    dx = jnp.sum(w_g * dx_u, axis=1, keepdims=True) * inv_s2  # (R, 1)
    dy = jnp.sum(w_g * dy_v, axis=1, keepdims=True) * inv_s2
    out_ref[...] = jnp.concatenate([dx, dy], axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _raster_op(kp, hw, sigma, align_corners, interpret):
    n = kp.shape[0]
    hw_total = hw[0] * hw[1]
    r = _block_rows(n, hw_total)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, hw=hw, sigma=sigma,
                          align_corners=align_corners),
        out_shape=jax.ShapeDtypeStruct((n, hw_total), jnp.float32),
        grid=(pl.cdiv(n, r),),
        in_specs=[_kp_spec(r)],
        out_specs=_flat_spec(r, hw_total),
        interpret=interpret,
    )(kp)


def _raster_fwd(kp, hw, sigma, align_corners, interpret):
    return _raster_op(kp, hw, sigma, align_corners, interpret), kp


def _raster_bwd(hw, sigma, align_corners, interpret, kp, g):
    n = kp.shape[0]
    hw_total = hw[0] * hw[1]
    r = _block_rows(n, hw_total)
    dkp = pl.pallas_call(
        functools.partial(_bwd_kernel, hw=hw, sigma=sigma,
                          align_corners=align_corners),
        out_shape=jax.ShapeDtypeStruct((n, 2), jnp.float32),
        grid=(pl.cdiv(n, r),),
        in_specs=[_kp_spec(r), _flat_spec(r, hw_total)],
        out_specs=_kp_spec(r),
        interpret=interpret,
    )(kp, g)
    return (dkp,)


_raster_op.defvjp(_raster_fwd, _raster_bwd)


def gaussian_maps_pallas(keypoints: jnp.ndarray, height: int, width: int,
                         sigma: float = 0.1,
                         align_corners: bool = DEFAULT_ALIGN_CORNERS,
                         interpret: bool = False) -> jnp.ndarray:
    """Fused rasterizer: (B, K, 2) → (B, K, H, W). Drop-in for gaussian_maps."""
    b, k, _ = keypoints.shape
    flat = keypoints.reshape(b * k, 2).astype(jnp.float32)
    maps = _raster_op(flat, (int(height), int(width)), float(sigma),
                      bool(align_corners), bool(interpret))
    return maps.reshape(b, k, height, width)
