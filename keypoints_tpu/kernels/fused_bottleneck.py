"""Fused keypoint bottleneck: soft-argmax → Gaussian re-render, one kernel.

The north-star fusion (SURVEY.md §2.2: the raster kernel "pairs with the
softmax kernel so extract→re-render never leaves the chip" [B:5]): in the
Jakab decoder input and the Transporter G-maps, the coordinates produced by
the soft-argmax are immediately re-rendered as Gaussians. This kernel does
both in one VMEM residency — the heatmap tile is read once, the softmax
statistics, coordinates, and the rendered Gaussian tile are produced without
the (N, 2) coordinate hop or a second kernel launch.

Both published soft-argmax variants fuse: the joint 2-D softmax and the
marginal (row/col-sum) form — the latter via the flat-layout roll-tree
marginals in ``spatial_softmax_pallas``. Custom VJP composes the existing
backward kernels: the raster backward turns dG into dkp, which joins the
direct dkp before the matching soft-argmax backward turns it into dheatmap —
both backwards stay Pallas, nothing but (N, 2)-sized terms and the heatmap
cross HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from keypoints_tpu.coords import DEFAULT_ALIGN_CORNERS
from keypoints_tpu.kernels.gaussian_pallas import (_bwd_kernel as
                                                   _raster_bwd_kernel)
from keypoints_tpu.kernels.spatial_softmax_pallas import (_block_rows,
                                                          _flat_coord_planes,
                                                          _flat_spec,
                                                          _joint_bwd_kernel,
                                                          _joint_extract,
                                                          _kp_spec,
                                                          _marginal_bwd_kernel,
                                                          _marginal_extract)

_EXTRACT = {"joint": _joint_extract, "marginal": _marginal_extract}
_SOFTMAX_BWD = {"joint": _joint_bwd_kernel, "marginal": _marginal_bwd_kernel}


def _fused_fwd_kernel(h_ref, kp_ref, maps_ref, *, in_hw, out_hw, temperature,
                      sigma, align_corners, variant):
    x = h_ref[...].astype(jnp.float32) / temperature          # (R, HWin)
    ex, ey = _EXTRACT[variant](x, in_hw, align_corners)       # (R, 1) each
    kp_ref[...] = jnp.concatenate([ex, ey], axis=1)

    oux, ovy = _flat_coord_planes(*out_hw, align_corners)     # (1, HWout)
    inv = 1.0 / (2.0 * sigma * sigma)
    d2 = (oux - ex) ** 2 + (ovy - ey) ** 2                    # (R, HWout)
    maps_ref[...] = jnp.exp(-d2 * inv).astype(maps_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6, 7))
def _fused_op(flat, in_hw, out_hw, temperature, sigma, align_corners,
              variant, interpret):
    n = flat.shape[0]
    in_total = in_hw[0] * in_hw[1]
    out_total = out_hw[0] * out_hw[1]
    r = _block_rows(n, max(in_total, out_total))
    kern = functools.partial(_fused_fwd_kernel, in_hw=in_hw, out_hw=out_hw,
                             temperature=temperature, sigma=sigma,
                             align_corners=align_corners, variant=variant)
    return pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((n, 2), jnp.float32),
                   jax.ShapeDtypeStruct((n, out_total), jnp.float32)),
        grid=(pl.cdiv(n, r),),
        in_specs=[_flat_spec(r, in_total)],
        out_specs=(_kp_spec(r), _flat_spec(r, out_total)),
        interpret=interpret,
    )(flat)


def _fused_fwd(flat, in_hw, out_hw, temperature, sigma, align_corners,
               variant, interpret):
    kp, maps = _fused_op(flat, in_hw, out_hw, temperature, sigma,
                         align_corners, variant, interpret)
    return (kp, maps), (flat, kp)


def _fused_bwd(in_hw, out_hw, temperature, sigma, align_corners, variant,
               interpret, res, grads):
    flat, kp = res
    g_kp, g_maps = grads
    n = flat.shape[0]
    out_total = out_hw[0] * out_hw[1]
    r = _block_rows(n, out_total)
    # dG → dkp via the raster backward kernel
    dkp_r = pl.pallas_call(
        functools.partial(_raster_bwd_kernel, hw=out_hw, sigma=sigma,
                          align_corners=align_corners),
        out_shape=jax.ShapeDtypeStruct((n, 2), jnp.float32),
        grid=(pl.cdiv(n, r),),
        in_specs=[_kp_spec(r), _flat_spec(r, out_total)],
        out_specs=_kp_spec(r),
        interpret=interpret,
    )(kp, g_maps)
    total = (g_kp + dkp_r).astype(jnp.float32)
    # dkp → dheatmap via the matching soft-argmax backward kernel
    in_total = in_hw[0] * in_hw[1]
    r2 = _block_rows(n, in_total)
    dh = pl.pallas_call(
        functools.partial(_SOFTMAX_BWD[variant], hw=in_hw,
                          temperature=temperature,
                          align_corners=align_corners),
        out_shape=jax.ShapeDtypeStruct((n, in_total), flat.dtype),
        grid=(pl.cdiv(n, r2),),
        in_specs=[_flat_spec(r2, in_total), _kp_spec(r2), _kp_spec(r2)],
        out_specs=_flat_spec(r2, in_total),
        interpret=interpret,
    )(flat, kp, total)
    return (dh,)


_fused_op.defvjp(_fused_fwd, _fused_bwd)


def softargmax_raster_fused(heatmaps: jnp.ndarray, out_height: int,
                            out_width: int, temperature: float = 1.0,
                            sigma: float = 0.1,
                            align_corners: bool = DEFAULT_ALIGN_CORNERS,
                            variant: str = "joint",
                            interpret: bool = False
                            ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(B, K, H, W) heatmaps → ((B, K, 2) coords, (B, K, Ho, Wo) Gaussians).

    Soft-argmax (either published variant) + isotropic raster in one fused
    kernel; exact match of ``spatial_softmax(variant=...)`` followed by
    ``gaussian_maps``.
    """
    b, k, h, w = heatmaps.shape
    flat = heatmaps.reshape(b * k, h * w)
    kp, maps = _fused_op(flat, (h, w), (int(out_height), int(out_width)),
                         float(temperature), float(sigma),
                         bool(align_corners), str(variant), bool(interpret))
    return kp.reshape(b, k, 2), maps.reshape(b, k, out_height, out_width)
