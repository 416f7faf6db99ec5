"""Fused Pallas soft-argmax: heatmaps → (x, y) in one VMEM pass.

SURVEY.md §2.2 kernel #1 / north star [B:5]: the XLA path materializes the
softmax probabilities in HBM and re-reads them for the coordinate
expectations; this kernel reads each heatmap tile once into VMEM, computes
max / exp / weighted reductions on the VPU, and writes two floats per
keypoint.

Layout (the part that matters on TPU): heatmaps are processed as a flat
``(N, H*W)`` matrix, N = B*K. The spatial plane lives entirely on the lane
axis — H*W is a multiple of 128 for every supported resolution (16²…256²) —
so reductions are native cross-lane ops and no tile padding is wasted (a
(R, H, W) 3-D block with W=64 would pad every row to 128 lanes and halve
effective bandwidth). Coordinate planes are decoded in-kernel from a flat
iota (ix = i mod W, iy = i div W); nothing but the heatmap crosses HBM.

Both published variants (joint 2-D and marginal) have custom VJPs whose
backwards are Pallas kernels too (softmax recomputed in-kernel — cheaper than
saving probabilities to HBM, which would defeat the fusion). Forward/backward
match ``keypoints_tpu.ops.spatial_softmax`` (the jnp oracle) to fp32
tolerance; see tests/test_kernels.py.

Mosaic constraints honored here: integer-only iota, no rank-1 intermediates,
no multi-axis keepdims reductions (layout-inference crash on this version).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from keypoints_tpu.coords import DEFAULT_ALIGN_CORNERS

_BLOCK_ROWS = 256


def _flat_coord_planes(h: int, w: int, align_corners: bool):
    """(1, H*W) x- and y-coordinate rows decoded from a flat integer iota."""
    i = jax.lax.broadcasted_iota(jnp.int32, (1, h * w), 1)
    iy = (i // w).astype(jnp.float32)
    ix = (i - (i // w) * w).astype(jnp.float32)
    if align_corners:
        ux = (-1.0 + 2.0 * ix / (w - 1)) if w > 1 else ix * 0.0
        vy = (-1.0 + 2.0 * iy / (h - 1)) if h > 1 else iy * 0.0
    else:
        ux = -1.0 + (2.0 * ix + 1.0) / w
        vy = -1.0 + (2.0 * iy + 1.0) / h
    return ux, vy


def _axis_vec(n: int, align_corners: bool) -> jnp.ndarray:
    """[-1, 1] coordinates along one axis as a (1, n) f32 row vector."""
    i = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1).astype(jnp.float32)
    if align_corners:
        return (-1.0 + 2.0 * i / (n - 1)) if n > 1 else jnp.zeros_like(i)
    return -1.0 + (2.0 * i + 1.0) / n


# --- joint 2-D variant (flat layout) ---------------------------------------

def _joint_fwd_kernel(h_ref, out_ref, *, hw, temperature, align_corners):
    x = h_ref[...].astype(jnp.float32) / temperature          # (R, HW)
    ux, vy = _flat_coord_planes(*hw, align_corners)
    m = jnp.max(x, axis=1, keepdims=True)                     # (R, 1)
    e = jnp.exp(x - m)
    s = jnp.sum(e, axis=1, keepdims=True)
    ex = jnp.sum(e * ux, axis=1, keepdims=True) / s           # (R, 1)
    ey = jnp.sum(e * vy, axis=1, keepdims=True) / s
    out_ref[...] = jnp.concatenate([ex, ey], axis=1)


def _joint_bwd_kernel(h_ref, kp_ref, g_ref, out_ref, *, hw, temperature,
                      align_corners):
    x = h_ref[...].astype(jnp.float32) / temperature
    ux, vy = _flat_coord_planes(*hw, align_corners)
    m = jnp.max(x, axis=1, keepdims=True)
    e = jnp.exp(x - m)
    p = e / jnp.sum(e, axis=1, keepdims=True)                 # (R, HW)
    kp = kp_ref[...]                                          # (R, 2)
    g = g_ref[...]
    out_ref[...] = (p * (g[:, 0:1] * (ux - kp[:, 0:1])
                         + g[:, 1:2] * (vy - kp[:, 1:2]))
                    / temperature).astype(out_ref.dtype)


# --- marginal variant (3-D blocks) ------------------------------------------
# The marginal form needs row sums over H and column sums over W; on the flat
# layout the H-reduction is a stride-W lane segment sum, and Mosaic rejects
# the lane-splitting reshape (R, HW)->(R*H, W) ("unsupported shape cast").
# So this variant keeps (R, H, W) blocks: H on sublanes, W on lanes — both
# marginals are then native single-axis reductions. W<128 pads lanes, but the
# marginal math is one pass over the data either way.

def _marginal_fwd_kernel(h_ref, out_ref, *, temperature, align_corners):
    x = h_ref[...].astype(jnp.float32)                        # (R, H, W)
    _, hh, ww = x.shape
    hx = jnp.sum(x, axis=1) / temperature                     # (R, W)
    hy = jnp.sum(x, axis=2) / temperature                     # (R, H)
    px = jax.nn.softmax(hx, axis=-1)
    py = jax.nn.softmax(hy, axis=-1)
    ex = jnp.sum(px * _axis_vec(ww, align_corners), axis=1, keepdims=True)
    ey = jnp.sum(py * _axis_vec(hh, align_corners), axis=1, keepdims=True)
    out_ref[...] = jnp.concatenate([ex, ey], axis=1)


def _marginal_bwd_kernel(h_ref, kp_ref, g_ref, out_ref, *, temperature,
                         align_corners):
    x = h_ref[...].astype(jnp.float32)                        # (R, H, W)
    _, hh, ww = x.shape
    hx = jnp.sum(x, axis=1) / temperature
    hy = jnp.sum(x, axis=2) / temperature
    px = jax.nn.softmax(hx, axis=-1)                          # (R, W)
    py = jax.nn.softmax(hy, axis=-1)                          # (R, H)
    kp = kp_ref[...]
    g = g_ref[...]
    dx = px * (_axis_vec(ww, align_corners) - kp[:, 0:1]) * g[:, 0:1] \
        / temperature                                         # (R, W)
    dy = py * (_axis_vec(hh, align_corners) - kp[:, 1:2]) * g[:, 1:2] \
        / temperature                                         # (R, H)
    out_ref[...] = (dx[:, None, :] + dy[:, :, None]).astype(out_ref.dtype)


# --- pallas_call plumbing ---------------------------------------------------

def _flat_spec(block_rows, hw_total):
    return pl.BlockSpec((block_rows, hw_total), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _vol_spec(block_rows, h, w):
    return pl.BlockSpec((block_rows, h, w), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _kp_spec(block_rows):
    return pl.BlockSpec((block_rows, 2), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _block_rows(n: int, hw_total: int = 4096) -> int:
    # ≥2 blocks in the grid so Mosaic double-buffers the row DMA against
    # compute, and block bytes capped so in+out tiles (+double buffers)
    # stay inside the 16 MB VMEM: 4 buffers × rows × hw × 4 B ≤ ~8 MB.
    by_bytes = max(8, (8 << 20) // (4 * 4 * hw_total) // 8 * 8)
    # every candidate must be a multiple of 8 (Mosaic sublane tiling) —
    # n//2 alone would give e.g. 10 for n=20 and fail to compile; when
    # n < 16 the block equals the array's row dim, which Mosaic allows.
    half = max(8, n // 2 // 8 * 8) if n >= 16 else n
    return max(8, min(_BLOCK_ROWS, by_bytes, half)) if n >= 16 else n


def _make_op(fwd_kernel, bwd_kernel, flat_layout):
    """Build the custom-vjp op; ``flat_layout`` picks (N,HW) vs (N,H,W)."""

    def specs(n, h, w, r):
        if flat_layout:
            return _flat_spec(r, h * w), (n, h * w)
        return _vol_spec(r, h, w), (n, h, w)

    @functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
    def op(heatmaps, hw, temperature, align_corners, interpret):
        h, w = hw
        n = heatmaps.shape[0]
        r = _block_rows(n, h * w)
        kern = functools.partial(fwd_kernel, temperature=temperature,
                                 align_corners=align_corners)
        if flat_layout:
            kern = functools.partial(kern, hw=hw)
        data_spec, shape = specs(n, h, w, r)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((n, 2), jnp.float32),
            grid=(pl.cdiv(n, r),),
            in_specs=[data_spec],
            out_specs=_kp_spec(r),
            interpret=interpret,
        )(heatmaps.reshape(shape))

    def fwd(heatmaps, hw, temperature, align_corners, interpret):
        kp = op(heatmaps, hw, temperature, align_corners, interpret)
        return kp, (heatmaps, kp)

    def bwd(hw, temperature, align_corners, interpret, res, g):
        heatmaps, kp = res
        h, w = hw
        n = heatmaps.shape[0]
        r = _block_rows(n, h * w)
        kern = functools.partial(bwd_kernel, temperature=temperature,
                                 align_corners=align_corners)
        if flat_layout:
            kern = functools.partial(kern, hw=hw)
        data_spec, shape = specs(n, h, w, r)
        dh = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(shape, heatmaps.dtype),
            grid=(pl.cdiv(n, r),),
            in_specs=[data_spec, _kp_spec(r), _kp_spec(r)],
            out_specs=data_spec,
            interpret=interpret,
        )(heatmaps.reshape(shape), kp, g)
        return (dh.reshape(heatmaps.shape),)

    op.defvjp(fwd, bwd)
    return op


_joint_op = _make_op(_joint_fwd_kernel, _joint_bwd_kernel, flat_layout=True)
_marginal_op = _make_op(_marginal_fwd_kernel, _marginal_bwd_kernel,
                        flat_layout=False)


def spatial_softmax_pallas(heatmaps: jnp.ndarray, temperature: float = 1.0,
                           variant: str = "marginal",
                           align_corners: bool = DEFAULT_ALIGN_CORNERS,
                           interpret: bool = False) -> jnp.ndarray:
    """Fused soft-argmax: (B, K, H, W) → (B, K, 2) in [-1, 1], (x, y) order.

    Drop-in replacement for :func:`keypoints_tpu.ops.spatial_softmax`.
    ``interpret=True`` runs the kernel in interpreter mode (CPU tests).
    """
    b, k, h, w = heatmaps.shape
    flat = heatmaps.reshape(b * k, h * w)
    op = {"joint": _joint_op, "marginal": _marginal_op}[variant]
    kp = op(flat, (h, w), float(temperature), bool(align_corners),
            bool(interpret))
    return kp.reshape(b, k, 2)
