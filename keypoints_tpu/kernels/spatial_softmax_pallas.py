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

def _joint_extract(x, hw, align_corners):
    """x = logits/T as (R, HW) → (ex, ey) each (R, 1). Shared by the
    standalone kernel and the fused bottleneck."""
    ux, vy = _flat_coord_planes(*hw, align_corners)
    m = jnp.max(x, axis=1, keepdims=True)                     # (R, 1)
    e = jnp.exp(x - m)
    s = jnp.sum(e, axis=1, keepdims=True)
    ex = jnp.sum(e * ux, axis=1, keepdims=True) / s           # (R, 1)
    ey = jnp.sum(e * vy, axis=1, keepdims=True) / s
    return ex, ey


def _joint_fwd_kernel(h_ref, out_ref, *, hw, temperature, align_corners):
    x = h_ref[...].astype(jnp.float32) / temperature          # (R, HW)
    ex, ey = _joint_extract(x, hw, align_corners)
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


# --- marginal variant (flat layout, MXU-gathered marginals) -----------------
# The marginal form needs column sums over H (a stride-W lane segment sum)
# and row sums over W (contiguous W-lane segments). Mosaic rejects the
# lane-splitting reshape (R, HW)->(R*H, W); a (R, H, W) 3-D block pads W<128
# lanes (measured 2.9x slower than XLA); and a circular-roll tree costs
# ~log2(HW) full VPU passes (measured ~5x the single-HBM-read floor). The
# TPU-native answer: the marginal sums are MATMULS against 0/1 indicator
# matrices built in-kernel from iota compares —
#
#     hx = X @ Sx,  Sx[i, x] = [i mod W == x]      (R,HW)@(HW,W) -> (R,W)
#     hy = X @ Sy,  Sy[i, y] = [i div W == y]      (R,HW)@(HW,H) -> (R,H)
#
# one HBM read of the heatmap, a few hundred MFLOPs on the otherwise-idle
# MXU, then tiny softmax-expectations on (R, W)/(R, H). The backward
# broadcasts px/py back to (R, HW) the same way (px @ Sxᵀ).

def _marginal_selectors(h, w, dtype=jnp.float32):
    """(HW, W) and (HW, H) 0/1 marginal-sum indicator matrices."""
    i = jax.lax.broadcasted_iota(jnp.int32, (h * w, max(h, w)), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (h * w, max(h, w)), 1)
    iy = i // w
    ix = i - iy * w
    sx = (ix == j)[:, :w].astype(dtype)
    sy = (iy == j)[:, :h].astype(dtype)
    return sx, sy


def _marginal_stats(x, hw, align_corners):
    """x = logits/T as (R, HW) → (px (R,W), py (R,H), xs, ys, ex, ey)."""
    h, w = hw
    sx, sy = _marginal_selectors(h, w)
    # HIGHEST precision: the MXU's default bf16 input rounding costs ~4e-2
    # coordinate error (measured on v5e) — far over the 1e-3 parity bar.
    hx = jax.lax.dot_general(x, sx, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)  # (R, W)
    hy = jax.lax.dot_general(x, sy, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)  # (R, H)
    px = jax.nn.softmax(hx, axis=-1)
    py = jax.nn.softmax(hy, axis=-1)
    xs = _axis_vec(w, align_corners)                          # (1, W)
    ys = _axis_vec(h, align_corners)                          # (1, H)
    ex = jnp.sum(px * xs, axis=1, keepdims=True)              # (R, 1)
    ey = jnp.sum(py * ys, axis=1, keepdims=True)
    return px, py, xs, ys, ex, ey


def _marginal_extract(x, hw, align_corners):
    """x = logits/T as (R, HW) → (ex, ey) each (R, 1)."""
    _, _, _, _, ex, ey = _marginal_stats(x, hw, align_corners)
    return ex, ey


def _marginal_fwd_kernel(h_ref, out_ref, *, hw, temperature, align_corners):
    x = h_ref[...].astype(jnp.float32) / temperature          # (R, HW)
    ex, ey = _marginal_extract(x, hw, align_corners)
    out_ref[...] = jnp.concatenate([ex, ey], axis=1)


def _marginal_bwd_kernel(h_ref, kp_ref, g_ref, out_ref, *, hw, temperature,
                         align_corners):
    h, w = hw
    x = h_ref[...].astype(jnp.float32) / temperature          # (R, HW)
    sx, sy = _marginal_selectors(h, w)
    px, py, xs, ys, _, _ = _marginal_stats(x, hw, align_corners)
    kp = kp_ref[...]                                          # (R, 2)
    g = g_ref[...]
    # d ex / d v[y, x] = px[x]·(xs[x] − ex) / T — assemble the per-axis
    # factors at marginal width, then broadcast to (R, HW) via Sᵀ matmuls.
    fx = g[:, 0:1] * px * (xs - kp[:, 0:1])                   # (R, W)
    fy = g[:, 1:2] * py * (ys - kp[:, 1:2])                   # (R, H)
    bx = jax.lax.dot_general(fx, sx, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)  # (R, HW)
    by = jax.lax.dot_general(fy, sy, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
    out_ref[...] = ((bx + by) / temperature).astype(out_ref.dtype)


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
                        flat_layout=True)


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
