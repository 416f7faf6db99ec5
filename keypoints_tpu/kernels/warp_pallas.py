"""Fused Pallas bilinear warp — the grid_sample gather without XLA's gather.

SURVEY.md §2.2 kernel #3 / [B:5] "never round-trip through HBM-unfriendly
gather/scatter": XLA lowers ``grid_sample``'s 2-D gather to element-at-a-time
loops (~0.4 G elems/s measured on v5e — 64 ms for a 128×3×128² batch, 4×
the cost of the whole model fwd+bwd). This kernel does the same math with
TPU-native primitives:

* the **x (lane) gather** uses Mosaic's within-tile dynamic lane shuffle
  (``take_along_axis(..., axis=-1)``), gathering all C·H rows at once for
  the two x-corners of one output row;
* the **y (sublane) gather** — unsupported in Mosaic — is replaced by a
  mask-reduce: ``Σ_h [h==y0]·(…)`` over the already-x-interpolated column
  stack. That's H multiply-adds per output pixel on the VPU, which at
  H=128 is still ~50× cheaper than XLA's scalar gather.

Widths beyond one 128-lane tile (the Mosaic lane gather is within-tile)
are handled by gathering per (input-tile × output-chunk) pair with selects —
supported up to 512 (2× gather cost at 256², the widest shipped config).
Forward-only: augmentation is data, nothing differentiates through it (the
differentiable op is ``ops.warp.grid_sample``).

Semantics match ``torch.nn.functional.grid_sample`` (bilinear,
padding_mode ∈ {zeros, border}, explicit align_corners) exactly — verified
against the jnp oracle (itself torch-verified) in tests/test_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from keypoints_tpu.coords import DEFAULT_ALIGN_CORNERS

MAX_LANES = 128


def _unnormalize(coord, size, align_corners):
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return (coord + 1.0) * 0.5 * size - 0.5


_ROWS_PER_PROGRAM = 8  # out-block second-to-last dim must be divisible by 8


def _warp_kernel(img_ref, gx_ref, gy_ref, out_ref, *, padding_mode,
                 align_corners, y_window):
    """One program per (batch, 8-output-row block): the image block's
    index_map is constant across the row dimension, so Mosaic keeps it
    resident in VMEM while only the small grid/out row blocks stream.

    All index math is vectorized over the whole (rows, Wo) block up front —
    per-row work is only the gather + windowed mask-reduce."""
    _, c, h, w = img_ref.shape
    _, rows, wo = gx_ref.shape

    ix = _unnormalize(gx_ref[0], w, align_corners)        # (rows, Wo)
    iy = _unnormalize(gy_ref[0], h, align_corners)
    if padding_mode == "border":
        ix = jnp.clip(ix, 0.0, w - 1)
        iy = jnp.clip(iy, 0.0, h - 1)
    x0f = jnp.floor(ix)
    y0f = jnp.floor(iy)
    fx = ix - x0f
    fy = iy - y0f
    x0 = jnp.clip(x0f, 0, w - 1).astype(jnp.int32)
    x1 = jnp.clip(x0f + 1.0, 0, w - 1).astype(jnp.int32)
    y0 = jnp.clip(y0f, 0.0, h - 1).astype(jnp.int32)
    y1 = jnp.clip(y0f + 1.0, 0.0, h - 1).astype(jnp.int32)

    if padding_mode == "zeros":
        wx0 = jnp.where((x0f >= 0) & (x0f <= w - 1), 1.0 - fx, 0.0)
        wx1 = jnp.where((x0f + 1 >= 0) & (x0f + 1 <= w - 1), fx, 0.0)
        wy0 = jnp.where((y0f >= 0) & (y0f <= h - 1), 1.0 - fy, 0.0)
        wy1 = jnp.where((y0f + 1 >= 0) & (y0f + 1 <= h - 1), fy, 0.0)
    else:
        wx0, wx1, wy0, wy1 = 1.0 - fx, fx, 1.0 - fy, fy

    # vertical window shared by the whole 8-row block
    if y_window is not None and y_window < h:
        win = y_window
        align = 16 if img_ref.dtype == jnp.bfloat16 else 8
        start = jnp.clip(jnp.min(y0f).astype(jnp.int32), 0, h - win)
        start = pl.multiple_of((start // align) * align, align)
    else:
        win = h
        start = 0
    img2 = (img_ref[0, :, pl.ds(start, win), :]
            .reshape(c * win, w).astype(jnp.float32))

    iota_h = jax.lax.broadcasted_iota(jnp.int32, (1, win, 1), 1) + start
    # (rows, 1, Wo) expansions done once: the per-row slice below must be a
    # plain lax.slice (mixed None/slice getitem lowers to a gather Mosaic
    # rejects).
    y0e = y0[:, None, :]
    y1e = y1[:, None, :]
    wy0e = wy0[:, None, :]
    wy1e = wy1[:, None, :]

    def gather_tiled(idx_t):
        """(C·win, chunk) gather honoring the one-lane-tile source limit."""
        acc = None
        for ji in range(0, w, MAX_LANES):
            ji_end = min(ji + MAX_LANES, w)
            local = jnp.clip(idx_t - ji, 0, ji_end - ji - 1)
            part = jnp.take_along_axis(img2[:, ji:ji_end], local, axis=1)
            if acc is None:
                acc = part
                if w > MAX_LANES:
                    acc = jnp.where(idx_t < ji_end, part, 0.0)
            else:
                acc = jnp.where((idx_t >= ji) & (idx_t < ji_end), part, acc)
        return acc

    for r in range(rows):
        hx = None
        for jo in range(0, wo, MAX_LANES):
            jo_end = min(jo + MAX_LANES, wo)
            span = jo_end - jo
            i0 = jnp.broadcast_to(x0[r:r + 1, jo:jo_end], (c * win, span))
            i1 = jnp.broadcast_to(x1[r:r + 1, jo:jo_end], (c * win, span))
            chunk = (gather_tiled(i0) * wx0[r:r + 1, jo:jo_end]
                     + gather_tiled(i1) * wx1[r:r + 1, jo:jo_end])
            hx = chunk if hx is None else jnp.concatenate([hx, chunk], axis=1)
        hx = hx.reshape(c, win, wo)
        sl = lambda a: jax.lax.slice_in_dim(a, r, r + 1, axis=0)
        wv = ((iota_h == sl(y0e)).astype(jnp.float32) * sl(wy0e)
              + (iota_h == sl(y1e)).astype(jnp.float32) * sl(wy1e))
        out_ref[0, :, r, :] = jnp.sum(hx * wv, axis=1).astype(out_ref.dtype)


def warp_bilinear_pallas(image: jnp.ndarray, grid: jnp.ndarray,
                         padding_mode: str = "zeros",
                         align_corners: bool = DEFAULT_ALIGN_CORNERS,
                         y_window: int | None = None,
                         interpret: bool = False) -> jnp.ndarray:
    """Fused bilinear sampling: image (B,C,H,W), grid (B,Ho,Wo,2) → (B,C,Ho,Wo).

    Forward-only (see module docstring); W and Wo must be ≤512.

    ``y_window``: optional static bound on the vertical source spread of any
    single output row (in pixels, rounded up to a multiple of 8 internally).
    When the caller can guarantee ``max_j y(i,j) - min_j y(i,j) + 2 <=
    y_window`` (augment.py derives this from its WarpConfig), the vertical
    reduce runs over a y_window-row band instead of all H — ~H/y_window
    faster. Source rows outside the band contribute zero, so an
    under-estimated window silently degrades: only pass a proven bound.
    """
    b, c, h, w = image.shape
    _, ho, wo, _ = grid.shape
    if w > 4 * MAX_LANES or wo > 4 * MAX_LANES:
        raise ValueError(f"warp_bilinear_pallas supports W,Wo<=512; got "
                         f"{w},{wo} (use ops.warp.grid_sample)")
    if padding_mode not in ("zeros", "border"):
        raise ValueError(f"unsupported padding_mode {padding_mode!r}")
    if ho % _ROWS_PER_PROGRAM:
        raise ValueError(f"output height must be a multiple of "
                         f"{_ROWS_PER_PROGRAM}; got {ho}")

    if y_window is not None:
        # The window is shared by an 8-output-row block, so add the block's
        # own vertical span (rows map to ≈(1+scale) source rows each; 2x
        # margin) plus the tile-alignment slack, then round up.
        a = 16 if image.dtype == jnp.bfloat16 else 8
        pad = 2 * _ROWS_PER_PROGRAM + a
        y_window = min(h, max(a, -(-(int(y_window) + pad) // a) * a))
    kern = functools.partial(_warp_kernel, padding_mode=padding_mode,
                             align_corners=align_corners, y_window=y_window)
    # The grid is passed as separate x / y planes: a trailing dim of 2 gets a
    # T(2,128) tiled layout that forces a 2x full-grid relayout copy in front
    # of the custom call (measured 1.7 ms each at 128²/b128).
    grid = jax.lax.stop_gradient(grid)
    row_spec = pl.BlockSpec((1, _ROWS_PER_PROGRAM, wo),
                            lambda bi, i: (bi, i, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, c, ho, wo), image.dtype),
        grid=(b, ho // _ROWS_PER_PROGRAM),
        in_specs=[
            pl.BlockSpec((1, c, h, w), lambda bi, i: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            row_spec, row_spec,
        ],
        out_specs=pl.BlockSpec((1, c, _ROWS_PER_PROGRAM, wo),
                               lambda bi, i: (bi, 0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(image, grid[..., 0], grid[..., 1])
    return jax.lax.stop_gradient(out)
