"""Measured-negative / measured-tie warp kernels — records, NOT dispatched.

Relocated out of ``warp_pallas.py`` so the shipped dispatch surface stays
lean (VERDICT r2 weak #5): nothing here is reachable from
``keypoints_tpu.kernels`` dispatchers. Each kernel is kept, with its
exactness test (tests/test_experimental_kernels.py), as the measured record
of a design that LOST to the shipped block-window mask-reduce kernel:

* ``warp_bilinear_rowwin`` — per-row source windows + ``pl.when`` chunk
  predication: 7.04 ms vs 1.65 ms at celeba128 shapes (4× slower; dynamic
  per-(row×chunk) ref slices copy ~6× more VMEM and predication breaks
  Mosaic's DMA/compute pipelining).
* ``warp_bilinear_tree`` — binary-select-tree y-select: 2.072 ms vs
  2.055 ms (dead heat; ~2.5× fewer VPU ops on paper, but the mask-reduce's
  independent FMAs pipeline as well as the tree's serially-dependent select
  levels, and the shared x-gathers bound both).

See docs/ROADMAP.md "Measured leads" #2 for the full design-space history.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from keypoints_tpu.coords import DEFAULT_ALIGN_CORNERS
from keypoints_tpu.kernels.warp_pallas import (MAX_LANES, _ROWS_PER_PROGRAM,
                                               _grid_math, _unpack_even,
                                               _unpack_odd)

_CHUNK = 16  # image rows per predicated chunk (one packed f32 sublane tile)


def _y_corners(y0f, iy, h, padding_mode):
    """Eq-mask y corners/weights from ``_grid_math``'s (y0f, iy) — the
    pre-tent formulation these recorded kernels were measured with (the
    shipped kernels now fold the y-select into a tent weight)."""
    fy = iy - y0f
    y0 = jnp.clip(y0f, 0.0, h - 1).astype(jnp.int32)
    y1 = jnp.clip(y0f + 1.0, 0.0, h - 1).astype(jnp.int32)
    if padding_mode == "zeros":
        wy0 = jnp.where((y0f >= 0) & (y0f <= h - 1), 1.0 - fy, 0.0)
        wy1 = jnp.where((y0f + 1 >= 0) & (y0f + 1 <= h - 1), fy, 0.0)
    else:
        wy0, wy1 = 1.0 - fy, fy
    return y0, y1, wy0, wy1


def _tree_select(v, idx, n):
    """Per-lane sublane gather as a binary select tree: v (C, n, L) with n a
    power of two, idx (1, L) in [0, n) → (C, 1, L) holding v[:, idx[l], l].

    Straight-line: log2(n) levels of static slice + ``where`` — no dynamic
    slices, no predication (the two schedules Mosaic punished in
    ``_warp_kernel_rowwin``)."""
    while n > 1:
        half = n // 2
        top = jax.lax.slice_in_dim(v, 0, half, axis=1)
        bot = jax.lax.slice_in_dim(v, half, n, axis=1)
        cond = (idx & half) != 0                          # high bit first
        v = jnp.where(cond[:, None, :], bot, top)
        n = half
    return v


def _warp_kernel_tree(img_ref, gx_ref, gy_ref, out_ref, *, padding_mode,
                      align_corners, y_window):
    """MEASURED TIE — see module docstring; entry: ``warp_bilinear_tree``.

    Packed warp with a binary-select-TREE y-select instead of the
    mask-reduce: the x-gathered packed columns collapse to the two needed
    source rows via two select trees (each packed f32 word holds rows
    2r/2r+1, so the y0-word and y1-word trees cover all four bilinear
    corners), then unpack/interp run on single rows."""
    _, c, hp, w = img_ref.shape
    h = 2 * hp
    _, rows, wo = gx_ref.shape
    x0, x1, wx0, wx1, y0f, iy = _grid_math(
        gx_ref[0], gy_ref[0], h, w, padding_mode, align_corners)
    y0, y1, wy0, wy1 = _y_corners(y0f, iy, h, padding_mode)
    data_t = jnp.float32
    wx0 = wx0.astype(data_t)
    wx1 = wx1.astype(data_t)
    wy0 = wy0.astype(data_t)
    wy1 = wy1.astype(data_t)

    if y_window is not None and y_window < h:
        win = y_window
        start = jnp.clip(jnp.min(y0f).astype(jnp.int32), 0, h - win)
        start = pl.multiple_of((start // 16) * 16, 16)
    else:
        win = h
        start = 0
    win_p = win // 2
    start_p = start // 2
    # Windowed: n STRICTLY greater than win_p, so a clamped out-of-window
    # index lands on a zero-pad row and contributes zero, exactly like the
    # mask-reduce path's zero weights (with n == win_p and win_p a power of
    # two it would select the last REAL row — ADVICE r2 #2). Full window:
    # y0,y1 ≤ h-1 ⇒ packed indices ≤ win_p-1 — clamping can never exceed
    # the window, and padding there would DOUBLE the tree whenever win_p is
    # a power of two, invalidating the recorded tie measurement.
    min_n = win_p + 1 if win < h else win_p
    n = 1
    while n < min_n:
        n *= 2
    img2 = img_ref[0, :, pl.ds(start_p, win_p), :].reshape(c * win_p, w)

    def gather_tiled(idx_t):
        acc = None
        for ji in range(0, w, MAX_LANES):
            ji_end = min(ji + MAX_LANES, w)
            local = jnp.clip(idx_t - ji, 0, ji_end - ji - 1)
            part = jnp.take_along_axis(img2[:, ji:ji_end], local, axis=1)
            if acc is None:
                acc = part
                if w > MAX_LANES:
                    acc = jnp.where(idx_t < ji_end, part,
                                    jnp.zeros_like(part))
            else:
                acc = jnp.where((idx_t >= ji) & (idx_t < ji_end), part, acc)
        return acc

    pad = n - win_p
    for r in range(rows):
        sl = lambda a: jax.lax.slice_in_dim(a, r, r + 1, axis=0)
        i0 = jnp.broadcast_to(sl(x0), (c * win_p, wo))
        i1 = jnp.broadcast_to(sl(x1), (c * win_p, wo))
        g = jnp.concatenate([gather_tiled(i0), gather_tiled(i1)], axis=0)
        g = g.reshape(2 * c, win_p, wo)
        if pad:
            g = jnp.concatenate(
                [g, jnp.zeros((2 * c, pad, wo), g.dtype)], axis=1)
        y0r, y1r = sl(y0), sl(y1)
        # out-of-window rows clamp INTO the zero padding (n > win_p above),
        # so they contribute zero like the mask path.
        a_idx = jnp.clip((y0r >> 1) - start_p, 0, n - 1)
        b_idx = jnp.clip((y1r >> 1) - start_p, 0, n - 1)
        wa = _tree_select(g, a_idx, n)                    # (2c, 1, wo)
        wb = _tree_select(g, b_idx, n)
        odd0 = (y0r & 1)[:, None, :] == 1
        odd1 = (y1r & 1)[:, None, :] == 1
        row0 = jnp.where(odd0, _unpack_odd(wa), _unpack_even(wa))
        row1 = jnp.where(odd1, _unpack_odd(wb), _unpack_even(wb))
        row0 = row0.reshape(2, c, wo)
        row1 = row1.reshape(2, c, wo)
        hx0 = row0[0] * sl(wx0) + row0[1] * sl(wx1)       # (c, wo) at y0
        hx1 = row1[0] * sl(wx0) + row1[1] * sl(wx1)       # (c, wo) at y1
        out = hx0 * sl(wy0) + hx1 * sl(wy1)
        out_ref[0, :, r, :] = out.astype(out_ref.dtype)


def warp_bilinear_tree(image: jnp.ndarray, grid: jnp.ndarray,
                       padding_mode: str = "zeros",
                       align_corners: bool = DEFAULT_ALIGN_CORNERS,
                       y_window: int | None = None,
                       interpret: bool = False) -> jnp.ndarray:
    """Test/bench entry for the measured-tie select-tree kernel.

    Requires bf16 ``image`` with even H (the packed row-pair layout);
    W, Wo ≤ 512, Ho a multiple of 8. Semantics match ``warp_bilinear_pallas``.
    """
    b, c, h, w = image.shape
    _, ho, wo, _ = grid.shape
    if image.dtype != jnp.bfloat16 or h % 2:
        raise ValueError("warp_bilinear_tree needs bf16 images with even H")
    if w > 4 * MAX_LANES or wo > 4 * MAX_LANES:
        raise ValueError(f"W,Wo<=512 required; got {w},{wo}")
    if padding_mode not in ("zeros", "border"):
        raise ValueError(f"unsupported padding_mode {padding_mode!r}")
    if ho % _ROWS_PER_PROGRAM:
        raise ValueError(f"output height must be a multiple of "
                         f"{_ROWS_PER_PROGRAM}; got {ho}")
    if y_window is not None:
        a = 16
        pad = 2 * _ROWS_PER_PROGRAM + a
        y_window = min(h, max(a, -(-(int(y_window) + pad) // a) * a))
        if y_window % 2:
            y_window += 1
    img_in = jax.lax.bitcast_convert_type(
        image.reshape(b, c, h // 2, 2, w).transpose(0, 1, 2, 4, 3),
        jnp.float32)                                       # (B, C, H/2, W)
    grid = jax.lax.stop_gradient(grid)
    kern = functools.partial(_warp_kernel_tree, padding_mode=padding_mode,
                             align_corners=align_corners, y_window=y_window)
    row_spec = pl.BlockSpec((1, _ROWS_PER_PROGRAM, wo),
                            lambda bi, i: (bi, i, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, c, ho, wo), image.dtype),
        grid=(b, ho // _ROWS_PER_PROGRAM),
        in_specs=[
            pl.BlockSpec((1, c, h // 2, w), lambda bi, i: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            row_spec, row_spec,
        ],
        out_specs=pl.BlockSpec((1, c, _ROWS_PER_PROGRAM, wo),
                               lambda bi, i: (bi, 0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(img_in, grid[..., 0], grid[..., 1])
    return jax.lax.stop_gradient(out)


def _warp_kernel_rowwin(img_ref, gx_ref, gy_ref, out_ref, acc_ref, *,
                        padding_mode, align_corners, win):
    """MEASURED NEGATIVE — see module docstring; entry:
    ``warp_bilinear_rowwin``.

    Packed warp with PER-ROW source windows and chunk predication: each
    output row places its own ``win``-row window at its actual minimum
    source row and skips 16-row chunks past its actual maximum with
    ``pl.when`` — on paper the mask-reduce/x-interp work tracks the REAL
    per-row spread (~15–25 rows at celeba128) instead of the block-shared
    worst case (80)."""
    _, c, hp, w = img_ref.shape
    h = 2 * hp
    _, rows, wo = gx_ref.shape
    x0, x1, wx0, wx1, y0f, iy = _grid_math(
        gx_ref[0], gy_ref[0], h, w, padding_mode, align_corners)
    y0, y1, wy0, wy1 = _y_corners(y0f, iy, h, padding_mode)
    data_t = jnp.float32
    y0e = y0[:, None, :]
    y1e = y1[:, None, :]
    wy0e = wy0[:, None, :].astype(data_t)
    wy1e = wy1[:, None, :].astype(data_t)
    wx0 = wx0.astype(data_t)
    wx1 = wx1.astype(data_t)
    cp = _CHUNK // 2                                       # packed rows/chunk
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (1, cp, 1), 1)

    for r in range(rows):
        sl = lambda a: jax.lax.slice_in_dim(a, r, r + 1, axis=0)
        start = jnp.clip(jnp.min(sl(y0f)).astype(jnp.int32), 0, h - win)
        start = pl.multiple_of((start // _CHUNK) * _CHUNK, _CHUNK)
        last = jnp.max(sl(y1))                             # row's real extent
        i0 = jnp.broadcast_to(sl(x0), (c * cp, wo))
        i1 = jnp.broadcast_to(sl(x1), (c * cp, wo))
        acc_ref[...] = jnp.zeros_like(acc_ref)

        def chunk_body(k):
            start_p = pl.multiple_of(start // 2, cp)
            img2 = (img_ref[0, :, pl.ds(start_p + k * cp, cp), :]
                    .reshape(c * cp, w))
            g0 = jnp.take_along_axis(img2, i0, axis=1)
            g1 = jnp.take_along_axis(img2, i1, axis=1)
            hx_e = (_unpack_even(g0) * sl(wx0)
                    + _unpack_even(g1) * sl(wx1)).reshape(c, cp, wo)
            hx_o = (_unpack_odd(g0) * sl(wx0)
                    + _unpack_odd(g1) * sl(wx1)).reshape(c, cp, wo)
            iota_h = 2 * iota_p + (start + k * _CHUNK)
            wv_e = ((iota_h == sl(y0e)).astype(data_t) * sl(wy0e)
                    + (iota_h == sl(y1e)).astype(data_t) * sl(wy1e))
            wv_o = ((iota_h + 1 == sl(y0e)).astype(data_t) * sl(wy0e)
                    + (iota_h + 1 == sl(y1e)).astype(data_t) * sl(wy1e))
            part = jnp.sum(hx_e * wv_e + hx_o * wv_o, axis=1)  # (c, wo)
            acc_ref[0:c, :] = acc_ref[0:c, :] + part

        chunk_body(0)                    # start ≤ row min ⇒ always touched
        for k in range(1, win // _CHUNK):
            @pl.when(start + k * _CHUNK <= last)
            def _(k=k):
                chunk_body(k)
        out_ref[0, :, r, :] = acc_ref[0:c, :].astype(out_ref.dtype)


def warp_bilinear_rowwin(image: jnp.ndarray, grid: jnp.ndarray,
                         padding_mode: str = "zeros",
                         align_corners: bool = DEFAULT_ALIGN_CORNERS,
                         y_window: int = 32,
                         interpret: bool = False) -> jnp.ndarray:
    """Test/bench entry for the measured-negative row-window kernel.

    Requires bf16 ``image``, W,Wo ≤ 128, H a multiple of 16, C ≤ 8, and a
    proven per-row ``y_window`` bound. See ``_warp_kernel_rowwin``.
    """
    b, c, h, w = image.shape
    _, ho, wo, _ = grid.shape
    assert image.dtype == jnp.bfloat16 and h % _CHUNK == 0 and c <= 8
    assert w <= MAX_LANES and wo <= MAX_LANES and ho % _ROWS_PER_PROGRAM == 0
    # +_CHUNK margin BEFORE rounding: the per-row start is rounded DOWN to a
    # 16-row boundary (losing up to 15 rows of window), so the rounded
    # window must still cover y_window+15 rows past the row's min y0 plus
    # the trailing y1 — +14 under-covered by up to 2 rows (ADVICE r2 #1).
    win = min(h, -(-(int(y_window) + _CHUNK) // _CHUNK) * _CHUNK)
    img_in = jax.lax.bitcast_convert_type(
        image.reshape(b, c, h // 2, 2, w).transpose(0, 1, 2, 4, 3),
        jnp.float32)                                       # (B, C, H/2, W)
    grid = jax.lax.stop_gradient(grid)
    row_spec = pl.BlockSpec((1, _ROWS_PER_PROGRAM, wo),
                            lambda bi, i: (bi, i, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_warp_kernel_rowwin, padding_mode=padding_mode,
                          align_corners=align_corners, win=win),
        out_shape=jax.ShapeDtypeStruct((b, c, ho, wo), image.dtype),
        grid=(b, ho // _ROWS_PER_PROGRAM),
        in_specs=[
            pl.BlockSpec((1, c, h // 2, w), lambda bi, i: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            row_spec, row_spec,
        ],
        out_specs=pl.BlockSpec((1, c, _ROWS_PER_PROGRAM, wo),
                               lambda bi, i: (bi, 0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, wo), jnp.float32)],
        interpret=interpret,
    )(img_in, grid[..., 0], grid[..., 1])
    return jax.lax.stop_gradient(out)
