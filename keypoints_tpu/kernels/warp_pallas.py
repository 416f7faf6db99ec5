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


def _unpack_even(word_f32):
    """Packed (bf16 row2r | bf16 row2r+1 << 16) f32 word → row 2r as f32."""
    bits = jax.lax.bitcast_convert_type(word_f32, jnp.int32)
    return jax.lax.bitcast_convert_type(bits << 16, jnp.float32)


def _unpack_odd(word_f32):
    bits = jax.lax.bitcast_convert_type(word_f32, jnp.int32)
    mask = jnp.int32(-65536)                               # 0xFFFF0000
    return jax.lax.bitcast_convert_type(bits & mask, jnp.float32)


def _grid_math(gx, gy, h, w, padding_mode, align_corners):
    """Shared sampling-index math: grid planes → corner indices + weights.

    Returns (x0, x1, wx0, wx1, y0f, iy) with grid_sample's exact
    corner/clip/zero-pad semantics (torch-pinned via the jnp oracle). The
    vertical direction is carried as the raw float position ``iy`` (clipped
    in border mode, unclipped in zeros mode): the kernels' y-select uses the
    TENT weight ``max(0, 1 - |row - iy|)``, which reproduces BOTH padding
    modes' (wy0 at y0, wy1 at y1) masks exactly — clipping makes the tent
    put weight 1 on the border row, no clipping makes out-of-range weight
    decay to 0 — in ~half the VPU ops of the two eq-mask terms.
    """
    ix = _unnormalize(gx, w, align_corners)
    iy = _unnormalize(gy, h, align_corners)
    if padding_mode == "border":
        ix = jnp.clip(ix, 0.0, w - 1)
        iy = jnp.clip(iy, 0.0, h - 1)
    x0f = jnp.floor(ix)
    y0f = jnp.floor(iy)
    fx = ix - x0f
    x0 = jnp.clip(x0f, 0, w - 1).astype(jnp.int32)
    x1 = jnp.clip(x0f + 1.0, 0, w - 1).astype(jnp.int32)
    if padding_mode == "zeros":
        wx0 = jnp.where((x0f >= 0) & (x0f <= w - 1), 1.0 - fx, 0.0)
        wx1 = jnp.where((x0f + 1 >= 0) & (x0f + 1 <= w - 1), fx, 0.0)
    else:
        wx0, wx1 = 1.0 - fx, fx
    return x0, x1, wx0, wx1, y0f, iy


def _warp_kernel(img_ref, gx_ref, gy_ref, out_ref, *, padding_mode,
                 align_corners, y_window, packed=False):
    """One program per (batch, 8-output-row block): the image block's
    index_map is constant across the row dimension, so Mosaic keeps it
    resident in VMEM while only the small grid/out row blocks stream.

    All index math is vectorized over the whole (rows, Wo) block up front —
    per-row work is only the gather + windowed mask-reduce.

    ``packed``: the image ref holds f32 words each packing TWO bf16 pixels
    from vertically adjacent rows (rows 2r and 2r+1) — the lane gather then
    touches HALF the sublane rows for the same outputs (Mosaic cannot
    gather bf16 directly: index/data bitwidths must match), and the two
    pixels are recovered with shift/mask bitcasts before the x-interp."""
    _, c, hp, w = img_ref.shape
    h = 2 * hp if packed else hp
    _, rows, wo = gx_ref.shape

    x0, x1, wx0, wx1, y0f, iy = _grid_math(
        gx_ref[0], gy_ref[0], h, w, padding_mode, align_corners)

    # vertical window shared by the whole 8-row block
    if y_window is not None and y_window < h:
        win = y_window
        align = 16 if (packed or img_ref.dtype == jnp.bfloat16) else 8
        start = jnp.clip(jnp.min(y0f).astype(jnp.int32), 0, h - win)
        start = pl.multiple_of((start // align) * align, align)
        # Window guard (ADVICE r4 medium #2): an IN-IMAGE sample whose y
        # falls outside the resident band reads the band-edge row instead
        # of silently zero-filling — a window-contract violation now
        # degrades to a locally clamped warp, never corrupted (black) rows.
        # Out-of-image y keeps its unclamped value so zeros-mode tent decay
        # and the (-1, 0) / (h-1, h) partial-weight edges stay exact.
        interior = (iy >= 0.0) & (iy <= h - 1.0)
        iy = jnp.where(interior,
                       jnp.clip(iy, start.astype(iy.dtype),
                                (start + win - 1).astype(iy.dtype)), iy)
    else:
        win = h
        start = 0
    # f32 gather only — see the module docstring's Mosaic bitwidth note
    data_t = jnp.float32
    if packed:
        win_p = win // 2
        start_p = pl.multiple_of(start // 2, 8)
        img2 = (img_ref[0, :, pl.ds(start_p, win_p), :]
                .reshape(c * win_p, w))
        gather_rows = c * win_p
        # row index each packed sublane's EVEN pixel came from
        iota_h = (2 * jax.lax.broadcasted_iota(jnp.int32, (1, win_p, 1), 1)
                  + start)
    else:
        win_p = win
        img2 = (img_ref[0, :, pl.ds(start, win), :]
                .reshape(c * win, w).astype(data_t))
        gather_rows = c * win
        iota_h = jax.lax.broadcasted_iota(jnp.int32, (1, win, 1), 1) + start

    # (rows, 1, Wo) expansions done once: the per-row slice below must be a
    # plain lax.slice (mixed None/slice getitem lowers to a gather Mosaic
    # rejects). The y-select is a TENT weight on the float position (see
    # _grid_math) — one sub+abs+rsub+max per (win, Wo) element vs the two
    # eq-mask+convert+mul terms it replaced (~15% of kernel VPU ops).
    iye = iy[:, None, :].astype(data_t)
    iota_f = iota_h.astype(data_t)
    wx0 = wx0.astype(data_t)
    wx1 = wx1.astype(data_t)

    def gather_tiled(idx_t):
        """(gather_rows, chunk) gather honoring the one-lane-tile limit."""
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

    for r in range(rows):
        g0 = g1 = None
        for jo in range(0, wo, MAX_LANES):
            jo_end = min(jo + MAX_LANES, wo)
            span = jo_end - jo
            i0 = jnp.broadcast_to(x0[r:r + 1, jo:jo_end], (gather_rows, span))
            i1 = jnp.broadcast_to(x1[r:r + 1, jo:jo_end], (gather_rows, span))
            c0, c1 = gather_tiled(i0), gather_tiled(i1)
            g0 = c0 if g0 is None else jnp.concatenate([g0, c0], axis=1)
            g1 = c1 if g1 is None else jnp.concatenate([g1, c1], axis=1)
        sl = lambda a: jax.lax.slice_in_dim(a, r, r + 1, axis=0)
        if packed:
            # x-interp each packed half, then a paired tent-reduce: even
            # pixels sit at source row iota_f, odd pixels at iota_f + 1
            hx_e = (_unpack_even(g0) * sl(wx0)
                    + _unpack_even(g1) * sl(wx1)).reshape(c, win_p, wo)
            hx_o = (_unpack_odd(g0) * sl(wx0)
                    + _unpack_odd(g1) * sl(wx1)).reshape(c, win_p, wo)
            wv_e = jnp.maximum(0.0, 1.0 - jnp.abs(iota_f - sl(iye)))
            wv_o = jnp.maximum(0.0, 1.0 - jnp.abs(iota_f + 1.0 - sl(iye)))
            out = jnp.sum(hx_e * wv_e + hx_o * wv_o, axis=1)
        else:
            hx = (g0 * sl(wx0) + g1 * sl(wx1)).reshape(c, win_p, wo)
            wv = jnp.maximum(0.0, 1.0 - jnp.abs(iota_f - sl(iye)))
            out = jnp.sum(hx * wv, axis=1)
        out_ref[0, :, r, :] = out.astype(out_ref.dtype)


def _lane_upsample_field(field_ref, fx0, ffrac, span):
    """Lane-upsample the whole (F, F) field to (F, span), once per program.

    Mosaic's within-tile lane gather needs operand and index lane counts to
    MATCH, so the field plane is zero-padded to ``span`` lanes first; index
    values stay < F. Returns the value padded to a multiple-of-8 sublane
    count so it can be stored to a VMEM scratch ref whole."""
    fld = field_ref[0]                                     # (F, F)
    f = fld.shape[0]
    if fld.shape[1] < span:
        fld = jnp.concatenate(
            [fld, jnp.zeros((f, span - fld.shape[1]), fld.dtype)], axis=1)
    idx0 = jnp.broadcast_to(fx0, (f, span))
    a0 = jnp.take_along_axis(fld, idx0, axis=1)            # (F, span)
    a1 = jnp.take_along_axis(fld, idx0 + 1, axis=1)
    up = a0 * (1.0 - ffrac) + a1 * ffrac
    pad = -f % 8
    if pad:
        up = jnp.concatenate([up, jnp.zeros((pad, span), up.dtype)], axis=0)
    return up


def _field_row(scratch_ref, fr0, pfrac):
    """One output row from the lane-upsampled field scratch: dynamic 2-row
    ref slice (sublane ds on a REF is supported; on a value it is not) +
    sublane lerp → (1, span)."""
    rows = scratch_ref[pl.ds(fr0, 2), :]                   # (2, span)
    top = jax.lax.slice_in_dim(rows, 0, 1, axis=0)
    bot = jax.lax.slice_in_dim(rows, 1, 2, axis=0)
    return top * (1.0 - pfrac) + bot * pfrac


def _warp_field_kernel(img_ref, fx_ref, fy_ref, out_ref, ufx_ref, ufy_ref, *,
                       padding_mode, align_corners, y_window, ho, wo):
    """Warp directly from the coarse TPS∘affine field — the dense (B,H,W,2)
    grid never exists (in XLA or HBM): each program bilinearly evaluates the
    (F, F) field at its own 8 output rows in VMEM (exactly
    ``ops.warp.upsample_field_aligned`` semantics), then samples the image.

    Grid = (batch, row-blocks, 128-lane output chunks): chunking via the
    grid (not an unrolled in-kernel loop) keeps the Mosaic unroll count at
    W=256 the same as one 128-wide program — the round-1 256² compile
    blow-up (>15 min) came from the extra unrolled chunk×tile selects.
    Measured: 256² compiles in ~2 s and warps at ~4.2k imgs/s (vs ~0.13
    imgs-equivalents/s through XLA's element gather).
    """
    _, c, h, w = img_ref.shape
    f = fx_ref.shape[-1]
    span = out_ref.shape[-1]
    jchunk = pl.program_id(2)
    rblock = pl.program_id(1)

    # lane positions of this output chunk in field coordinates
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, span), 1) + jchunk * span
    fpos = jj.astype(jnp.float32) * ((f - 1) / (wo - 1)) if wo > 1 else \
        jnp.zeros((1, span), jnp.float32)
    fx0 = jnp.clip(jnp.floor(fpos), 0, f - 2).astype(jnp.int32)
    ffrac = fpos - fx0.astype(jnp.float32)

    if y_window is not None and y_window < h:
        win = y_window
        align = 16 if img_ref.dtype == jnp.bfloat16 else 8
    else:
        win = h
        align = 8

    ufx_ref[...] = _lane_upsample_field(fx_ref, fx0, ffrac, span)
    ufy_ref[...] = _lane_upsample_field(fy_ref, fx0, ffrac, span)

    rows_gx, rows_gy = [], []
    for r in range(_ROWS_PER_PROGRAM):
        gr = rblock * _ROWS_PER_PROGRAM + r
        pr = gr.astype(jnp.float32) * ((f - 1) / (ho - 1)) if ho > 1 else \
            jnp.float32(0.0)
        fr0 = jnp.clip(jnp.floor(pr), 0, f - 2).astype(jnp.int32)
        pfrac = pr - fr0.astype(jnp.float32)
        rows_gx.append(_field_row(ufx_ref, fr0, pfrac))
        rows_gy.append(_field_row(ufy_ref, fr0, pfrac))
    gx = jnp.concatenate(rows_gx, axis=0)                  # (rows, span)
    gy = jnp.concatenate(rows_gy, axis=0)

    x0, x1, wx0, wx1, y0f, iy = _grid_math(
        gx, gy, h, w, padding_mode, align_corners)

    # shared vertical window for the whole 8-row block: building the
    # windowed image stack ONCE per program beats per-row windows — the
    # per-row rebuild (dynamic slice + f32 cast of (C·win, W)) measured
    # slower than the 25% smaller gathers it enabled.
    if win < h:
        start = jnp.clip(jnp.min(y0f).astype(jnp.int32), 0, h - win)
        start = pl.multiple_of((start // align) * align, align)
        # window guard — see _warp_kernel: in-image out-of-band samples
        # clamp to the band edge instead of zero-filling
        interior = (iy >= 0.0) & (iy <= h - 1.0)
        iy = jnp.where(interior,
                       jnp.clip(iy, start.astype(iy.dtype),
                                (start + win - 1).astype(iy.dtype)), iy)
    else:
        start = 0
    # gather in f32 ALWAYS: Mosaic's dynamic_gather requires index/data
    # bitwidths to match and take_along_axis pins indices to i32, so bf16
    # gathers cannot compile on this version; bf16 images still halve the
    # HBM read/write at the kernel boundary (cast to f32 in VMEM).
    data_t = jnp.float32
    img2 = (img_ref[0, :, pl.ds(start, win), :]
            .reshape(c * win, w).astype(data_t))
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (1, win, 1), 1) + start

    # tent-weight y-select (see _grid_math / _warp_kernel)
    iye = iy[:, None, :].astype(data_t)
    iota_f = iota_h.astype(data_t)
    wx0 = wx0.astype(data_t)
    wx1 = wx1.astype(data_t)

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
                acc = jnp.where((idx_t >= ji) & (idx_t < ji_end), part,
                                acc)
        return acc

    for r in range(_ROWS_PER_PROGRAM):
        sl = lambda a: jax.lax.slice_in_dim(a, r, r + 1, axis=0)
        i0 = jnp.broadcast_to(sl(x0), (c * win, span))
        i1 = jnp.broadcast_to(sl(x1), (c * win, span))
        hx = (gather_tiled(i0) * sl(wx0)
              + gather_tiled(i1) * sl(wx1)).reshape(c, win, span)
        wv = jnp.maximum(0.0, 1.0 - jnp.abs(iota_f - sl(iye)))
        out_ref[0, :, r, :] = jnp.sum(hx * wv, axis=1).astype(out_ref.dtype)


def _block_pad(y_row_advance: float | None, a: int) -> int:
    """Extra window rows for an 8-output-row block's SHARED window.

    ``y_row_advance`` is a caller-supplied bound on the source-y advance
    between adjacent output rows (max over the grid of y(r+1,j) - y(r,j),
    in source pixels); the block spans (ROWS-1)x that beyond one row's own
    spread, plus the ≤ a-1 slack from aligning the window start down to the
    sublane tile (the bilinear +1 rides y_window's own +4 margin).
    augment.py passes (1+scale)·H/Ho — at celeba128 this tightens the
    effective window 80 → 64 rows (20% less gather + tent-reduce work).
    Without an advance bound: 2 source rows per output row (covers 2x
    downscale warps), the pre-r4 conservative default.

    HONESTY NOTE (ADVICE r4 medium #2): augment's advance covers the
    affine term only; the TPS field adds an inter-row drift whose analytic
    worst case (every clipped ±3σ control point sign-aligned with the
    unit-response gradient, computed from the constant TPS system) would
    need ~80 rows at celeba128 defaults. Empirically a 20k-draw Monte
    Carlo maxes at 41.4 px of band spread vs the 47 px the 64-row window
    admits, so real draws fit with margin — and a draw that ever exceeded
    it now degrades to an edge-clamped warp (the in-kernel window guard),
    never to silent zero rows. Debug runs additionally checkify the block
    contract against ``effective_y_window`` (augment.window_checks).
    """
    import math
    if y_row_advance is not None:
        return math.ceil((_ROWS_PER_PROGRAM - 1) * float(y_row_advance)) + a
    return 2 * _ROWS_PER_PROGRAM + a


def effective_y_window(y_window: int, h: int, *, bf16: bool,
                       y_row_advance: float | None) -> int:
    """The window the kernels ACTUALLY reserve for a caller ``y_window``:
    per-row bound + shared-block pad (:func:`_block_pad`), rounded up to
    the sublane tile. The ONE place this arithmetic lives — both kernel
    entry points and augment's debug block-contract check call it, so the
    asserted contract can never drift from the kernel's real band."""
    a = 16 if bf16 else 8
    eff = int(y_window) + _block_pad(y_row_advance, a)
    eff = min(h, max(a, -(-eff // a) * a))
    if bf16 and eff % 2:
        eff += 1
    return eff


def warp_field_pallas(image: jnp.ndarray, field: jnp.ndarray,
                      out_height: int, out_width: int,
                      padding_mode: str = "zeros",
                      align_corners: bool = DEFAULT_ALIGN_CORNERS,
                      y_window: int | None = None,
                      y_row_advance: float | None = None,
                      interpret: bool = False) -> jnp.ndarray:
    """Warp from a coarse sampling field: image (B,C,H,W), field (B,F,F,2)
    → (B,C,Ho,Wo). Equivalent to ``upsample_field_aligned(field, Ho, Wo)``
    followed by ``grid_sample`` (align_corners=True on the upsample), with
    the dense grid never materialized. Forward-only.
    """
    b, c, h, w = image.shape
    f = field.shape[1]
    ho, wo = int(out_height), int(out_width)
    if padding_mode not in ("zeros", "border"):
        raise ValueError(f"unsupported padding_mode {padding_mode!r}")
    if ho % _ROWS_PER_PROGRAM:
        raise ValueError(f"output height must be a multiple of "
                         f"{_ROWS_PER_PROGRAM}; got {ho}")
    span = min(wo, MAX_LANES)
    if wo % span:
        raise ValueError(f"output width must be <=128 or a multiple of 128; "
                         f"got {wo}")

    if y_window is not None:
        # shared 8-row-block window (same slack as warp_bilinear_pallas)
        y_window = effective_y_window(
            y_window, h, bf16=image.dtype == jnp.bfloat16,
            y_row_advance=y_row_advance)
    kern = functools.partial(_warp_field_kernel, padding_mode=padding_mode,
                             align_corners=align_corners, y_window=y_window,
                             ho=ho, wo=wo)
    field = jax.lax.stop_gradient(field)
    fspec = pl.BlockSpec((1, f, f), lambda bi, i, j: (bi, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, c, ho, wo), image.dtype),
        grid=(b, ho // _ROWS_PER_PROGRAM, wo // span),
        in_specs=[
            pl.BlockSpec((1, c, h, w), lambda bi, i, j: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            fspec, fspec,
        ],
        out_specs=pl.BlockSpec((1, c, _ROWS_PER_PROGRAM, span),
                               lambda bi, i, j: (bi, 0, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((f + (-f % 8), span), jnp.float32),
            pltpu.VMEM((f + (-f % 8), span), jnp.float32),
        ],
        interpret=interpret,
    )(image, field[..., 0], field[..., 1])
    return jax.lax.stop_gradient(out)


def warp_bilinear_pallas(image: jnp.ndarray, grid: jnp.ndarray,
                         padding_mode: str = "zeros",
                         align_corners: bool = DEFAULT_ALIGN_CORNERS,
                         y_window: int | None = None,
                         y_row_advance: float | None = None,
                         grids_per_image: int = 1,
                         interpret: bool = False) -> jnp.ndarray:
    """Fused bilinear sampling: image (B,C,H,W), grid (B,Ho,Wo,2) → (B,C,Ho,Wo).

    Forward-only (see module docstring); W and Wo must be ≤512.

    ``y_window``: optional static bound on the vertical source spread of any
    single output row (in pixels, rounded up to a multiple of 8 internally).
    When the caller can guarantee ``max_j y(i,j) - min_j y(i,j) + 2 <=
    y_window`` (augment.py derives this from its WarpConfig), the vertical
    reduce runs over a y_window-row band instead of all H — ~H/y_window
    faster. An in-image sample falling outside the band clamps to the
    band-edge row (the window guard in ``_warp_kernel``), so an
    under-estimated window degrades to a locally flattened warp — never
    to silent zero rows; exactness still requires an adequate bound.

    ``grids_per_image``: warp each image through G grids in ONE kernel —
    grid is (B·G, Ho, Wo, 2) with image b's grids at rows [b·G, (b+1)·G) and
    the output is (B·G, C, Ho, Wo) in the same order. Consecutive programs
    share the image block index, so Mosaic fetches each image from HBM once
    per G warps instead of once per warp, and the whole aug pair rides a
    single dispatch (the "shared-image two-warp kernel", VERDICT r3 #1).
    """
    b, c, h, w = image.shape
    bg, ho, wo, _ = grid.shape
    if bg != b * grids_per_image:
        raise ValueError(f"grid batch {bg} != image batch {b} x "
                         f"grids_per_image {grids_per_image}")
    if w > 4 * MAX_LANES or wo > 4 * MAX_LANES:
        raise ValueError(f"warp_bilinear_pallas supports W,Wo<=512; got "
                         f"{w},{wo} (use ops.warp.grid_sample)")
    if padding_mode not in ("zeros", "border"):
        raise ValueError(f"unsupported padding_mode {padding_mode!r}")
    if ho % _ROWS_PER_PROGRAM:
        raise ValueError(f"output height must be a multiple of "
                         f"{_ROWS_PER_PROGRAM}; got {ho}")

    # bf16 images go through the ROW-PAIR PACKED path: two bf16 pixels from
    # vertically adjacent rows ride one f32 word, so the lane gather (the
    # kernel's dominant cost) touches half the sublane rows. The pack is an
    # XLA-side reshape+bitcast (fused, no copy beyond one transpose).
    packed = image.dtype == jnp.bfloat16 and h % 2 == 0

    if y_window is not None:
        # The window is shared by an 8-output-row block: add the block's own
        # vertical span (caller-bounded via y_row_advance, else a 2-source-
        # rows-per-output-row margin) plus tile-alignment slack.
        y_window = effective_y_window(
            y_window, h, bf16=packed or image.dtype == jnp.bfloat16,
            y_row_advance=y_row_advance)
    if packed:
        img_in = jax.lax.bitcast_convert_type(
            image.reshape(b, c, h // 2, 2, w).transpose(0, 1, 2, 4, 3),
            jnp.float32)                                   # (B, C, H/2, W)
        img_block = (1, c, h // 2, w)
    else:
        img_in = image
        img_block = (1, c, h, w)
    kern = functools.partial(_warp_kernel, padding_mode=padding_mode,
                             align_corners=align_corners,
                             y_window=y_window, packed=packed)
    # The grid is passed as separate x / y planes: a trailing dim of 2 gets a
    # T(2,128) tiled layout that forces a 2x full-grid relayout copy in front
    # of the custom call (measured 1.7 ms each at 128²/b128).
    grid = jax.lax.stop_gradient(grid)
    row_spec = pl.BlockSpec((1, _ROWS_PER_PROGRAM, wo),
                            lambda bi, i: (bi, i, 0),
                            memory_space=pltpu.VMEM)
    g = grids_per_image
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((bg, c, ho, wo), image.dtype),
        grid=(bg, ho // _ROWS_PER_PROGRAM),
        in_specs=[
            pl.BlockSpec(img_block, lambda bi, i: (bi // g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            row_spec, row_spec,
        ],
        out_specs=pl.BlockSpec((1, c, _ROWS_PER_PROGRAM, wo),
                               lambda bi, i: (bi, 0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(img_in, grid[..., 0], grid[..., 1])
    return jax.lax.stop_gradient(out)
