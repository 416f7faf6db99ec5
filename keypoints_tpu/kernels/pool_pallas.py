"""Pallas 2×2/stride-2 max pool (NHWC) — fwd + exact first-match VJP.

Why this exists (r5 pose floor campaign, benchmarks/floor_proof_pose.json +
benchmarks/bench_pool_alts.py): the VGG perceptual pools cost ~52 ms of the
222 ms pose256-b128 step against a ~4.4 ms byte floor. Every XLA
formulation measured is far off it at (128,256,256,64) bf16:

* ``reduce_window`` fwd 10.96 ms (vs a 1.8 ms read+write floor),
* 4-way strided-slice fwd 8.98 ms (sublane deinterleave relayouts),
* lane-trick fwd ((N,H,W,C)→(N,H,W/2,2C) reshape) 15.4 ms — the reshape
  is NOT free under XLA's tiled layouts,
* select-and-scatter autodiff fwd+bwd 11.47 ms,
* the r4 custom VJP (strided compares + stack(axis=3) W-interleave)
  25.9 ms — its r4 crowning bench consumed only ``dx[0]`` and XLA sliced
  through the masks (integrity-rule violation, see bench_pool_alts.py).

The kernel sidesteps the W-deinterleave problem the way
spatial_softmax_pallas builds its marginals: **selection matmuls**. A
(W/2, W) 0/1 matrix (from integer iota compares, built in-register) times
an (W, C) row extracts the even/odd-w columns on the MXU — no sublane
shuffles at all. H is a leading (untiled) block dim, so h-pairing is a
free leading-dim reshape+index. Per program (one (1, 2·HB, W, C) input
block → (1, HB, W/2, C) output rows):

  fwd:   hm = max(x_even_h, x_odd_h); y_r = max(S_e·hm_r, S_o·hm_r)
  bwd:   corners x00..x11 re-extracted by the same matmuls; first-match
         masks in the pooled domain (row-major (h0w0,h0w1,h1w0,h1w1) —
         torch MaxPool2d / XLA select-and-scatter order, so golden parity
         is unaffected even on ReLU plateaus); dx scattered back through
         the transposed selection matmuls Sᵀ·(mask·g).

Selection products are exact in bf16 (single-term sums of original
values), so mask compares and routing are bit-exact vs the jnp oracle
(models/vgg.py) — asserted in tests/test_kernels.py (interpret mode).

**MEASURED NEGATIVE — quarantined, not dispatched** (r5 probe, v5e,
(128,256,256,64) bf16, floor_proof methodology):

* fwd kernel 11.24 ms ≈ reduce_window's 10.96 (pool_alts.json);
* batched-dot / hb=32 variants 11.11 / 10.95 — NOT matmul- or
  grid-bound;
* the same kernel with the matmuls REPLACED BY A SLICE (no compute at
  all) still costs 11.08 ms: the block DMA itself is the wall — a
  lane-64 bf16 array at 256² streams through Mosaic (…, W, 64) blocks
  at ~8× under the byte floor regardless of kernel body;
* the bwd kernel costs 19.5 ms standalone, and on this target Mosaic
  additionally rejects bf16 vector equality (``cmpf`` on bf16 —
  "Target does not support this comparison"), so compares must cast
  f32 first (done below).

models/vgg.py therefore ships plain reduce-window autodiff
(select-and-scatter bwd, 11.47 / 5.66 ms at the two pose shapes — the
honest design-space optimum). This module stays as the lab record with
its exactness test, per the kernels/experimental.py convention.
Cited behavior: SURVEY.md §2.1 VGG perceptual loss (reference
keypoints/models/vgg.py pools — mount empty, see VERDICT r1–r4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

#: output H rows per program; H/2 of every supported shape divides it
_HB = 8


def _sel(w: int, dtype) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(W/2, W) even/odd column-selection matrices from integer iotas."""
    i = jax.lax.broadcasted_iota(jnp.int32, (w // 2, w), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (w // 2, w), 1)
    return ((j == 2 * i).astype(dtype), (j == 2 * i + 1).astype(dtype))


def _selT(w: int, dtype) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(W, W/2) transposed selectors (scatter back to even/odd columns)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (w, w // 2), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (w, w // 2), 1)
    return ((i == 2 * j).astype(dtype), (i == 2 * j + 1).astype(dtype))


def _mm(s, m, out_dtype):
    # single-term selection sums: exact in any dtype; accumulate f32 to
    # keep the MXU path, cast back to the operand dtype (identity here)
    return jax.lax.dot(s, m, preferred_element_type=jnp.float32
                       ).astype(out_dtype)


def _fwd_kernel(x_ref, y_ref, *, hb, w):
    x = x_ref[0]                                   # (2·hb, W, C)
    xr = x.reshape(hb, 2, w, x.shape[-1])
    hm = jnp.maximum(xr[:, 0], xr[:, 1])           # (hb, W, C)
    s_e, s_o = _sel(w, x.dtype)
    for r in range(hb):
        y_ref[0, r] = jnp.maximum(_mm(s_e, hm[r], x.dtype),
                                  _mm(s_o, hm[r], x.dtype))


def _bwd_kernel(x_ref, y_ref, g_ref, dx_ref, *, hb, w):
    x = x_ref[0]
    c = x.shape[-1]
    xr = x.reshape(hb, 2, w, c)
    s_e, s_o = _sel(w, x.dtype)
    t_e, t_o = _selT(w, x.dtype)
    zero = jnp.zeros((), x.dtype)
    for r in range(hb):
        xe, xo = xr[r, 0], xr[r, 1]                # (W, C) h-even / h-odd
        # compares in f32: Mosaic on v5e rejects bf16 vector equality
        # ("Target does not support this comparison"); the cast is exact
        yr = y_ref[0, r].astype(jnp.float32)       # (W/2, C)
        gr = g_ref[0, r]
        x00 = _mm(s_e, xe, jnp.float32)
        x01 = _mm(s_o, xe, jnp.float32)
        x10 = _mm(s_e, xo, jnp.float32)
        x11 = _mm(s_o, xo, jnp.float32)
        e00 = x00 == yr
        e01 = x01 == yr
        e10 = x10 == yr
        d00 = jnp.where(e00, gr, zero)
        d01 = jnp.where(e01 & ~e00, gr, zero)
        d10 = jnp.where(e10 & ~(e00 | e01), gr, zero)
        d11 = jnp.where((x11 == yr) & ~(e00 | e01 | e10), gr, zero)
        dx_ref[0, 2 * r] = _mm(t_e, d00, x.dtype) + _mm(t_o, d01, x.dtype)
        dx_ref[0, 2 * r + 1] = _mm(t_e, d10, x.dtype) + _mm(t_o, d11, x.dtype)


def _grids(n, h, w, c):
    hb = _HB
    while (h // 2) % hb:
        hb //= 2
    grid = (n, (h // 2) // hb)
    x_spec = pl.BlockSpec((1, 2 * hb, w, c), lambda i, j: (i, j, 0, 0))
    p_spec = pl.BlockSpec((1, hb, w // 2, c), lambda i, j: (i, j, 0, 0))
    return hb, grid, x_spec, p_spec


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def max_pool_2x2_pallas(x: jnp.ndarray, interpret: bool = False):
    """Drop-in ``max_pool_2x2`` (NHWC, window 2×2, stride 2) on Mosaic."""
    n, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, x.shape
    hb, grid, x_spec, p_spec = _grids(n, h, w, c)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, hb=hb, w=w),
        out_shape=jax.ShapeDtypeStruct((n, h // 2, w // 2, c), x.dtype),
        grid=grid, in_specs=[x_spec], out_specs=p_spec,
        interpret=interpret,
    )(x)


def _fwd(x, interpret):
    y = max_pool_2x2_pallas(x, interpret)
    return y, (x, y)


def _bwd(interpret, res, g):
    x, y = res
    n, h, w, c = x.shape
    hb, grid, x_spec, p_spec = _grids(n, h, w, c)
    dx = pl.pallas_call(
        functools.partial(_bwd_kernel, hb=hb, w=w),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=grid, in_specs=[x_spec, p_spec, p_spec], out_specs=x_spec,
        interpret=interpret,
    )(x, y, g.astype(x.dtype))
    return (dx,)


max_pool_2x2_pallas.defvjp(_fwd, _bwd)
