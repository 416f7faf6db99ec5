"""Dense warps: bilinear grid sampling, affine grids, thin-plate-spline grids.

These implement — in pure jnp, with semantics pinned to the torch functions the
reference uses (SURVEY.md §2.1 "TPS warp augmentation", provenance [B:5][PAPER]):

* :func:`grid_sample`   == ``torch.nn.functional.grid_sample`` (2-D, bilinear,
  ``padding_mode`` in {zeros, border}, explicit ``align_corners``).
* :func:`affine_grid`   == ``torch.nn.functional.affine_grid`` (2-D).
* :func:`tps_grid`      — classic thin-plate-spline interpolation: given a coarse
  control grid and per-control-point offsets, solve the TPS linear system and
  evaluate the dense sampling grid. Used to synthesize (source, target) training
  pairs from single images.

Everything here is jit-compatible with static shapes and runs device-side —
augmentation never touches the host (the north star's "fully device-side
decode/augment/prefetch", [B:5][B:11]). The gather in :func:`grid_sample` is
the op the Pallas ``warp_pallas`` kernel replaces on the hot path.
"""

from __future__ import annotations

import jax.numpy as jnp

from keypoints_tpu.coords import (DEFAULT_ALIGN_CORNERS, coord_grid,
                                  normalized_to_pixel)


def _reflect_coord(x: jnp.ndarray, size: int,
                   align_corners: bool) -> jnp.ndarray:
    """Torch 'reflection' padding: fold coordinates into the valid range.

    align_corners=True reflects about pixel centers [0, size-1];
    align_corners=False about pixel edges [-0.5, size-0.5].
    """
    lo, hi = (0.0, size - 1.0) if align_corners else (-0.5, size - 0.5)
    span = hi - lo
    if span <= 0:                      # size == 1
        return jnp.zeros_like(x)
    x = jnp.mod(x - lo, 2.0 * span)
    x = jnp.where(x > span, 2.0 * span - x, x) + lo
    # torch additionally clips to the index range after reflecting
    return jnp.clip(x, 0.0, size - 1)


def grid_sample(image: jnp.ndarray, grid: jnp.ndarray,
                padding_mode: str = "zeros",
                align_corners: bool = DEFAULT_ALIGN_CORNERS,
                mode: str = "bilinear") -> jnp.ndarray:
    """Sample ``image`` (B, C, H, W) at ``grid`` (B, Ho, Wo, 2 as (x,y)).

    Returns (B, C, Ho, Wo). Semantics match torch grid_sample exactly —
    ``mode`` in {bilinear, nearest}, ``padding_mode`` in {zeros, border,
    reflection} — verified against torch CPU in tests/test_ops_parity.py.
    """
    if padding_mode not in ("zeros", "border", "reflection"):
        raise ValueError(f"unsupported padding_mode: {padding_mode!r}")
    if mode not in ("bilinear", "nearest"):
        raise ValueError(f"unsupported mode: {mode!r}")
    b, c, h, w = image.shape
    ix = normalized_to_pixel(grid[..., 0], w, align_corners)  # (B, Ho, Wo)
    iy = normalized_to_pixel(grid[..., 1], h, align_corners)

    if padding_mode == "border":
        ix = jnp.clip(ix, 0.0, w - 1)
        iy = jnp.clip(iy, 0.0, h - 1)
    elif padding_mode == "reflection":
        ix = _reflect_coord(ix, w, align_corners)
        iy = _reflect_coord(iy, h, align_corners)

    if mode == "nearest":
        xi = jnp.round(ix)
        yi = jnp.round(iy)
        if padding_mode == "zeros":
            valid = ((xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1))
        else:
            valid = jnp.ones_like(xi, dtype=bool)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        flat = (yc * w + xc).reshape(b, -1)
        img_flat = image.reshape(b, c, h * w)
        vals = jnp.take_along_axis(img_flat, flat[:, None, :], axis=2)
        vals = vals * valid.reshape(b, 1, -1)
        return vals.reshape(b, c, *grid.shape[1:3])

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = ix - x0            # weight for x1 corner
    wy1 = iy - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def corner(yc, xc, wy, wx):
        if padding_mode == "zeros":
            valid = (xc >= 0) & (xc <= w - 1) & (yc >= 0) & (yc <= h - 1)
            wgt = jnp.where(valid, wy * wx, 0.0)
        else:
            wgt = wy * wx
        xi = jnp.clip(xc, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yc, 0, h - 1).astype(jnp.int32)
        flat = (yi * w + xi).reshape(b, -1)                       # (B, Ho*Wo)
        img_flat = image.reshape(b, c, h * w)
        vals = jnp.take_along_axis(img_flat, flat[:, None, :], axis=2)
        return vals * wgt.reshape(b, 1, -1)

    out = (corner(y0, x0, wy0, wx0) + corner(y0, x1, wy0, wx1)
           + corner(y1, x0, wy1, wx0) + corner(y1, x1, wy1, wx1))
    return out.reshape(b, c, *grid.shape[1:3])


def affine_grid(theta: jnp.ndarray, height: int, width: int,
                align_corners: bool = DEFAULT_ALIGN_CORNERS) -> jnp.ndarray:
    """``torch.nn.functional.affine_grid`` for 2-D: theta (B, 2, 3) -> (B, H, W, 2).

    ``grid[b, i, j] = theta[b] @ (x_j, y_i, 1)`` on the normalized identity grid.
    """
    base = coord_grid(height, width, align_corners, theta.dtype)  # (H, W, 2)
    ones = jnp.ones((*base.shape[:2], 1), theta.dtype)
    homo = jnp.concatenate([base, ones], axis=-1)                 # (H, W, 3)
    return jnp.einsum("bij,hwj->bhwi", theta, homo)


def _tps_u(r2: jnp.ndarray) -> jnp.ndarray:
    """TPS radial basis U(r) = r^2 log(r^2), with U(0) = 0."""
    return jnp.where(r2 == 0.0, 0.0, r2 * jnp.log(jnp.maximum(r2, 1e-30)))


def tps_coefficients(control_points: jnp.ndarray, control_values: jnp.ndarray,
                     reg: float = 0.0) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Solve the TPS system for a batch of control sets.

    control_points: (B, N, 2) sites in normalized coords.
    control_values: (B, N, D) values at the sites (D=2 for a warp's (x, y)).
    Returns (w, a): radial weights (B, N, D) and affine part (B, 3, D) so that

        f(p) = a_0 + a_1 p_x + a_2 p_y + sum_i w_i U(|p - c_i|^2).

    A tiny ``reg`` (bending regularizer) is added to the kernel diagonal; the
    system is solved with one batched ``jnp.linalg.solve`` — cheap, on device.
    """
    b, n, _ = control_points.shape
    d2 = jnp.sum((control_points[:, :, None, :]
                  - control_points[:, None, :, :]) ** 2, axis=-1)   # (B, N, N)
    k = _tps_u(d2) + reg * jnp.eye(n, dtype=control_points.dtype)
    p = jnp.concatenate([jnp.ones((b, n, 1), control_points.dtype),
                         control_points], axis=-1)                  # (B, N, 3)
    zeros = jnp.zeros((b, 3, 3), control_points.dtype)
    top = jnp.concatenate([k, p], axis=-1)                          # (B, N, N+3)
    bot = jnp.concatenate([p.transpose(0, 2, 1), zeros], axis=-1)   # (B, 3, N+3)
    lhs = jnp.concatenate([top, bot], axis=1)                       # (B, N+3, N+3)
    rhs = jnp.concatenate(
        [control_values,
         jnp.zeros((b, 3, control_values.shape[-1]), control_values.dtype)],
        axis=1)
    sol = jnp.linalg.solve(lhs, rhs)                                # (B, N+3, D)
    return sol[:, :n, :], sol[:, n:, :]


def tps_coefficients_fixed_sites(sites: jnp.ndarray,
                                 control_values: jnp.ndarray,
                                 reg: float = 0.0
                                 ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """TPS solve when every batch element shares the SAME control sites.

    The augmentation pipeline perturbs the *targets* of a fixed identity
    control grid, so the (N+3, N+3) TPS system matrix is a compile-time
    constant: invert it ONCE (XLA constant-folds the inverse) and turn the
    per-step batched LU solve into a plain matmul. Measured on v5e: the
    batched ``linalg.solve`` custom-call cost 0.9 ms/step at b128 —
    removed entirely by this path.

    sites: (N, 2) shared control sites; control_values: (B, N, D).
    """
    n = sites.shape[0]
    d2 = jnp.sum((sites[:, None, :] - sites[None, :, :]) ** 2, axis=-1)
    k = _tps_u(d2) + reg * jnp.eye(n, dtype=sites.dtype)
    p = jnp.concatenate([jnp.ones((n, 1), sites.dtype), sites], axis=-1)
    lhs = jnp.concatenate(
        [jnp.concatenate([k, p], axis=-1),
         jnp.concatenate([p.T, jnp.zeros((3, 3), sites.dtype)], axis=-1)],
        axis=0)                                                  # (N+3, N+3)
    inv = jnp.linalg.inv(lhs)                                    # constant
    b = control_values.shape[0]
    rhs = jnp.concatenate(
        [control_values,
         jnp.zeros((b, 3, control_values.shape[-1]), control_values.dtype)],
        axis=1)                                                  # (B, N+3, D)
    sol = jnp.einsum("ij,bjd->bid", inv, rhs)
    return sol[:, :n, :], sol[:, n:, :]


def tps_evaluate(points: jnp.ndarray, control_points: jnp.ndarray,
                 w: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """Evaluate a solved TPS at ``points`` (B, M, 2) -> (B, M, D)."""
    d2 = jnp.sum((points[:, :, None, :]
                  - control_points[:, None, :, :]) ** 2, axis=-1)   # (B, M, N)
    radial = _tps_u(d2) @ w                                         # (B, M, D)
    ones = jnp.ones((*points.shape[:2], 1), points.dtype)
    affine = jnp.concatenate([ones, points], axis=-1) @ a           # (B, M, D)
    return radial + affine


def tps_grid(control_points: jnp.ndarray, control_targets: jnp.ndarray,
             height: int, width: int, reg: float = 0.0,
             align_corners: bool = DEFAULT_ALIGN_CORNERS) -> jnp.ndarray:
    """Dense TPS sampling grid (B, H, W, 2) from control-point correspondences.

    ``control_points`` (B, N, 2) are sites in the *output* image; the returned
    grid maps each output pixel to the *source* location ``control_targets``
    (B, N, 2) interpolates — i.e. it plugs straight into :func:`grid_sample`
    (backward warping, same convention the reference's torch pipeline uses).
    """
    w_, a_ = tps_coefficients(control_points, control_targets, reg)
    b = control_points.shape[0]
    dense = coord_grid(height, width, align_corners, control_points.dtype)
    pts = jnp.broadcast_to(dense.reshape(1, -1, 2),
                           (b, height * width, 2))
    vals = tps_evaluate(pts, control_points, w_, a_)
    return vals.reshape(b, height, width, 2)


def tps_grid_fixed(sites: jnp.ndarray, control_targets: jnp.ndarray,
                   height: int, width: int, reg: float = 0.0,
                   align_corners: bool = DEFAULT_ALIGN_CORNERS) -> jnp.ndarray:
    """:func:`tps_grid` for a batch sharing ONE set of control sites.

    Everything that depends only on the sites and the evaluation grid — the
    system inverse and the (H·W, N) radial-basis matrix — is a compile-time
    constant, so the whole dense evaluation is two batched matmuls.
    ``sites`` is (N, 2), unbatched.
    """
    w_, a_ = tps_coefficients_fixed_sites(sites, control_targets, reg)
    dense = coord_grid(height, width, align_corners, sites.dtype)
    pts = dense.reshape(-1, 2)                                   # (M, 2)
    d2 = jnp.sum((pts[:, None, :] - sites[None, :, :]) ** 2, axis=-1)
    radial = jnp.einsum("mn,bnd->bmd", _tps_u(d2), w_)
    homo = jnp.concatenate([jnp.ones((pts.shape[0], 1), sites.dtype), pts],
                           axis=-1)                              # (M, 3)
    affine = jnp.einsum("mj,bjd->bmd", homo, a_)
    vals = radial + affine
    return vals.reshape(-1, height, width, 2)


def upsample_field_aligned(field: jnp.ndarray, height: int,
                           width: int) -> jnp.ndarray:
    """Bilinear upsample of a smooth field (B, hc, wc, C) → (B, H, W, C).

    align_corners=True semantics on both ends, so a field sampled on
    ``coord_grid(hc, wc)`` lands exactly on ``coord_grid(H, W)`` positions.
    Used to evaluate smooth warp fields (TPS) on a coarse grid and blow them
    up cheaply — at 33²→128² the max error vs dense evaluation is ~0.2 px
    (tested), while skipping a (B, H·W, N) radial-basis intermediate.
    """
    def axis_lerp(x, n_out, axis):
        n_in = x.shape[axis]
        if n_in == n_out:
            return x
        pos = jnp.arange(n_out) * ((n_in - 1) / (n_out - 1))
        i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 2)
        f = pos - i0
        a = jnp.take(x, i0, axis=axis)
        b = jnp.take(x, i0 + 1, axis=axis)
        shape = [1] * x.ndim
        shape[axis] = n_out
        return a * (1.0 - f.reshape(shape)) + b * f.reshape(shape)

    return axis_lerp(axis_lerp(field, height, 1), width, 2)


def eval_field_at(field: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Evaluate a coarse warp field at continuous normalized points.

    ``field`` (B, hc, wc, C) sampled on ``coord_grid(hc, wc)`` with
    align_corners=True (the ``upsample_field_aligned`` convention);
    ``pts`` (B, K, 2) in [-1, 1] (x, y) → (B, K, C) bilinear values.
    The point-wise analog of ``upsample_field_aligned``: evaluating at the
    dense-grid positions reproduces the upsampled field exactly.
    """
    b, hc, wc, _ = field.shape
    x = (pts[..., 0] + 1.0) * 0.5 * (wc - 1)
    y = (pts[..., 1] + 1.0) * 0.5 * (hc - 1)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, wc - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, hc - 2)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    def gather(yi, xi):                              # (B, K) idx → (B, K, C)
        flat = field.reshape(b, hc * wc, -1)
        return jnp.take_along_axis(
            flat, (yi * wc + xi)[..., None], axis=1)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 * (1.0 - fx) + v01 * fx
    bot = v10 * (1.0 - fx) + v11 * fx
    return top * (1.0 - fy) + bot * fy


def invert_warp_at(field: jnp.ndarray, pts: jnp.ndarray,
                   iters: int = 20) -> jnp.ndarray:
    """Where does source position q land in the warped image?

    A backward sampling field W maps output position p to the source
    position it reads: out(p) = src(W(p)). A landmark at source position
    ``q`` therefore appears at the p solving W(p) = q. With W = id + d and
    the mild warps used here (|d| ≲ 0.15, |∇d| < 1), the fixed-point
    iteration p ← q − d(p) = p + (q − W(p)) is a contraction (measured
    ratio ~0.5 at the default WarpConfig); 20 steps reach the f32 floor
    (~3e-7 normalized units, tested). Used to carry
    ground-truth landmarks into warped EVAL targets (SURVEY §3.5).
    """
    p = pts
    for _ in range(iters):
        p = p + (pts - eval_field_at(field, p))
    return p
