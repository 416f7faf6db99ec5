"""Pallas kernel unit tests vs jnp oracles (SURVEY.md §4.2).

Kernels run in interpreter mode on CPU; the same code compiles on TPU
(exercised by bench + a TPU smoke script). Edge cases: boundary keypoints,
small sigma, flat heatmaps, non-multiple-of-block row counts.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keypoints_tpu.kernels.gaussian_pallas import gaussian_maps_pallas
from keypoints_tpu.kernels.spatial_softmax_pallas import spatial_softmax_pallas
from keypoints_tpu.ops.gaussian import gaussian_maps
from keypoints_tpu.ops.spatial_softmax import spatial_softmax

ATOL = 1e-5


def rand(*shape, seed=0, scale=1.0):
    return (np.random.RandomState(seed).randn(*shape) * scale).astype(
        np.float32)


@pytest.mark.parametrize("variant", ["joint", "marginal"])
@pytest.mark.parametrize("align", [True, False])
def test_softmax_forward_matches_oracle(variant, align):
    h = jnp.asarray(rand(3, 5, 16, 24, seed=1, scale=3))   # 15 rows: pad case
    got = spatial_softmax_pallas(h, 0.7, variant, align, interpret=True)
    want = spatial_softmax(h, 0.7, variant, align)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=ATOL)


@pytest.mark.parametrize("variant", ["joint", "marginal"])
def test_softmax_grad_matches_oracle(variant):
    h = jnp.asarray(rand(2, 3, 12, 16, seed=2, scale=3))
    t = jnp.asarray(rand(2, 3, 2, seed=3))

    def f_pallas(x):
        kp = spatial_softmax_pallas(x, 1.3, variant, True, interpret=True)
        return jnp.sum((kp - t) ** 2)

    def f_oracle(x):
        kp = spatial_softmax(x, 1.3, variant, True)
        return jnp.sum((kp - t) ** 2)

    g1 = jax.grad(f_pallas)(h)
    g2 = jax.grad(f_oracle)(h)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


def test_softmax_flat_heatmap_centers():
    h = jnp.zeros((1, 1, 8, 8))
    kp = spatial_softmax_pallas(h, 1.0, "joint", True, interpret=True)
    np.testing.assert_allclose(np.asarray(kp), 0.0, atol=1e-6)


def test_softmax_sharp_peak_at_boundary():
    hm = np.full((1, 1, 16, 16), -30.0, np.float32)
    hm[0, 0, 0, 15] = 30.0                                  # top-right corner
    kp = np.asarray(spatial_softmax_pallas(jnp.asarray(hm), 1.0, "joint",
                                           True, interpret=True))
    np.testing.assert_allclose(kp[0, 0], [1.0, -1.0], atol=1e-4)


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("sigma", [0.02, 0.1, 0.5])
def test_gaussian_forward_matches_oracle(align, sigma):
    kp = jnp.asarray(np.clip(rand(3, 5, 2, seed=4), -1, 1))   # 15 rows
    got = gaussian_maps_pallas(kp, 24, 16, sigma, align, interpret=True)
    want = gaussian_maps(kp, 24, 16, sigma, align)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=ATOL)


def test_gaussian_boundary_keypoints():
    kp = jnp.asarray([[[-1.0, -1.0], [1.0, 1.0], [0.0, 0.0], [1.0, -1.0]]])
    got = gaussian_maps_pallas(kp, 16, 16, 0.1, True, interpret=True)
    want = gaussian_maps(kp, 16, 16, 0.1, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=ATOL)


def test_gaussian_grad_matches_oracle():
    kp = jnp.asarray(np.clip(rand(2, 4, 2, seed=5), -0.9, 0.9))
    g_target = jnp.asarray(rand(2, 4, 12, 16, seed=6))

    def f_pallas(k):
        return jnp.sum(gaussian_maps_pallas(k, 12, 16, 0.15, True,
                                            interpret=True) * g_target)

    def f_oracle(k):
        return jnp.sum(gaussian_maps(k, 12, 16, 0.15, True) * g_target)

    g1 = jax.grad(f_pallas)(kp)
    g2 = jax.grad(f_oracle)(kp)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


def test_roundtrip_extract_rerender():
    """softmax → raster composition (the fused hot pair) vs oracles."""
    hm = jnp.asarray(rand(2, 4, 16, 16, seed=7, scale=4))
    kp_p = spatial_softmax_pallas(hm, 0.5, "joint", True, interpret=True)
    maps_p = gaussian_maps_pallas(kp_p, 16, 16, 0.1, True, interpret=True)
    kp_o = spatial_softmax(hm, 0.5, "joint", True)
    maps_o = gaussian_maps(kp_o, 16, 16, 0.1, True)
    np.testing.assert_allclose(np.asarray(maps_p), np.asarray(maps_o),
                               atol=1e-5)


# --- warp kernel ------------------------------------------------------------

from keypoints_tpu.kernels.warp_pallas import warp_bilinear_pallas  # noqa: E402
from keypoints_tpu.ops.warp import grid_sample  # noqa: E402


@pytest.mark.parametrize("padding", ["zeros", "border"])
@pytest.mark.parametrize("align", [True, False])
def test_warp_matches_grid_sample(padding, align):
    rs = np.random.RandomState(11)
    img = jnp.asarray(rs.rand(2, 3, 32, 48), jnp.float32)
    # includes out-of-bounds points and exact-boundary points
    grid = jnp.asarray(rs.rand(2, 24, 40, 2) * 2.4 - 1.2, jnp.float32)
    got = warp_bilinear_pallas(img, grid, padding, align, interpret=True)
    want = grid_sample(img, grid, padding, align)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_warp_identity_grid():
    from keypoints_tpu.coords import coord_grid
    img = jnp.asarray(np.random.RandomState(12).rand(1, 1, 16, 16), jnp.float32)
    ident = jnp.broadcast_to(coord_grid(16, 16)[None], (1, 16, 16, 2))
    out = warp_bilinear_pallas(img, ident, "border", True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_warp_rejects_wide_images():
    img = jnp.zeros((1, 1, 8, 640))
    grid = jnp.zeros((1, 8, 8, 2))
    with pytest.raises(ValueError, match="W,Wo<=512"):
        warp_bilinear_pallas(img, grid)


@pytest.mark.parametrize("win", [16, 32])
def test_warp_y_window_exact_on_aug_grids(win):
    """Windowed vertical reduce stays exact for bounded-displacement grids."""
    from keypoints_tpu.data.augment import WarpConfig, random_warp_grid
    img = jnp.asarray(np.random.RandomState(3).rand(4, 3, 64, 64), jnp.float32)
    g = random_warp_grid(jax.random.PRNGKey(3), 4, 64, 64, WarpConfig())
    got = warp_bilinear_pallas(img, g, "border", True, y_window=win,
                               interpret=True)
    want = grid_sample(img, g, "border", True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("padding", ["zeros", "border"])
def test_warp_field_matches_upsample_grid_sample(padding):
    """Field kernel == upsample_field_aligned + grid_sample, exactly."""
    from keypoints_tpu.data.augment import WarpConfig, random_warp_field
    from keypoints_tpu.kernels.warp_pallas import warp_field_pallas
    from keypoints_tpu.ops.warp import upsample_field_aligned
    img = jnp.asarray(np.random.RandomState(5).rand(3, 3, 64, 64), jnp.float32)
    field = random_warp_field(jax.random.PRNGKey(5), 3, WarpConfig())
    got = warp_field_pallas(img, field, 64, 64, padding, True,
                            interpret=True)
    grid = upsample_field_aligned(field, 64, 64)
    want = grid_sample(img, grid, padding, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_warp_field_windowed_and_wide():
    """Per-row y-window stays exact; 256-wide output runs via grid chunks."""
    from keypoints_tpu.data.augment import (WarpConfig, random_warp_field,
                                            warp_y_window)
    from keypoints_tpu.kernels.warp_pallas import warp_field_pallas
    from keypoints_tpu.ops.warp import upsample_field_aligned
    cfg = WarpConfig()
    img = jnp.asarray(np.random.RandomState(6).rand(2, 1, 256, 256),
                      jnp.float32)
    field = random_warp_field(jax.random.PRNGKey(6), 2, cfg)
    win = warp_y_window(cfg, 256)
    got = warp_field_pallas(img, field, 256, 256, "border", True,
                            y_window=win, interpret=True)
    grid = upsample_field_aligned(field, 256, 256)
    want = grid_sample(img, grid, "border", True)
    # 1e-4: in-kernel field eval orders the f32 lerp arithmetic differently
    # from the XLA upsample (max observed diff 2.8e-5 at 256²)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_warp_bf16_image_close_to_f32():
    """bf16 pixel data through the warp kernel: positions stay f32, values
    agree with the f32 path to bf16 resolution (aug-only precision)."""
    from keypoints_tpu.data.augment import WarpConfig, random_warp_grid
    img = jnp.asarray(np.random.RandomState(9).rand(2, 3, 64, 64), jnp.float32)
    g = random_warp_grid(jax.random.PRNGKey(9), 2, 64, 64, WarpConfig())
    f32 = warp_bilinear_pallas(img, g, "border", True, interpret=True)
    b16 = warp_bilinear_pallas(img.astype(jnp.bfloat16), g, "border", True,
                               interpret=True)
    assert b16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(b16, np.float32), np.asarray(f32),
                               atol=2e-2)


def test_warp_sample_field_dispatch_cpu_oracle():
    from keypoints_tpu.data.augment import WarpConfig, random_warp_field
    from keypoints_tpu.kernels import warp_sample_field
    from keypoints_tpu.ops.warp import upsample_field_aligned
    img = jnp.asarray(np.random.RandomState(7).rand(2, 3, 32, 32), jnp.float32)
    field = random_warp_field(jax.random.PRNGKey(7), 2, WarpConfig())
    got = warp_sample_field(img, field, 32, 32, "border", True)
    want = grid_sample(img, upsample_field_aligned(field, 32, 32),
                       "border", True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_block_rows_always_sublane_aligned():
    """Mosaic requires row blocks divisible by 8 (or equal to the array's)."""
    from keypoints_tpu.kernels.spatial_softmax_pallas import _block_rows
    for n in (4, 8, 12, 16, 20, 24, 40, 100, 256, 1280):
        r = _block_rows(n)
        assert r % 8 == 0 or r == n, (n, r)
        assert r <= max(n, 8)


def test_warp_y_window_bound_formula():
    from keypoints_tpu.data.augment import WarpConfig, warp_y_window
    cfg = WarpConfig()
    # default config at 128px: bound must cover the spread used in the test
    # above (which win=16 already covers at 64px) with margin
    assert warp_y_window(cfg, 64) >= 16
    assert warp_y_window(cfg, 128) <= 64


def test_warp_window_violation_edge_clamps_not_zero_fills():
    """Window guard (ADVICE r4 medium #2): a grid whose y advances faster
    than the declared y_row_advance overruns the 8-row block's shared band.
    In-image samples outside the band must read the band-EDGE row — never
    silently zero-fill. An all-ones image warped with border padding is the
    discriminator: any zero in the output = a zero-filled (corrupted) row."""
    h = w = 64
    img = jnp.ones((1, 1, h, w), jnp.float32)
    # per-row constant y (per-row spread 0, per-row contract holds) but a
    # 4-source-rows-per-output-row advance — far beyond the declared 0.0
    ys = jnp.linspace(-1.0, 1.0, h)            # normalized, spans all rows
    gy = jnp.broadcast_to(ys[:, None], (h, w))
    gx = jnp.broadcast_to(jnp.linspace(-1, 1, w)[None, :], (h, w))
    grid = jnp.stack([gx, gy], -1)[None]
    got = warp_bilinear_pallas(img, grid, "border", True, y_window=8,
                               y_row_advance=0.0, interpret=True)
    assert float(jnp.min(got)) > 0.99          # clamped, not zeroed

    # same contract via the field kernel
    from keypoints_tpu.kernels.warp_pallas import warp_field_pallas
    f = 9
    field = jnp.stack([jnp.broadcast_to(jnp.linspace(-1, 1, f)[None, :],
                                        (f, f)),
                       jnp.broadcast_to(jnp.linspace(-1, 1, f)[:, None],
                                        (f, f))], -1)[None]
    got_f = warp_field_pallas(img, field, h, w, "border", True,
                              y_window=8, y_row_advance=0.0, interpret=True)
    assert float(jnp.min(got_f)) > 0.99

    # zeros-mode out-of-IMAGE samples must still be zero (the guard only
    # applies to in-image positions): push the whole grid below the image
    grid_out = grid.at[..., 1].add(2.5)
    got_z = warp_bilinear_pallas(img, grid_out, "zeros", True, y_window=8,
                                 y_row_advance=0.0, interpret=True)
    assert float(jnp.max(jnp.abs(got_z))) == 0.0


# --- fused bottleneck ---------------------------------------------------------

from keypoints_tpu.kernels.fused_bottleneck import softargmax_raster_fused  # noqa: E402
from keypoints_tpu.ops.spatial_softmax import spatial_softmax2d  # noqa: E402


@pytest.mark.parametrize("align", [True, False])
def test_fused_bottleneck_forward(align):
    hm = jnp.asarray(rand(2, 3, 16, 16, seed=21, scale=4))
    kp, maps = softargmax_raster_fused(hm, 12, 16, 0.7, 0.15, align,
                                       interpret=True)
    kp_o = spatial_softmax2d(hm, 0.7, align)
    maps_o = gaussian_maps(kp_o, 12, 16, 0.15, align)
    np.testing.assert_allclose(np.asarray(kp), np.asarray(kp_o), atol=1e-5)
    np.testing.assert_allclose(np.asarray(maps), np.asarray(maps_o), atol=1e-5)


def test_fused_bottleneck_grad():
    hm = jnp.asarray(rand(1, 2, 12, 16, seed=22, scale=3))
    tgt_maps = jnp.asarray(rand(1, 2, 12, 16, seed=23))
    tgt_kp = jnp.asarray(rand(1, 2, 2, seed=24))

    def f_fused(x):
        kp, maps = softargmax_raster_fused(x, 12, 16, 1.1, 0.2,
                                           interpret=True)
        return jnp.sum((maps - tgt_maps) ** 2) + jnp.sum((kp - tgt_kp) ** 2)

    def f_oracle(x):
        kp = spatial_softmax2d(x, 1.1)
        maps = gaussian_maps(kp, 12, 16, 0.2)
        return jnp.sum((maps - tgt_maps) ** 2) + jnp.sum((kp - tgt_kp) ** 2)

    g1 = jax.grad(f_fused)(hm)
    g2 = jax.grad(f_oracle)(hm)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


@pytest.mark.parametrize("align", [True, False])
def test_fused_bottleneck_marginal_forward(align):
    from keypoints_tpu.ops.spatial_softmax import marginal_softmax
    hm = jnp.asarray(rand(2, 3, 16, 24, seed=31, scale=4))
    kp, maps = softargmax_raster_fused(hm, 12, 16, 0.7, 0.15, align,
                                       variant="marginal", interpret=True)
    kp_o = marginal_softmax(hm, 0.7, align)
    maps_o = gaussian_maps(kp_o, 12, 16, 0.15, align)
    np.testing.assert_allclose(np.asarray(kp), np.asarray(kp_o), atol=1e-5)
    np.testing.assert_allclose(np.asarray(maps), np.asarray(maps_o), atol=1e-5)


def test_fused_bottleneck_marginal_grad():
    from keypoints_tpu.ops.spatial_softmax import marginal_softmax
    hm = jnp.asarray(rand(1, 2, 12, 16, seed=32, scale=3))
    tgt_maps = jnp.asarray(rand(1, 2, 12, 16, seed=33))
    tgt_kp = jnp.asarray(rand(1, 2, 2, seed=34))

    def f_fused(x):
        kp, maps = softargmax_raster_fused(x, 12, 16, 1.1, 0.2,
                                           variant="marginal", interpret=True)
        return jnp.sum((maps - tgt_maps) ** 2) + jnp.sum((kp - tgt_kp) ** 2)

    def f_oracle(x):
        kp = marginal_softmax(x, 1.1)
        maps = gaussian_maps(kp, 12, 16, 0.2)
        return jnp.sum((maps - tgt_maps) ** 2) + jnp.sum((kp - tgt_kp) ** 2)

    g1 = jax.grad(f_fused)(hm)
    g2 = jax.grad(f_oracle)(hm)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


# ---------------------------------------------------------------- max pool


@pytest.mark.parametrize("shape,dtype", [
    ((2, 32, 32, 64), jnp.float32),
    ((3, 16, 16, 128), jnp.bfloat16),
    ((2, 30, 20, 32), jnp.float32),      # H/2 not divisible by the block
])
def test_pool_pallas_exact_vs_oracle(shape, dtype):
    """Fwd AND first-match cotangent routing bit-exact vs models/vgg.py's
    custom-VJP oracle, on tie-heavy quantized inputs with ReLU plateaus."""
    from keypoints_tpu.kernels.pool_pallas import max_pool_2x2_pallas
    from keypoints_tpu.models.vgg import max_pool_2x2

    rng = np.random.RandomState(7)
    x = jnp.asarray(np.maximum(rng.randint(-2, 4, size=shape), 0),
                    jnp.float32).astype(dtype)
    g = jnp.asarray(rng.rand(shape[0], shape[1] // 2, shape[2] // 2,
                             shape[3]), jnp.float32).astype(dtype)
    y0, v0 = jax.vjp(max_pool_2x2, x)
    (d0,) = v0(g)
    y1, v1 = jax.vjp(lambda xx: max_pool_2x2_pallas(xx, True), x)
    (d1,) = v1(g)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y0))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d0))
