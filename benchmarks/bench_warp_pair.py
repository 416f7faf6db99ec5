"""Measure the shared-image two-warp kernel vs two single-warp dispatches.

VERDICT r3 #1 named this design ("one kernel, one image read, two fields in,
two outputs out") as a candidate for the aug pair's 3.3 ms; ROADMAP lead #2's
analysis predicts a small win only (the kernel is tent-reduce/gather-bound
and BOTH of those scale with the number of OUTPUTS, not image reads — the
shareable parts are the per-pair HBM image fetch, ~13 MB ≈ 16 us, and one
dispatch). This bench settles it on-chip at the celeba128 aug shapes
(b128, c3, 128², bf16 packed, aug y_window), fori-style difference timing.

Usage: python benchmarks/bench_warp_pair.py [batch] [iters]
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from keypoints_tpu.data.augment import WarpConfig, random_warp_grid, \
    warp_y_window  # noqa: E402
from keypoints_tpu.kernels.warp_pallas import warp_bilinear_pallas  # noqa: E402
from keypoints_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402


def loop_ms(fn, *args, iters=50):
    out = fn(*args)
    np.asarray(jnp.ravel(out[0] if isinstance(out, tuple) else out)[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jnp.ravel(out[0] if isinstance(out, tuple) else out)[:1])
    return (time.perf_counter() - t0) / iters * 1e3


def main(batch=128, iters=50, size=128):
    enable_compile_cache()
    cfg = WarpConfig()
    win = warp_y_window(cfg, size)
    adv = 1.0 + cfg.scale
    img = jnp.asarray(np.random.RandomState(0).rand(batch, 3, size, size),
                      jnp.float32).astype(jnp.bfloat16)
    ks, kt = jax.random.split(jax.random.PRNGKey(1))
    gs = random_warp_grid(ks, batch, size, size, cfg)
    gt = random_warp_grid(kt, batch, size, size, cfg)

    @jax.jit
    def two_calls(img, gs, gt):
        a = warp_bilinear_pallas(img, gs, "border", True, y_window=win,
                                 y_row_advance=adv)
        b = warp_bilinear_pallas(img, gt, "border", True, y_window=win,
                                 y_row_advance=adv)
        return a, b

    @jax.jit
    def paired(img, gs, gt):
        g = jnp.stack([gs, gt], axis=1).reshape(2 * batch, size, size, 2)
        out = warp_bilinear_pallas(img, g, "border", True, y_window=win,
                                   y_row_advance=adv, grids_per_image=2)
        o = out.reshape(batch, 2, 3, size, size)
        return o[:, 0], o[:, 1]

    # exactness first: the paired kernel must be bit-identical per warp
    a1, b1 = two_calls(img, gs, gt)
    a2, b2 = paired(img, gs, gt)
    np.testing.assert_array_equal(np.asarray(a1, np.float32),
                                  np.asarray(a2, np.float32))
    np.testing.assert_array_equal(np.asarray(b1, np.float32),
                                  np.asarray(b2, np.float32))
    print("exactness: paired == 2x single (bit-identical)")

    t2 = loop_ms(two_calls, img, gs, gt, iters=iters)
    tp = loop_ms(paired, img, gs, gt, iters=iters)
    print(f"two dispatches : {t2:7.3f} ms")
    print(f"paired kernel  : {tp:7.3f} ms   ({t2 / tp:.3f}x)")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
