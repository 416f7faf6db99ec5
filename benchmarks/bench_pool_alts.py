"""max_pool_2x2 design-space measurement at the pose256-b128 shapes.

The r5 pose floor campaign (benchmarks/floor_proof_pose.py) priced the four
pool rows at ~52 ms of the 222 ms pose256-b128 step against a ~4.4 ms byte
floor — the single largest residual. bench_maxpool.py (r4) had crowned the
models/vgg.py custom VJP the optimum, but it consumed only ``dx.ravel()[0]``
(violating the floor_proof integrity rules — XLA slices through elementwise
masks and skips most of the work), so its numbers understated both designs.

This harness measures honestly (fori-difference, squared f32-accumulated
consumes, carried operands/cotangents — benchmarks/floor_proof.py) the
design space:

forward:
* ``rw``    — ``nn.max_pool`` (reduce_window), the shipped forward.
* ``slice`` — 4-way strided-slice maximum (W-deinterleave in sublanes).
* ``lane``  — the relayout-free form: ``(N,H,W,C) -> (N,H,W/2,2C)`` is a
  FREE reshape (row-major merge of adjacent w-pairs), so the W-max is a
  pure lane slice ``maximum(z[...,:C], z[...,C:])`` and only H (a
  non-tiled dim) is strided. No sublane deinterleave anywhere.

forward+backward (cotangent routing EXACT first-match, row-major
(h0w0, h0w1, h1w0, h1w1) — torch MaxPool2d / XLA select-and-scatter order):
* ``custom`` — the r4 masked VJP that USED TO ship (strided corner
  compares + stack(axis=3) lane-splitting W-interleave; ``pool_masked``
  below keeps it verbatim now that models/vgg.py dropped it).
* ``sas``    — XLA autodiff of reduce_window (select-and-scatter).
* ``lane``   — the relayout-free VJP: corner masks from lane slices of the
  free reshape, W-interleave as a lane CONCAT (free), H-interleave as a
  leading-dim stack (non-tiled, cheap), final lane-merge reshape free.

Run on the TPU: python benchmarks/bench_pool_alts.py
Writes benchmarks/pool_alts.json.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.floor_proof import (  # noqa: E402
    _HERE, HBM_BYTES_PER_S, scan_diff_ms)
from keypoints_tpu.models.vgg import max_pool_2x2  # noqa: E402

SHAPES = [(128, 256, 256, 64), (128, 128, 128, 128)]


# ---------------------------------------------------------------- designs
def fwd_rw(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def fwd_slice(x):
    return jnp.maximum(
        jnp.maximum(x[:, ::2, ::2], x[:, ::2, 1::2]),
        jnp.maximum(x[:, 1::2, ::2], x[:, 1::2, 1::2]))


def fwd_lane(x):
    n, h, w, c = x.shape
    z = x.reshape(n, h, w // 2, 2 * c)
    wmax = jnp.maximum(z[..., :c], z[..., c:])
    return jnp.maximum(wmax[:, ::2], wmax[:, 1::2])


# the r4 masked VJP that used to ship as models/vgg.py::max_pool_2x2 —
# kept here verbatim as the measured-negative design fb_custom records
# (25.9 / 12.1 ms at the two shapes; the shipped pool is now plain
# reduce-window autodiff = fb_sas)
@jax.custom_vjp
def pool_masked(x):
    return fwd_rw(x)


def _pm_fwd(x):
    y = fwd_rw(x)
    return y, (x, y)


def _pm_bwd(res, g):
    x, y = res
    x00, x01 = x[:, ::2, ::2], x[:, ::2, 1::2]
    x10, x11 = x[:, 1::2, ::2], x[:, 1::2, 1::2]
    e00, e01, e10, e11 = (x00 == y), (x01 == y), (x10 == y), (x11 == y)
    f01 = e01 & ~e00
    f10 = e10 & ~(e00 | e01)
    f11 = e11 & ~(e00 | e01 | e10)
    z = g.dtype.type(0)

    def iw(a, b):
        n, h, w, c = a.shape
        return jnp.stack([a, b], axis=3).reshape(n, h, 2 * w, c)

    row0 = iw(jnp.where(e00, g, z), jnp.where(f01, g, z))
    row1 = iw(jnp.where(f10, g, z), jnp.where(f11, g, z))
    n, h, w, c = row0.shape
    return (jnp.stack([row0, row1], axis=2).reshape(n, 2 * h, w, c),)


pool_masked.defvjp(_pm_fwd, _pm_bwd)


@jax.custom_vjp
def pool_lane(x):
    return fwd_lane(x)


def _pl_fwd(x):
    y = fwd_lane(x)
    return y, (x, y)


def _pl_bwd(res, g):
    x, y = res
    n, h, w, c = x.shape
    z = x.reshape(n, h, w // 2, 2 * c)
    x00, x01 = z[:, ::2, :, :c], z[:, ::2, :, c:]
    x10, x11 = z[:, 1::2, :, :c], z[:, 1::2, :, c:]
    e00, e01, e10, e11 = (x00 == y), (x01 == y), (x10 == y), (x11 == y)
    f01 = e01 & ~e00
    f10 = e10 & ~(e00 | e01)
    f11 = e11 & ~(e00 | e01 | e10)
    zro = g.dtype.type(0)
    row0 = jnp.concatenate(
        [jnp.where(e00, g, zro), jnp.where(f01, g, zro)], axis=-1)
    row1 = jnp.concatenate(
        [jnp.where(f10, g, zro), jnp.where(f11, g, zro)], axis=-1)
    dz = jnp.stack([row0, row1], axis=2).reshape(n, h, w // 2, 2 * c)
    return (dz.reshape(n, h, w, c),)


pool_lane.defvjp(_pl_fwd, _pl_bwd)


# ------------------------------------------------------------- measurement
def time_fwd(f, shape, n1):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(*shape), jnp.float32).astype(jnp.bfloat16)

    def body(carry):
        s, x = carry
        e = (s * 1e-38).astype(x.dtype)
        y = f(x + e)
        return jnp.sum(jnp.square(y), dtype=jnp.float32) * 1e-30, x

    return scan_diff_ms(body, (jnp.float32(0.0), x), n1=n1, reps=2)


def time_fwdbwd(f, shape, n1):
    rng = np.random.RandomState(0)
    n, h, w, c = shape
    x = jnp.asarray(rng.rand(*shape), jnp.float32).astype(jnp.bfloat16)
    dy0 = jnp.asarray(rng.rand(n, h // 2, w // 2, c), jnp.float32
                      ).astype(jnp.bfloat16)

    def body(carry):
        s, x, dy0 = carry
        e = (s * 1e-38).astype(x.dtype)
        y, vjp = jax.vjp(f, x + e)
        (dx,) = vjp(dy0 * (1 + e))
        q = (jnp.sum(jnp.square(y), dtype=jnp.float32)
             + jnp.sum(jnp.square(dx), dtype=jnp.float32))
        return q * 1e-30, x, dy0

    return scan_diff_ms(body, (jnp.float32(0.0), x, dy0), n1=n1, reps=2)


def check_exact():
    """All designs agree bit-exactly with the shipped custom VJP (which is
    golden-parity-pinned), including tie routing on plateaus."""
    rng = np.random.RandomState(7)
    # quantized values force ties; relu-like zeros force plateau windows
    x = jnp.asarray(
        np.maximum(rng.randint(-2, 4, size=(2, 8, 8, 4)), 0),
        jnp.float32).astype(jnp.bfloat16)
    g = jnp.asarray(rng.rand(2, 4, 4, 4), jnp.float32).astype(jnp.bfloat16)
    y0, vjp0 = jax.vjp(max_pool_2x2, x)
    (dx0,) = vjp0(g)
    for name, f in [("slice", fwd_slice), ("lane", fwd_lane)]:
        np.testing.assert_array_equal(np.asarray(f(x)), np.asarray(y0), name)
    for pool in (pool_lane, pool_masked):
        y1, vjp1 = jax.vjp(pool, x)
        (dx1,) = vjp1(g)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y0))
        np.testing.assert_array_equal(np.asarray(dx1), np.asarray(dx0))
    print("exactness: ok (fwd x2, lane+masked vjp tie routing)", flush=True)


def main():
    from keypoints_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    print("platform:", jax.devices()[0].platform, flush=True)
    check_exact()
    path = os.path.join(_HERE, "pool_alts.json")
    out = {"device": jax.devices()[0].platform,
           "method": "floor_proof.scan_diff_ms, squared f32 consumes"}
    if os.path.exists(path) and "--resume" in sys.argv:
        with open(path) as fh:
            out.update(json.load(fh))
    for shape in SHAPES:
        n, h, w, c = shape
        n1 = 30 if h >= 256 else 100
        key = f"{n}x{h}x{w}x{c}"
        done = out.get(key, {})
        nb_fwd = 2 * n * h * w * c + 2 * n * (h // 2) * (w // 2) * c
        nb_bwd = nb_fwd + 2 * 2 * n * h * w * c // 4 + 2 * n * h * w * c
        row = {"read_write_floor_fwd_ms":
               round(nb_fwd / HBM_BYTES_PER_S * 1e3, 3),
               "read_write_floor_fwdbwd_ms":
               round(nb_bwd / HBM_BYTES_PER_S * 1e3, 3)}
        from keypoints_tpu.kernels.pool_pallas import max_pool_2x2_pallas
        for name, f in [("fwd_rw", fwd_rw), ("fwd_slice", fwd_slice),
                        ("fwd_lane", fwd_lane),
                        ("fwd_pallas", max_pool_2x2_pallas)]:
            row[name] = done.get(name) or round(time_fwd(f, shape, n1), 3)
            print(key, name, row[name], flush=True)
            out[key] = row
            with open(path, "w") as fh:
                json.dump(out, fh, indent=1)
        for name, f in [("fb_custom", pool_masked), ("fb_sas", fwd_rw),
                        ("fb_lane", pool_lane),
                        ("fb_pallas", max_pool_2x2_pallas)]:
            row[name] = done.get(name) or round(time_fwdbwd(f, shape, n1), 3)
            print(key, name, row[name], flush=True)
            out[key] = row
            with open(path, "w") as fh:
                json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
