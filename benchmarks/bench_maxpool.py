"""Micro-bench: max-pool 2x2 backward — select-and-scatter vs masked VJP.

**SUPERSEDED (r5) by benchmarks/bench_pool_alts.py.** The original version
of this harness consumed only ``dx.ravel()[0]``, so XLA sliced through the
masked-VJP design's elementwise graph and understated it ~2.2× — which is
how the r4 custom VJP got (wrongly) crowned and shipped. The consume below
is fixed (squared f32 sums of every output byte, the floor_proof rule) so
re-running reproduces pool_alts.json's honest numbers: select-and-scatter
WINS at b128 and models/vgg.py ships plain reduce-window autodiff.

Run on the TPU: python benchmarks/bench_maxpool.py
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

sys.path.insert(0, ".")

from benchmarks.bench_pool_alts import pool_masked  # noqa: E402
from keypoints_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402


def timed_loop(fn, x, iters):
    """n vs 2n fori-loop difference timing (bench_step.py pattern); each
    iteration's output feeds the next carry so nothing is DCE'd."""
    import functools

    def many(x, n):
        # consume EVERY output byte with a squared f32 reduce folded back
        # into the carry (floor_proof integrity rule) — the original
        # .ravel()[0] consume let XLA slice through elementwise-mask
        # designs and understate them ~2.2x (the r4 mis-crowning)
        def body(i, carry):
            q = jnp.sum(jnp.square(fn(carry)), dtype=jnp.float32)
            return carry + q.astype(carry.dtype) * 1e-20
        return jax.lax.fori_loop(0, n, body, x)

    f1 = jax.jit(functools.partial(many, n=iters))
    f2 = jax.jit(functools.partial(many, n=2 * iters))

    def run(f):
        np.asarray(f(x).ravel()[:1])

    run(f1); run(f2)

    def t(f):
        t0 = time.perf_counter()
        run(f)
        return time.perf_counter() - t0

    t1 = min(t(f1) for _ in range(3))
    t2 = min(t(f2) for _ in range(3))
    return (t2 - t1) / iters


def bench(shape, dtype, iters=30):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(*shape), dtype)

    def base_fb(x):
        y, vjp = jax.vjp(lambda v: nn.max_pool(v, (2, 2), strides=(2, 2)), x)
        return vjp(y)[0]

    def custom_fb(x):
        y, vjp = jax.vjp(pool_masked, x)
        return vjp(y)[0]

    tb = timed_loop(base_fb, x, iters)
    tc = timed_loop(custom_fb, x, iters)
    print(f"{shape} {jnp.dtype(dtype).name}: select-and-scatter "
          f"{tb * 1e3:7.3f} ms   custom VJP {tc * 1e3:7.3f} ms   "
          f"({tb / tc:.2f}x)", flush=True)
    return tb, tc


if __name__ == "__main__":
    enable_compile_cache()
    print(f"platform: {jax.devices()[0].platform}", flush=True)
    # pose256 b128 recon-branch pool shapes (NHWC, bf16 trunk)
    bench((128, 256, 256, 64), jnp.bfloat16)
    bench((128, 128, 128, 128), jnp.bfloat16)
    # celeba-scale sanity (not on the hot path — VGG only runs at pose256)
    bench((128, 64, 64, 128), jnp.bfloat16)
