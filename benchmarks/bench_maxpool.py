"""Micro-bench: max-pool 2x2 backward — select-and-scatter vs custom VJP.

XLA lowers the gradient of ``reduce_window(max)`` to ``select-and-scatter``,
a windowed sequential scan that is notoriously slow on TPU. The custom VJP
in models/vgg.py (``max_pool_2x2``) replaces it with strided compares +
first-occurrence masks (exact, same tie routing). This measures fwd+bwd of
both at the VGG pool shapes pose256-b128 actually runs (pool1/pool2 of the
recon branch), using fori-loop difference timing (the only reliable sub-ms
method through the axon tunnel — see CLAUDE.md).

Run on the TPU: python benchmarks/bench_maxpool.py
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

sys.path.insert(0, ".")

from keypoints_tpu.models.vgg import max_pool_2x2  # noqa: E402
from keypoints_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402


def timed_loop(fn, x, iters):
    """n vs 2n fori-loop difference timing (bench_step.py pattern); each
    iteration's output feeds the next carry so nothing is DCE'd."""
    import functools

    def many(x, n):
        def body(i, carry):
            return carry + fn(carry).ravel()[0] * 1e-20
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
        y, vjp = jax.vjp(max_pool_2x2, x)
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
