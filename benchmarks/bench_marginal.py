"""TPU bench: flat roll-tree marginal soft-argmax (Pallas) vs XLA.

Two-length difference timing (CLAUDE.md: block_until_ready is a no-op via
the axon tunnel and a D2H fetch costs ~28 ms flat, so per-op time =
(t(2M) - t(M)) / M with one fetch per run).

Usage: python benchmarks/bench_marginal.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from keypoints_tpu.kernels.spatial_softmax_pallas import spatial_softmax_pallas
from keypoints_tpu.ops.spatial_softmax import marginal_softmax


def loop_time(fn, x, iters):
    """Device time per call: N iterations inside ONE jitted fori_loop (a
    single dispatch + fetch), differenced across two loop lengths so the
    fixed ~28 ms tunnel fetch and dispatch cost cancel."""

    def many(v, n):
        def body(i, acc):
            out = fn(v + 1e-6 * i)        # iteration-dependent input: no CSE
            leaf = jax.tree_util.tree_leaves(out)[0]
            return acc + leaf.ravel()[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    f1 = jax.jit(functools.partial(many, n=iters))
    f2 = jax.jit(functools.partial(many, n=2 * iters))

    def run(f):
        np.asarray(f(x))

    run(f1); run(f2)                      # compile + warm
    t1 = min(_once(run, f1) for _ in range(3))
    t2 = min(_once(run, f2) for _ in range(3))
    return (t2 - t1) / iters


def _once(run, f):
    t0 = time.perf_counter()
    run(f)
    return time.perf_counter() - t0


def main():
    print(jax.devices(), flush=True)
    shapes = [(128, 10, 32, 32),    # celeba128
              (256, 4, 16, 16),     # pong64
              (64, 16, 32, 32),     # pose256
              (128, 10, 64, 64)]    # stress
    for b, k, h, w in shapes:
        x = jnp.asarray(np.random.RandomState(0).randn(b, k, h, w) * 3,
                        jnp.float32)
        g = jnp.ones((b, k, 2), jnp.float32)

        f_xla = jax.jit(lambda v: marginal_softmax(v, 0.7))
        f_pal = jax.jit(lambda v: spatial_softmax_pallas(v, 0.7, "marginal"))
        # vjp: grad of g.kp wrt heatmaps
        vj_xla = jax.jit(lambda v: jax.grad(
            lambda u: jnp.vdot(marginal_softmax(u, 0.7), g))(v))
        vj_pal = jax.jit(lambda v: jax.grad(
            lambda u: jnp.vdot(spatial_softmax_pallas(u, 0.7, "marginal"),
                               g))(v))

        # parity on-device first
        kp1, kp2 = np.asarray(f_xla(x)), np.asarray(f_pal(x))
        err = float(np.abs(kp1 - kp2).max())
        g1, g2 = np.asarray(vj_xla(x)), np.asarray(vj_pal(x))
        gerr = float(np.abs(g1 - g2).max())

        iters = 300
        t = {n: loop_time(f, x, iters) * 1e6
             for n, f in [("xla_fwd", f_xla), ("pal_fwd", f_pal),
                          ("xla_vjp", vj_xla), ("pal_vjp", vj_pal)]}
        print(f"({b},{k},{h},{w}) kp_err={err:.2e} g_err={gerr:.2e} "
              + " ".join(f"{n}={v:8.1f}us" for n, v in t.items())
              + f"  fwd x{t['xla_fwd']/t['pal_fwd']:.2f}"
              + f" vjp x{t['xla_vjp']/t['pal_vjp']:.2f}", flush=True)

    # fused bottleneck, marginal: extract+render vs XLA softmax + pallas raster
    from keypoints_tpu.kernels import gaussian_maps
    from keypoints_tpu.kernels.fused_bottleneck import softargmax_raster_fused
    b, k, h, w = 128, 10, 32, 32
    x = jnp.asarray(np.random.RandomState(0).randn(b, k, h, w) * 3,
                    jnp.float32)

    def unfused(v):
        kp = marginal_softmax(v, 0.7)
        return kp, gaussian_maps(kp, h, w, 0.1)

    def fused(v):
        return softargmax_raster_fused(v, h, w, 0.7, 0.1, variant="marginal")

    fu, un = jax.jit(fused), jax.jit(unfused)
    kpf, mf = fu(x); kpu, mu = un(x)
    print("fused marginal bottleneck: kp_err=%.2e map_err=%.2e" %
          (float(jnp.abs(kpf - kpu).max()), float(jnp.abs(mf - mu).max())),
          flush=True)
    tf = loop_time(lambda v: fu(v)[1], x, 300) * 1e6
    tu = loop_time(lambda v: un(v)[1], x, 300) * 1e6
    print(f"bottleneck unfused={tu:.1f}us fused={tf:.1f}us x{tu/tf:.2f}",
          flush=True)


if __name__ == "__main__":
    main()
