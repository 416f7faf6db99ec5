"""TPU bench: field-based fused warp vs round-1 dense-grid path.

Measures make_pair (now routed through warp_field_pallas), the full
celeba128 train step, and the 256² warp (compile time + throughput — the
round-1 blocker was a >15 min Mosaic compile at 256 wide).
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from benchmarks.bench_aug import loop_time, _t  # noqa: E402
from keypoints_tpu.data.augment import (WarpConfig, make_pair,
                                        random_warp_field, warp_y_window)
from keypoints_tpu.kernels import warp_sample_field


def main():
    print(jax.devices(), flush=True)
    b, c, s = 128, 3, 128
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(b, c, s, s), jnp.float32)
    key = jax.random.PRNGKey(0)
    cfg = WarpConfig()
    win = warp_y_window(cfg, s)
    field = jax.block_until_ready(
        jax.jit(lambda k: random_warp_field(k, b, cfg))(key))

    t0 = time.perf_counter()
    dt = loop_time(lambda im: warp_sample_field(im, field, s, s, "border",
                                                True, y_window=win),
                   img, iters=60)
    print(f"warp_field 128²  {dt*1e3:8.3f} ms  "
          f"(total incl compile {time.perf_counter()-t0:.0f}s)", flush=True)

    dt = loop_time(lambda im: make_pair(key, im, cfg), img, iters=60)
    print(f"make_pair        {dt*1e3:8.3f} ms", flush=True)

    # parity on TPU vs XLA oracle
    from keypoints_tpu.ops.warp import grid_sample, upsample_field_aligned
    got = np.asarray(jax.jit(lambda im: warp_sample_field(
        im, field, s, s, "border", True, y_window=win))(img))
    want = np.asarray(jax.jit(lambda im: grid_sample(
        im, upsample_field_aligned(field, s, s), "border", True))(img))
    print(f"parity 128²: max|Δ| = {np.abs(got-want).max():.2e}", flush=True)

    # full train step
    from benchmarks.bench_aug import main as _  # noqa: F401  (reuse helpers)
    from keypoints_tpu.configs import get_config
    from keypoints_tpu.training import build_model, init_state, make_train_step

    def step_time(batch, iters=30):
        tcfg = get_config("celeba128")
        state = init_state(tcfg, jax.random.PRNGKey(0))
        step = make_train_step(tcfg, build_model(tcfg))
        k2 = jax.random.PRNGKey(1)

        def many(st, n):
            def body(i, s0):
                s1, _ = step(s0, batch, jax.random.fold_in(k2, i))
                return s1
            return jax.lax.fori_loop(0, n, body, st).params

        f1 = jax.jit(functools.partial(many, n=iters))
        f2 = jax.jit(functools.partial(many, n=2 * iters))

        def run(f):
            out = f(state)
            np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])

        run(f1); run(f2)
        t1 = min(_t(run, f1) for _ in range(3))
        t2 = min(_t(run, f2) for _ in range(3))
        return (t2 - t1) / iters

    dt = step_time(img)
    print(f"train_step       {dt*1e3:8.3f} ms   ({b/dt:.0f} fps)", flush=True)

    # 256² warp: compile time is the headline
    s2 = 256
    img2 = jnp.asarray(rs.rand(16, 3, s2, s2), jnp.float32)
    f2 = jax.block_until_ready(
        jax.jit(lambda k: random_warp_field(k, 16, cfg))(key))
    win2 = warp_y_window(cfg, s2)
    t0 = time.perf_counter()
    out = jax.jit(lambda im: warp_sample_field(im, f2, s2, s2, "border",
                                               True, y_window=win2))(img2)
    np.asarray(out)[0, 0, 0, 0]
    print(f"warp_field 256² compile+run: {time.perf_counter()-t0:.0f}s",
          flush=True)
    dt = loop_time(lambda im: warp_sample_field(im, f2, s2, s2, "border",
                                                True, y_window=win2),
                   img2, iters=40)
    print(f"warp_field 256²  {dt*1e3:8.3f} ms for b16 "
          f"({16/dt:.0f} imgs/s)", flush=True)
    got = np.asarray(jax.jit(lambda im: warp_sample_field(
        im, f2, s2, s2, "border", True, y_window=win2))(img2))
    want = np.asarray(jax.jit(lambda im: grid_sample(
        im, upsample_field_aligned(f2, s2, s2), "border", True))(img2))
    print(f"parity 256²: max|Δ| = {np.abs(got-want).max():.2e}", flush=True)


if __name__ == "__main__":
    main()
