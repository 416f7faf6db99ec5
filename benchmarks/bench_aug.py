"""TPU bench: augmentation step breakdown at celeba128 shapes.

Times each stage of the device-side aug pipeline (grid eval, warp, color
jitter, full make_pair) plus the full train step, via the fori-loop
difference method (see bench_marginal.py).
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from keypoints_tpu.data.augment import (WarpConfig, make_pair,
                                        random_warp_grid, warp_y_window)
from keypoints_tpu.kernels import warp_sample
from keypoints_tpu.ops.color import color_jitter


def loop_time(fn, args, iters=100):
    def many(a, n):
        def body(i, carry):
            acc, a0 = carry
            out = fn(jax.tree_util.tree_map(lambda v: v + 1e-6 * i
                                            if v.dtype.kind == "f" else v,
                                            a0))
            leaf = jax.tree_util.tree_leaves(out)[0]
            return (acc + leaf.ravel()[0].astype(jnp.float32), a0)
        return jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), a))[0]

    f1 = jax.jit(functools.partial(many, n=iters))
    f2 = jax.jit(functools.partial(many, n=2 * iters))

    def run(f):
        np.asarray(f(args))

    run(f1); run(f2)
    t1 = min(_t(run, f1) for _ in range(3))
    t2 = min(_t(run, f2) for _ in range(3))
    return (t2 - t1) / iters


def _t(run, f):
    t0 = time.perf_counter(); run(f); return time.perf_counter() - t0


def main():
    print(jax.devices(), flush=True)
    b, c, s = 128, 3, 128
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(b, c, s, s), jnp.float32)
    key = jax.random.PRNGKey(0)
    cfg = WarpConfig()
    win = warp_y_window(cfg, s)
    grid = jax.jit(lambda k: random_warp_grid(k, b, s, s, cfg))(key)
    grid = jax.block_until_ready(grid)
    print("y_window(raw bound):", win, flush=True)

    stages = {
        "grid_eval": (lambda im: random_warp_grid(key, b, s, s, cfg), img),
        "warp_pallas": (lambda im: warp_sample(im, grid, "border", True,
                                               y_window=win), img),
        "color_jitter": (lambda im: color_jitter(key, im, 0.2, 0.2, 0.2), img),
        "make_pair": (lambda im: make_pair(key, im, cfg), img),
    }
    for name, (fn, a) in stages.items():
        dt = loop_time(fn, a, iters=60)
        print(f"{name:14s} {dt*1e3:8.3f} ms", flush=True)

    # full train step: carry the WHOLE state through the loop so nothing is
    # dead-code-eliminated (returning only the loss lets XLA prune the
    # backward + optimizer update — measured 14 ms vs the real ~34 ms).
    from keypoints_tpu.configs import get_config
    from keypoints_tpu.training import build_model, init_state, make_train_step

    def step_time(cfg_name, batch, iters=30, **over):
        tcfg = get_config(cfg_name).override(**over) if over \
            else get_config(cfg_name)
        state = init_state(tcfg, jax.random.PRNGKey(0))
        step = make_train_step(tcfg, build_model(tcfg))
        k2 = jax.random.PRNGKey(1)

        def many(st, n):
            def body(i, s0):
                s1, _ = step(s0, batch, jax.random.fold_in(k2, i))
                return s1
            return jax.lax.fori_loop(0, n, body, s0 := st).params

        f1 = jax.jit(functools.partial(many, n=iters))
        f2 = jax.jit(functools.partial(many, n=2 * iters))

        def run(f):
            out = f(state)
            np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])

        run(f1); run(f2)
        t1 = min(_t(run, f1) for _ in range(3))
        t2 = min(_t(run, f2) for _ in range(3))
        return (t2 - t1) / iters

    dt = step_time("celeba128", img)
    print(f"train_step     {dt*1e3:8.3f} ms   ({b/dt:.0f} fps)", flush=True)
    dt0 = step_time("celeba128", (img, img), **{"data.pair_mode": "temporal"})
    print(f"step_no_aug    {dt0*1e3:8.3f} ms   (in-step aug = "
          f"{(dt-dt0)*1e3:.3f} ms)", flush=True)


if __name__ == "__main__":
    main()
