"""TPU bench: full celeba128 train step (state carried through a fori-loop
so nothing is dead-code-eliminated), with the no-aug ablation."""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from benchmarks.bench_aug import _t  # noqa: E402
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


def main():
    print(jax.devices(), flush=True)
    b = 128
    img = jnp.asarray(np.random.RandomState(0).rand(b, 3, 128, 128),
                      jnp.float32)
    dt = step_time("celeba128", img)
    print(f"train_step     {dt*1e3:8.3f} ms   ({b/dt:.0f} fps)", flush=True)
    dt0 = step_time("celeba128", (img, img), **{"data.pair_mode": "temporal"})
    print(f"step_no_aug    {dt0*1e3:8.3f} ms   (in-step aug = "
          f"{(dt-dt0)*1e3:.3f} ms)", flush=True)


if __name__ == "__main__":
    main()
