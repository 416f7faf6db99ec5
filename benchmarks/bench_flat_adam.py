"""Tree-Adam vs flat-Adam (optax.flatten) — RESOLVED NEGATIVE, kept as record.

An early dispatch-loop measurement showed the optimizer update at ~2.5 ms
against an 0.018 ms bytes floor, suggesting per-leaf Adam's tiny-HLO launch
overhead dominated and ``optax.flatten`` (one raveled vector,
trajectory-identical) could recover ~2 ms of the step. The corrected
IN-GRAPH difference timing (floor_proof.py, same integrity rules) measures
tree-Adam at **0.046 ms**: inside a jitted graph XLA fuses the per-leaf ops
fine; the 2.5 ms was axon-tunnel dispatch overhead booked per update.
Nothing to win — the step keeps the plain tree optimizer.

Measures: (a) the update alone, tree vs flat; (b) the full celeba128/b128
train step with each optimizer (the numbers that settled it).

Usage: python benchmarks/bench_flat_adam.py
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    np.asarray(jnp.ravel(jax.tree_util.tree_leaves(x)[0])[:1])


def scan_diff_ms(body, carry0, n1=20, reps=3):
    f1 = jax.jit(lambda c: jax.lax.fori_loop(0, n1, lambda i, cc: body(cc), c))
    f2 = jax.jit(lambda c: jax.lax.fori_loop(0, 2 * n1,
                                             lambda i, cc: body(cc), c))

    def t(f):
        _sync(f(carry0))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _sync(f(carry0))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(f2) - t(f1)) / n1 * 1e3


def main():
    import optax

    from keypoints_tpu.configs import get_config
    from keypoints_tpu.training import (build_model, init_state,
                                        make_optimizer, make_train_step)
    from keypoints_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    cfg = get_config("celeba128").override(**{"train.batch_size": 128})
    state = init_state(cfg, jax.random.PRNGKey(0))
    grads = jax.tree_util.tree_map(jnp.ones_like, state.params)

    for name, tx in [("tree", make_optimizer(cfg)),
                     ("flat", optax.flatten(make_optimizer(cfg)))]:
        opt0 = tx.init(state.params)

        def body(c):
            params, opt, grads = c
            u, opt = tx.update(grads, opt, params)
            return optax.apply_updates(params, u), opt, grads

        ms = scan_diff_ms(body, (state.params, opt0, grads), n1=400)
        print(f"adam update [{name}]: {ms:7.3f} ms", flush=True)

    # full step A/B
    model = build_model(cfg)
    img = jnp.asarray(np.random.RandomState(0).rand(128, 3, 128, 128),
                      jnp.float32)
    k = jax.random.PRNGKey(1)
    for name, tx in [("tree", None),
                     ("flat", optax.flatten(make_optimizer(cfg)))]:
        step = make_train_step(cfg, model, tx=tx)
        st = init_state(cfg, jax.random.PRNGKey(0))
        if tx is not None:
            st = st._replace(opt_state=tx.init(st.params))

        def body(c):
            s, img = c              # img rides the carry (no HLO constant)
            s2, _ = step(s, img, k)
            return s2, img

        ms = scan_diff_ms(body, (st, img), n1=15)
        print(f"train step  [{name}]: {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
