"""Full benchmark suite: every BASELINE metric, JSON artifact per run.

SURVEY.md §4.6 "benchmarks as tests" — emits the three BASELINE metrics
(train frames/sec/chip at 128px, keypoint-extract imgs/sec, parity vs golden)
plus per-config step timings, to ``benchmarks/results_<platform>.json`` so
regressions are diffable. The driver-facing single-line bench stays in
``bench.py``; this is the developer-facing sweep.

Usage: python benchmarks/run_all.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def time_step(step, state, batch, rng, iters):
    state, m = step(state, batch, rng)
    _sync(m)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch, rng)
    _sync(m)
    return (time.perf_counter() - t0) / iters


def bench_config(name, batch, iters):
    from keypoints_tpu.configs import get_config
    from keypoints_tpu.train import make_loss
    from keypoints_tpu.training import build_model, init_state, make_train_step

    cfg = get_config(name)
    if batch is None:                      # None = the preset's shipped batch
        batch = cfg.train.batch_size
    else:
        cfg = cfg.override(**{"train.batch_size": batch})
    model = build_model(cfg)
    state = init_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, model, loss=make_loss(cfg)),
                   donate_argnums=(0,))
    s, c = cfg.data.image_size, cfg.data.channels
    imgs = jnp.asarray(np.random.RandomState(0).rand(batch, c, s, s),
                       jnp.float32)
    batch_in = imgs if cfg.data.pair_mode == "warp" else (imgs, imgs)
    dt = time_step(step, state, batch_in, jax.random.PRNGKey(1), iters)
    return {"config": name, "batch": batch, "ms_per_step": round(dt * 1e3, 2),
            "frames_per_sec": round(batch / dt, 1)}


def bench_extract(batch, iters):
    from keypoints_tpu.configs import get_config
    from keypoints_tpu.training import (build_model, init_state,
                                        make_extract_fn)
    cfg = get_config("celeba128")
    model = build_model(cfg)
    state = init_state(cfg, jax.random.PRNGKey(0))
    extract = jax.jit(make_extract_fn(cfg, model))
    imgs = jnp.asarray(np.random.RandomState(0).rand(batch, 3, 128, 128),
                       jnp.float32)
    _sync(extract(state.params, imgs))
    t0 = time.perf_counter()
    for _ in range(iters):
        kp = extract(state.params, imgs)
    _sync(kp)
    return {"metric": "keypoint_extract_imgs_per_sec",
            "value": round(iters * batch / (time.perf_counter() - t0), 1)}


def parity_check():
    """Full-model coordinate parity vs the golden torch model (<1e-3 bar)."""
    import subprocess
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_model_parity.py", "-q",
         "--no-header"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    passed = r.returncode == 0
    return {"metric": "parity_vs_golden", "passed": passed,
            "detail": (r.stdout.strip().splitlines() or ["no output"])[-1]}


def main():
    from keypoints_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()
    platform = jax.devices()[0].platform
    iters = 5 if (args.quick or platform == "cpu") else 20
    batch = 16 if platform == "cpu" else 128

    results = {
        "platform": platform,
        "device": str(jax.devices()[0]),
        "train": [bench_config("celeba128", batch, iters),
                  bench_config("pong64", batch, iters),
                  # pose256 at its shipped batch: read the preset default so
                  # this sweep always measures the configuration users get
                  # (hardcoding went stale when the default moved b64 -> b128)
                  bench_config("pose256", 4 if platform == "cpu" else None,
                               iters)],
        # extract saturates at b1024 (sweep 2026-08-16; bench.py matches)
        "extract": bench_extract(1024 if platform != "cpu" else 2 * batch,
                                 iters),
        "parity": parity_check(),
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f"results_{platform}.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
