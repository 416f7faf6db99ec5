"""pose256 batch-scaling experiment: rematerialized VGG trunk.

Question: the pose256 step is perceptual-VGG dominated and batch-starved —
b16→b64 bought +24% fps but b128 cannot fit (b64 already peaks 10.06 of
16 GiB, and activations scale linearly with batch). Does wrapping the
frozen-VGG feature fn in ``jax.checkpoint`` (recompute its activations in
the backward instead of keeping them) free enough HBM to run b128, and is
b128-with-remat actually FASTER per frame than b64-without?

Measures, per (batch, remat) cell: XLA compile-time peak HBM
(memory_analysis — no execution, so over-budget cells are safe to probe)
and, for cells that fit, chunked-scan fps timed like bench.py (constant
args, one D2H fetch at the end).

Run ON THE TPU:  python benchmarks/bench_pose_remat.py
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from keypoints_tpu.configs import get_config
from keypoints_tpu.losses import make_perceptual_loss
from keypoints_tpu.models.vgg import make_feature_fn
from keypoints_tpu.training import build_model, init_state, make_train_step
from keypoints_tpu.utils.compile_cache import enable_compile_cache

HBM_LIMIT = 15.0  # GiB — execute only cells with headroom under the 16

CHUNK = 10
ITERS = 30


def make_step(cfg, remat: bool):
    model = build_model(cfg)
    dtype = jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16" else None
    feat = make_feature_fn(layers=cfg.train.perceptual_layers, dtype=dtype)
    if remat:
        feat = jax.checkpoint(feat)
    loss = make_perceptual_loss(feat, cfg.train.perceptual_layers)
    base = make_train_step(cfg, model, loss=loss)

    def run(state, images, rng):
        def body(st, _):
            return base(st, images, rng)
        st, ms = jax.lax.scan(body, state, None, length=CHUNK)
        return st, jax.tree_util.tree_map(lambda x: x[-1], ms)

    return jax.jit(run, donate_argnums=(0,))


def cell(batch: int, remat: bool) -> dict:
    cfg = get_config("pose256").override(**{"train.batch_size": batch})
    s = cfg.data.image_size
    state = init_state(cfg, jax.random.PRNGKey(0))
    images = jnp.asarray(
        np.random.RandomState(0).rand(batch, 3, s, s), jnp.float32)
    rng = jax.random.PRNGKey(1)
    step = make_step(cfg, remat)
    compiled = step.lower(state, images, rng).compile()
    mem = compiled.memory_analysis()
    peak = getattr(mem, "peak_memory_in_bytes", 0) or 0
    out = {"batch": batch, "remat": remat,
           "peak_gib": round(peak / (1 << 30), 2)}
    if peak / (1 << 30) > HBM_LIMIT:
        out["fps"] = None
        out["note"] = "over budget — not executed"
        return out
    for _ in range(2):
        state, m = step(state, images, rng)
    np.asarray(m["loss"])
    t0 = time.perf_counter()
    n = max(ITERS // CHUNK, 1)
    for _ in range(n):
        state, m = step(state, images, rng)
    np.asarray(m["loss"])
    dt = time.perf_counter() - t0
    out["fps"] = round(n * CHUNK * batch / dt, 1)
    out["ms_per_step"] = round(dt / (n * CHUNK) * 1e3, 2)
    return out


def main():
    enable_compile_cache()
    print(jax.devices(), flush=True)
    results = []
    for batch, remat in [(64, False), (64, True), (128, True), (128, False)]:
        r = cell(batch, remat)
        print(json.dumps(r), flush=True)
        results.append(r)
    with open("benchmarks/results_pose_remat.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
