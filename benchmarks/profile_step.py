"""Profile the celeba128 train step and print the op-time breakdown.

Writes a jax.profiler trace of ~20 real steps, then parses the
trace.json.gz for device-op durations grouped by kernel family (pallas
warps, convs, everything else) — the ground truth for where the 33 ms
step goes.
"""

import glob
import gzip
import json
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def run_trace(logdir):
    from keypoints_tpu.configs import get_config
    from keypoints_tpu.training import build_model, init_state, make_train_step
    cfg = get_config("celeba128")
    state = init_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, build_model(cfg)),
                   donate_argnums=(0,))
    img = jnp.asarray(np.random.RandomState(0).rand(128, 3, 128, 128),
                      jnp.float32)
    k = jax.random.PRNGKey(1)
    state, m = step(state, img, k)          # compile
    np.asarray(m["loss"])
    jax.profiler.start_trace(logdir)
    for i in range(20):
        state, m = step(state, img, jax.random.fold_in(k, i))
    np.asarray(m["loss"])
    jax.profiler.stop_trace()


def parse(logdir):
    paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    assert paths, f"no trace under {logdir}"
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    per_op = defaultdict(float)
    total = 0.0
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        # device lanes only: TensorFlow Op events carry 'tf_op' or occur on
        # TPU tracks; use pid name heuristics via args
        args = ev.get("args") or {}
        name = ev.get("name", "")
        if not args and "." not in name and "%" not in name:
            continue
        cat = name.split(".")[0].split("(")[0][:60]
        per_op[cat] += ev["dur"]
        total += ev["dur"]
    top = sorted(per_op.items(), key=lambda kv: -kv[1])[:30]
    print(f"total device-op time over 20 steps: {total/1e3:.1f} ms")
    for name, dur in top:
        print(f"{dur/20/1e3:9.3f} ms/step  {name}")


if __name__ == "__main__":
    logdir = "/tmp/kp_profile"
    run_trace(logdir)
    parse(logdir)
