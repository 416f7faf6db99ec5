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


def run_trace(logdir, preset="celeba128", batch=None, with_loss=False,
              steps=20):
    """Trace ``steps`` real train steps of ``preset`` (shared by the
    celeba128 entry point here and benchmarks/profile_pose.py)."""
    from keypoints_tpu.configs import get_config
    from keypoints_tpu.train import make_loss
    from keypoints_tpu.training import build_model, init_state, make_train_step
    cfg = get_config(preset)
    b = batch or cfg.train.batch_size
    state = init_state(cfg, jax.random.PRNGKey(0))
    loss = make_loss(cfg) if with_loss else None
    step = jax.jit(make_train_step(cfg, build_model(cfg), loss=loss),
                   donate_argnums=(0,))
    s = cfg.data.image_size
    img = jnp.asarray(np.random.RandomState(0).rand(b, 3, s, s), jnp.float32)
    k = jax.random.PRNGKey(1)
    state, m = step(state, img, k)          # compile
    np.asarray(m["loss"])
    jax.profiler.start_trace(logdir)
    for _ in range(steps):
        state, m = step(state, img, k)      # aug varies via state.step fold-in
    np.asarray(m["loss"])
    jax.profiler.stop_trace()


def parse(logdir, steps=20, top_n=25):
    """Sum op durations on the device 'XLA Ops' track only."""
    paths = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))
    assert paths, f"no trace under {logdir}"
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    ev = data["traceEvents"]
    ops_tid = None
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "thread_name" \
                and e["args"].get("name") == "XLA Ops":
            ops_tid = (e["pid"], e["tid"])
    per = defaultdict(float)
    args_of = {}
    total = 0.0
    for e in ev:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) != ops_tid:
            continue
        per[e["name"]] += e["dur"]
        total += e["dur"]
        args_of.setdefault(e["name"], e.get("args") or {})
    print(f"XLA Ops total: {total/steps/1e3:.2f} ms/step")
    for n, d in sorted(per.items(), key=lambda kv: -kv[1])[:top_n]:
        ln = (args_of[n].get("long_name") or "")[:110]
        print(f"{d/steps/1e3:8.3f} ms  {n[:36]:36s} {ln}")


if __name__ == "__main__":
    logdir = "/tmp/kp_profile"
    run_trace(logdir)
    parse(logdir)
