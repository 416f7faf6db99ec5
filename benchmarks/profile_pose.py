"""Profile the pose256 perceptual train step at the preset batch.

Same method as profile_step.py (trace ~10 real steps, sum the XLA Ops
track), pointed at the pose256 preset: the 256-px perceptual config whose
step is VGG-dominated. Ground truth for where the ~190 ms b128 step goes —
in particular how much the two max-pool backwards (XLA select-and-scatter)
cost at this batch.

Usage: python benchmarks/profile_pose.py [batch] (default: preset batch)
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from benchmarks.profile_step import parse  # noqa: E402
from keypoints_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

STEPS = 10


def run_trace(logdir, batch=None):
    from keypoints_tpu.configs import get_config
    from keypoints_tpu.train import make_loss
    from keypoints_tpu.training import build_model, init_state, make_train_step
    cfg = get_config("pose256")
    b = batch or cfg.train.batch_size
    state = init_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, build_model(cfg), loss=make_loss(cfg)),
                   donate_argnums=(0,))
    s = cfg.data.image_size
    img = jnp.asarray(np.random.RandomState(0).rand(b, 3, s, s), jnp.float32)
    k = jax.random.PRNGKey(1)
    state, m = step(state, img, k)          # compile
    np.asarray(m["loss"])
    jax.profiler.start_trace(logdir)
    for _ in range(STEPS):
        state, m = step(state, img, k)      # aug varies via state.step fold-in
    np.asarray(m["loss"])
    jax.profiler.stop_trace()


if __name__ == "__main__":
    enable_compile_cache()
    logdir = "/tmp/kp_profile_pose"
    run_trace(logdir, int(sys.argv[1]) if len(sys.argv) > 1 else None)
    parse(logdir, steps=STEPS, top_n=30)
