"""Profile the pose256 perceptual train step at the preset batch.

Same method as profile_step.py (trace ~10 real steps, sum the XLA Ops
track) — this just points the shared tracer at the pose256 preset: the
256-px perceptual config whose step is VGG-dominated. Ground truth for
where the ~190 ms b128 step goes — in particular the max-pool backwards
(see models/vgg.py max_pool_2x2 and benchmarks/bench_maxpool.py).

Usage: python benchmarks/profile_pose.py [batch] (default: preset batch)
"""

import sys

sys.path.insert(0, ".")

from benchmarks.profile_step import parse, run_trace  # noqa: E402
from keypoints_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

STEPS = 10

if __name__ == "__main__":
    enable_compile_cache()
    logdir = "/tmp/kp_profile_pose"
    run_trace(logdir, preset="pose256", with_loss=True, steps=STEPS,
              batch=int(sys.argv[1]) if len(sys.argv) > 1 else None)
    parse(logdir, steps=STEPS, top_n=30)
