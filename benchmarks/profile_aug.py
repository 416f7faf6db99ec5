"""Itemize the in-step augmentation (VERDICT r3 missing #2): where do the
~7 ms of ``make_pair`` at celeba128/b128 go beyond the two 1.65 ms Pallas
warps? Traces the aug-only program (tiny, safe to trace through the
tunnel) and prints the device-op table, then times each stage standalone
(field eval, upsample, warp, jitter) for cross-checking.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))   # repo root (keypoints_tpu)
sys.path.insert(0, _HERE)                    # sibling profile_step
from profile_step import parse  # noqa: E402


def main(batch=128, steps=30, logdir="/tmp/kp_profile_aug"):
    from keypoints_tpu.configs import get_config
    from keypoints_tpu.data.augment import (make_pair, random_warp_field,
                                            warp_y_window)
    from keypoints_tpu.kernels import warp_sample
    from keypoints_tpu.ops.color import color_jitter
    from keypoints_tpu.ops.warp import upsample_field_aligned
    from keypoints_tpu.training import warp_config
    from keypoints_tpu.utils.profiling import timed

    cfg = get_config("celeba128")
    wcfg = warp_config(cfg)
    s = cfg.data.image_size
    img = jnp.asarray(np.random.RandomState(0).rand(batch, 3, s, s),
                      jnp.float32).astype(jnp.bfloat16)
    key = jax.random.PRNGKey(2)

    pair = jax.jit(lambda k, b: make_pair(k, b, wcfg))
    src, tgt = pair(key, img)
    np.asarray(src[0, 0, 0, :2], np.float32)

    jax.profiler.start_trace(logdir)
    for _ in range(steps):
        src, tgt = pair(key, img)
    np.asarray(src[0, 0, 0, :2], np.float32)
    jax.profiler.stop_trace()
    parse(logdir, steps=steps, top_n=30)

    # standalone stage timings (dispatch-separated, so they include
    # per-call overheads the fused trace amortizes — cross-check only)
    win = warp_y_window(wcfg, s)
    field = jax.jit(lambda k: random_warp_field(k, batch, wcfg))
    f = field(key)
    up = jax.jit(lambda f: upsample_field_aligned(f, s, s))
    g = up(f)
    warp = jax.jit(lambda i, g: warp_sample(i, g, padding_mode="border",
                                            y_window=win))
    w = warp(img, g)
    jit_ = jax.jit(lambda k, i: color_jitter(k, i, wcfg.brightness,
                                             wcfg.contrast, wcfg.saturation))
    import time

    def loop_ms(fn, *args, iters=50):
        out = fn(*args)
        np.asarray(jnp.ravel(out[0] if isinstance(out, tuple) else out)[:1])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(jnp.ravel(out[0] if isinstance(out, tuple) else out)[:1])
        return (time.perf_counter() - t0) / iters * 1e3

    del timed  # unused; loop timing amortizes the ~28 ms tunnel fetch
    for name, fn, args in [
            ("field_eval", field, (key,)),
            ("upsample", up, (f,)),
            ("warp", warp, (img, g)),
            ("jitter", jit_, (key, w)),
            ("make_pair", pair, (key, img))]:
        print(f"{name:12s} {loop_ms(fn, *args):7.3f} ms (wall, standalone "
              f"dispatch)")


if __name__ == "__main__":
    main()
