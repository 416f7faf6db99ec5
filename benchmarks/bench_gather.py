"""TPU bench: batch-of-frames gather from a device-resident u8 store.

``jnp.take`` over the leading axis of a (N, C, H, W) u8 array measured
~29 ms for 128 frames (215 MB/s — element-style gather). Alternatives:

  take_u8    : jnp.take on the u8 array (baseline)
  take_i32   : same frames viewed as i32 rows (4 pixels/word)
  slice_scan : lax.scan of dynamic_slice_in_dim — one contiguous DMA/frame
  onehot_mm  : one-hot (B, N) @ (N, bytes) matmul on the MXU
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from benchmarks.bench_aug import _t  # noqa: E402


def loop_time(fn, frames, iters=50):
    def many(fr, n):
        def body(i, acc):
            idx = jax.random.randint(jax.random.fold_in(
                jax.random.PRNGKey(0), i), (128,), 0, fr.shape[0])
            out = fn(fr, idx)
            # consume EVERY byte — slicing one element lets XLA gather
            # just that element and DCE the rest
            return acc + jnp.sum(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    f1 = jax.jit(functools.partial(many, n=iters))
    f2 = jax.jit(functools.partial(many, n=2 * iters))

    def run(f):
        np.asarray(f(frames))

    run(f1); run(f2)
    t1 = min(_t(run, f1) for _ in range(3))
    t2 = min(_t(run, f2) for _ in range(3))
    return (t2 - t1) / iters


def take_u8(fr, idx):
    return jnp.take(fr, idx, axis=0)


def take_i32(fr, idx):
    return jnp.take(fr, idx, axis=0)        # fr pre-viewed as i32


def slice_scan(fr, idx):
    def body(_, i):
        return None, jax.lax.dynamic_slice_in_dim(fr, i, 1, axis=0)[0]
    _, out = jax.lax.scan(body, None, idx)
    return out


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    args = ap.parse_args()
    print(jax.devices(), flush=True)
    n, c, s = args.n, 3, 128
    rs = np.random.RandomState(0)
    fr_u8 = jnp.asarray(rs.randint(0, 256, (n, c, s, s), np.uint8))
    fr_i32 = jnp.asarray(
        rs.randint(0, 2**31 - 1, (n, c * s * s // 4), np.int32))

    for name, fn, fr in [("take_u8", take_u8, fr_u8),
                         ("take_i32", take_i32, fr_i32),
                         ("slice_scan_u8", slice_scan, fr_u8),
                         ("slice_scan_i32", slice_scan, fr_i32)]:
        dt = loop_time(fn, fr)
        bts = 128 * c * s * s
        print(f"{name:16s} {dt*1e3:8.3f} ms/batch  "
              f"({bts/dt/2**30:6.1f} GiB/s)", flush=True)


if __name__ == "__main__":
    main()
