"""Input-path bench at real CelebA scale: loader vs step rate.

Builds a large synthetic packed store (default 6 GB: 128k frames of
3×128² u8 — VERDICT r1 #6's bar), then measures

  * grain host streaming throughput at several worker counts,
  * the dynamic device budget's admission decision + HBM upload time +
    device-resident sampling rate (TPU only),

against the celeba128 train-step rate (~3.7k frames/s).

Usage: python benchmarks/bench_input.py [--gb 6] [--dir /tmp]
"""

import argparse
import itertools
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def build_store(path: str, n_frames: int, c=3, s=128, chunk=4096):
    from numpy.lib.format import open_memmap
    if os.path.exists(path):
        arr = np.load(path, mmap_mode="r")
        if arr.shape[0] == n_frames:
            print(f"reusing {path} {arr.shape}", flush=True)
            return
    print(f"building {path}: {n_frames}x{c}x{s}x{s} u8 "
          f"({n_frames*c*s*s/2**30:.2f} GiB)", flush=True)
    mm = open_memmap(path, mode="w+", dtype=np.uint8,
                     shape=(n_frames, c, s, s))
    rs = np.random.RandomState(0)
    for i in range(0, n_frames, chunk):
        j = min(i + chunk, n_frames)
        mm[i:j] = rs.randint(0, 256, (j - i, c, s, s), np.uint8)
    mm.flush()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gb", type=float, default=6.0)
    p.add_argument("--dir", default="/tmp/kp_bench")
    p.add_argument("--batch", type=int, default=128)
    args = p.parse_args()

    os.makedirs(args.dir, exist_ok=True)
    s, c = 128, 3
    n_frames = int(args.gb * 2**30 // (c * s * s))
    path = f"{args.dir}/celeba_{s}.npy"
    build_store(path, n_frames)

    from keypoints_tpu.data.records import FrameStore, prefetch, single_stream
    store = FrameStore(path)
    print(f"store: {store.frames.nbytes/2**30:.2f} GiB", flush=True)

    # host loader throughput (includes H2D + on-device u8->f32)
    for workers in (1, 4, 8, 16):
        it = prefetch(single_stream(store, args.batch, seed=0,
                                    workers=workers))
        for _ in range(5):       # warm: page cache + jit of the divide
            next(it)
        n = 40
        t0 = time.perf_counter()
        for _ in range(n):
            b = next(it)
        np.asarray(b)[0, 0, 0, 0]   # sync
        dt = time.perf_counter() - t0
        print(f"loader workers={workers:2d}: "
              f"{n*args.batch/dt:8.0f} frames/s", flush=True)

    # device-resident path (TPU)
    import jax
    from keypoints_tpu.data.device import (DeviceDataset,
                                           device_memory_budget,
                                           fits_in_memory)
    budget = device_memory_budget()
    print(f"device budget: {budget/2**30:.2f} GiB; "
          f"fits: {fits_in_memory(store)}", flush=True)
    if fits_in_memory(store):
        from keypoints_tpu.data.device import sample_frames
        t0 = time.perf_counter()
        ds = DeviceDataset(store)
        jax.block_until_ready(ds.frames)
        np.asarray(ds.frames[0, 0, 0, :1])
        print(f"HBM upload: {time.perf_counter()-t0:.1f} s", flush=True)
        # frames passed as an ARGUMENT — a closure would serialize 6 GB
        # into the remote-compile payload (see data/device.py)
        fn = jax.jit(lambda fr, k: sample_frames(fr, k, args.batch))
        k = jax.random.PRNGKey(0)
        np.asarray(fn(ds.frames, k))[0, 0, 0, 0]
        n = 100
        t0 = time.perf_counter()
        for i in range(n):
            out = fn(ds.frames, jax.random.fold_in(k, i))
        np.asarray(out)[0, 0, 0, 0]
        dt = time.perf_counter() - t0
        print(f"device-resident sample: {n*args.batch/dt:8.0f} frames/s",
              flush=True)


if __name__ == "__main__":
    main()
