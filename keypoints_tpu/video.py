"""Keypoint-annotated video rendering: the reference's live cv2 viz, headless.

The reference drew keypoint markers in OpenCV GUI windows while training
(SURVEY.md §2.1 "Visualization", §3.5); a TPU pod has no display, so the
equivalent deliverable is a *file*: run the trained extractor over a frame
sequence and write an annotated video. This is also the natural demo/QA
artifact — "does the model track the ball / the face through the episode?"
is answered by watching 10 seconds of output.

    keypoints-video --preset transporter_atari \
        --checkpoint checkpoints/transporter_atari \
        --out tracked.mp4 --frames 600

Frames come from the preset's store (episode order — temporal stores are
written in rollout order), an explicit ``--store``, or any image folder
(``--folder``, converted in memory). Extraction batches through the jitted
path at ``--batch`` frames per dispatch; drawing happens on host.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np

from keypoints_tpu.viz import overlay_keypoints


def render_keypoint_video(out_path: str, frames_u8: np.ndarray,
                          extract: Callable[[np.ndarray], np.ndarray],
                          fps: float = 30.0, batch: int = 256,
                          radius: int = 2) -> int:
    """Write an annotated video; returns the number of frames written.

    ``frames_u8``: (N, C, H, W) uint8. ``extract``: (n, C, H, W) float32
    [0,1] → (n, K, 2) normalized keypoints (a jitted extract closure, a
    ``BucketedExtract`` artifact, or a ``serve.BatchingExtractor.extract``).
    Writes .mp4 (mp4v) / .avi via cv2 when importable, else falls back to
    an .npz of overlay frames next to ``out_path`` (headless-safe).
    """
    n, _, h, w = frames_u8.shape
    writer, cv2 = None, None
    try:
        import cv2 as _cv2
        cv2 = _cv2
    except Exception:
        pass

    written = 0
    overlays = []
    for i in range(0, n, batch):
        chunk = frames_u8[i:i + batch]
        imgs = chunk.astype(np.float32) / 255.0
        kp = np.asarray(extract(imgs))
        hwc = overlay_keypoints(imgs, kp, radius=radius)    # (b, H, W, 3) f32
        frames_rgb = (hwc * 255).astype(np.uint8)
        if cv2 is not None:
            if writer is None:
                fourcc = cv2.VideoWriter_fourcc(
                    *("mp4v" if out_path.endswith(".mp4") else "MJPG"))
                writer = cv2.VideoWriter(out_path, fourcc, fps, (w, h))
                if not writer.isOpened():
                    writer = None
                    cv2 = None                     # codec missing: fall back
            if writer is not None:
                for f in frames_rgb:
                    writer.write(f[:, :, ::-1])    # RGB → BGR
                    written += 1
        if cv2 is None:
            overlays.append(frames_rgb)
            written += len(frames_rgb)
    if writer is not None:
        writer.release()
    elif overlays:
        alt = os.path.splitext(out_path)[0] + ".npz"
        np.savez_compressed(alt, frames=np.concatenate(overlays), fps=fps)
        print(f"cv2 video writer unavailable — wrote frame stack to {alt}")
    return written


def _cli(argv=None):
    import argparse

    import jax

    from keypoints_tpu import checkpoint as ckpt
    from keypoints_tpu.configs import apply_overrides, get_config
    from keypoints_tpu.data.records import FrameStore
    from keypoints_tpu.training import (TrainState, build_model, init_state,
                                        make_extract_fn)
    from keypoints_tpu.utils.compile_cache import enable_compile_cache

    from keypoints_tpu.utils.platform import apply_platform
    apply_platform()      # $KEYPOINTS_TPU_PLATFORM (axon ignores
    enable_compile_cache()  # JAX_PLATFORMS); before device access
    p = argparse.ArgumentParser(
        description="render a keypoint-annotated video from a trained model")
    p.add_argument("--preset", required=True)
    p.add_argument("--checkpoint", default=None,
                   help="Orbax checkpoint dir; omit for random-init (smoke)")
    p.add_argument("--artifact", default=None,
                   help="exported StableHLO extractor (keypoints-export) — "
                        "no checkpoint/model build needed; oversized frame "
                        "batches split across buckets automatically")
    p.add_argument("--store", default=None,
                   help="frame store .npy (default: the preset's store)")
    p.add_argument("--folder", default=None,
                   help="image folder instead of a store")
    p.add_argument("--out", required=True, help=".mp4 or .avi path")
    p.add_argument("--frames", type=int, default=600)
    p.add_argument("--start", type=int, default=0,
                   help="first store frame (skip rollout warmup)")
    p.add_argument("--fps", type=float, default=30.0)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--override", nargs="*", default=[])
    args = p.parse_args(argv)

    cfg = apply_overrides(get_config(args.preset), args.override)
    d = cfg.data

    if args.folder:
        from keypoints_tpu.data.records import load_image_folder
        frames = load_image_folder(args.folder, d.image_size, d.channels,
                                   limit=args.frames)
    else:
        from keypoints_tpu.data.records import store_path_for
        store_path = args.store or store_path_for(d)
        store = FrameStore(store_path)
        frames = np.asarray(
            store.frames[args.start:args.start + args.frames])

    if args.artifact:
        from keypoints_tpu.export import load_extract
        fn = load_extract(args.artifact)
        kp_count = fn.meta["num_keypoints"]
    else:
        state = init_state(cfg, jax.random.PRNGKey(cfg.train.seed))
        if args.checkpoint:
            mgr = ckpt.make_manager(args.checkpoint)
            step, restored = ckpt.restore_latest(mgr, state._asdict())
            if step is None:
                raise SystemExit(f"no checkpoint found in {args.checkpoint}")
            state = TrainState(**restored)
            print(f"rendering with params from step {step}")
        model = build_model(cfg)
        extract = jax.jit(make_extract_fn(cfg, model))
        fn = lambda imgs: extract(state.params, imgs)  # noqa: E731
        kp_count = cfg.model.num_keypoints

    written = render_keypoint_video(args.out, frames, fn,
                                    fps=args.fps, batch=args.batch)
    print(f"wrote {written} frames to {args.out} "
          f"({d.image_size}px, K={kp_count})")


if __name__ == "__main__":
    _cli()
