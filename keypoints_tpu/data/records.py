"""Packed on-disk datasets and loaders: frames, frame-pairs, image folders.

SURVEY.md §2.1 (CelebA / Atari / human-pose datasets) with a TPU-native
storage design: one memory-mapped ``.npy`` per split (shape ``(N, C, H, W)``
uint8, plus an optional ``*_pairs.npy`` index of (i, j) temporal pairs),
written once by a collector and read with zero-copy mmap slices. Grain
(``grain.MapDataset``) provides shuffling/sharding/batching on top; batches
move to device as uint8 and are normalized to float on-chip, so the host does
no float math and H2D bytes stay 4× smaller [B:5].

Why not TFRecord/ArrayRecord: frames are fixed-shape and small; a raw mmap is
the fastest possible host-side read path (pure memcpy), and keeps the loader
dependency-free.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional

import jax.numpy as jnp
import numpy as np


def store_path(path: str) -> str:
    """Normalize a store path to its on-disk ``.npy`` form.

    ``np.save`` appends ``.npy`` but ``open_memmap``/``np.load`` do not, so a
    suffix-less CLI argument (``--out store``) would otherwise scatter the
    frames and the pairs index across inconsistent filenames — and FrameStore
    could then mmap the FRAMES array as the pairs index.
    """
    return path if path.endswith(".npy") else path + ".npy"


def pairs_path(path: str) -> str:
    """The temporal-pair index filename that belongs to a frame store."""
    return store_path(path)[:-len(".npy")] + "_pairs.npy"


def meta_path(path: str) -> str:
    """The provenance-sidecar filename that belongs to a frame store."""
    return store_path(path)[:-len(".npy")] + "_meta.json"


def write_store_meta(path: str, meta: dict) -> None:
    """Record store provenance (``origin`` + writer details) atomically.

    Every writer stamps its output: synthetic generators record an
    ``origin`` the eval harness recognizes (so keypoint-locking ground truth
    may honestly be regenerated from the same simulator), real-footage
    ingests record their source (so eval REFUSES to fabricate ground truth
    for them — VERDICT r3 #5). A store without a sidecar is treated as real
    footage: the conservative reading for pre-sidecar stores.
    """
    import json
    mp = meta_path(path)
    tmp = mp + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, mp)


def read_store_meta(path: str) -> dict:
    import json
    mp = meta_path(path)
    if not os.path.exists(mp):
        return {}
    with open(mp) as f:
        return json.load(f)


class FrameStore:
    """A packed uint8 frame array on disk, with optional temporal-pair index."""

    def __init__(self, path: str):
        self.path = store_path(path)
        self.frames = np.load(self.path, mmap_mode="r")     # (N, C, H, W) u8
        ppath = pairs_path(self.path)
        self.pairs = (np.load(ppath, mmap_mode="r")
                      if os.path.exists(ppath) else None)
        #: provenance sidecar ({} for pre-sidecar / hand-built stores)
        self.meta = read_store_meta(self.path)

    def __len__(self) -> int:
        return len(self.pairs) if self.pairs is not None else len(self.frames)

    @staticmethod
    def write(path: str, frames: np.ndarray,
              pairs: Optional[np.ndarray] = None,
              meta: Optional[dict] = None) -> None:
        assert frames.dtype == np.uint8 and frames.ndim == 4
        path = store_path(path)
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        np.save(path, frames)
        if pairs is not None:
            np.save(pairs_path(path), pairs.astype(np.int32))
        elif os.path.exists(pairs_path(path)):
            os.remove(pairs_path(path))    # don't let an old index linger
        if meta is not None:
            write_store_meta(path, meta)
        elif os.path.exists(meta_path(path)):
            os.remove(meta_path(path))     # stale provenance must not apply


def episode_pairs(episode_lengths: list[int], delta: int = 1) -> np.ndarray:
    """(i, i+delta) index pairs that never cross an episode boundary."""
    out, base = [], 0
    for n in episode_lengths:
        for i in range(n - delta):
            out.append((base + i, base + i + delta))
        base += n
    # keep the (N, 2) contract even when no episode spans delta
    return np.asarray(out, np.int32).reshape(-1, 2)


def _to_device_float(batch_u8: np.ndarray) -> jnp.ndarray:
    """Host u8 → device u8 → float[0,1] on device (cheap H2D, on-chip divide)."""
    return jnp.asarray(batch_u8).astype(jnp.float32) / 255.0


def store_path_for(data) -> str:
    """Canonical on-disk store path for a data config — the ONE place the
    `{data_dir}/{dataset}_{size}.npy` convention lives (train, eval, and
    the video CLI all resolve the same file through here)."""
    return os.path.join(data.data_dir,
                        f"{data.dataset}_{data.image_size}.npy")


def tail_pair_frames(store: FrameStore, pair_mode: str, take: int):
    """→ (a, b, tgt_idx) f32 [0,1] device arrays of the store's last
    ``take`` items — the held-out tail both best-checkpoint scoring
    (train.heldout_scoring_pair) and store-backed eval (eval.
    store_eval_batch) read, through this ONE helper so the two can never
    silently diverge on what "the tail" means.

    Temporal mode (a pair index exists): items are stored (t, t+Δ) pairs;
    ``tgt_idx`` is each row's target FRAME index (for landmark lookup).
    Otherwise items are frames, a == b, and the caller applies its own
    warp pairing; ``tgt_idx`` is the frame indices."""
    temporal = pair_mode == "temporal" and store.pairs is not None
    n_items = len(store.pairs) if temporal else len(store.frames)
    take = min(take, n_items)
    if temporal:
        ij = np.asarray(store.pairs[n_items - take:])
        return (_to_device_float(store.frames[ij[:, 0]]),
                _to_device_float(store.frames[ij[:, 1]]), ij[:, 1])
    idx = np.arange(n_items - take, n_items)
    f = _to_device_float(store.frames[idx])
    return f, f, idx


def _iter_from(ds, start_batch: int, workers: int = 1, depth: int = 8):
    """Iterate a random-access grain MapDataset from batch ``start_batch``.

    Grain pipelines are index-based, so resuming is O(1) random access — no
    replay of skipped batches (exact-resume determinism, SURVEY §5) — and
    the SAME property makes the reader embarrassingly parallel: with
    ``workers > 1`` a thread pool materializes ``depth`` upcoming batches
    concurrently (mmap page reads + numpy stacking release the GIL), while
    delivery order stays exactly the index order. Measured on this host:
    1 worker ~2.0k frames/s at 3×128² → 8 workers saturate the celeba128
    step rate (see BASELINE.md loader table).
    """
    import itertools
    if workers <= 1:
        for i in itertools.count(start_batch):
            yield ds[i]
        return
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(workers) as pool:
        buf: deque = deque()
        nxt = start_batch
        for _ in range(depth):
            buf.append(pool.submit(ds.__getitem__, nxt))
            nxt += 1
        while True:
            out = buf.popleft().result()
            buf.append(pool.submit(ds.__getitem__, nxt))
            nxt += 1
            yield out


def single_stream(store: FrameStore, batch_size: int, seed: int = 0,
                  shard_index: int = 0, shard_count: int = 1,
                  start_batch: int = 0, workers: int = 1,
                  limit: Optional[int] = None) -> Iterator[jnp.ndarray]:
    """Infinite shuffled stream of single-frame batches (warp-mode datasets).

    ``limit`` restricts the stream to frames ``[0, limit)`` — the trainer
    reserves the store tail as a held-out scoring slice (train.py).
    """
    import grain
    # grain handles INDICES only (shuffle/shard/repeat/batch of ints); the
    # frame read is ONE vectorized fancy-index per batch — a per-ELEMENT
    # python map measured GIL-bound at ~600-900 frames/s regardless of
    # worker count; the batch-level numpy read does a C-speed gather.
    ds = (grain.MapDataset.source(
              grain.sources.RangeDataSource(
                  0, limit if limit is not None else len(store.frames), 1))
          [shard_index::shard_count]
          .shuffle(seed=seed).repeat()
          .batch(batch_size)
          .map(lambda idx: store.frames[np.asarray(idx)]))
    for batch in _iter_from(ds, start_batch, workers):
        yield _to_device_float(batch)


def pair_stream(store: FrameStore, batch_size: int, seed: int = 0,
                shard_index: int = 0, shard_count: int = 1,
                start_batch: int = 0, workers: int = 1,
                limit: Optional[int] = None
                ) -> Iterator[tuple[jnp.ndarray, jnp.ndarray]]:
    """Infinite shuffled stream of (frame_t, frame_{t+Δ}) batches.

    ``limit`` restricts the stream to pair rows ``[0, limit)`` — the
    trainer reserves the tail pairs as a held-out scoring slice (train.py).
    """
    import grain
    assert store.pairs is not None, "store has no temporal-pair index"

    def read(idx):
        ij = store.pairs[np.asarray(idx)]                 # (B, 2)
        return store.frames[ij[:, 0]], store.frames[ij[:, 1]]

    ds = (grain.MapDataset.source(
              grain.sources.RangeDataSource(
                  0, limit if limit is not None else len(store.pairs), 1))
          [shard_index::shard_count]
          .shuffle(seed=seed).repeat()
          .batch(batch_size)
          .map(read))
    for a, b in _iter_from(ds, start_batch, workers):
        yield _to_device_float(a), _to_device_float(b)


def prefetch(iterator: Iterator, depth: int = 2) -> Iterator:
    """Double-buffered device prefetch: keep ``depth`` batches in flight.

    ``jnp.asarray`` issues an async H2D copy; holding a small deque of
    already-transferred batches overlaps host read + transfer with the
    device step (SURVEY.md §2.4, [B:5]).
    """
    from collections import deque
    buf: deque = deque()
    for item in iterator:
        buf.append(item)
        if len(buf) >= depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def _list_images(folder: str, limit: Optional[int]) -> list[str]:
    names = sorted(f for f in os.listdir(folder)
                   if f.lower().endswith((".png", ".jpg", ".jpeg")))
    return names[:limit] if limit else names


def _decode_image(path: str, size: int, channels: int) -> np.ndarray:
    """cv2 decode + resize one image → (C, size, size) uint8."""
    import cv2
    img = cv2.imread(path, cv2.IMREAD_COLOR if channels == 3
                     else cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise ValueError(f"cv2 cannot decode image: {path}")
    img = cv2.resize(img, (size, size), interpolation=cv2.INTER_AREA)
    if channels == 3:
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB).transpose(2, 0, 1)
    return img[None]


def load_image_folder(folder: str, size: int, channels: int = 3,
                      limit: Optional[int] = None) -> np.ndarray:
    """Decode an image folder (png/jpg) → (N, C, size, size) uint8 frames.

    Uses cv2 for decode+resize (host, ahead of training — decode is NOT in the
    training loop; [B:5] keeps only augmentation on device).
    """
    names = _list_images(folder, limit)
    frames = np.empty((len(names), channels, size, size), np.uint8)
    for i, name in enumerate(names):
        frames[i] = _decode_image(os.path.join(folder, name), size, channels)
    return frames


def image_folder_to_store(folder: str, out_path: str, size: int,
                          channels: int = 3, limit: Optional[int] = None
                          ) -> str:
    """Decode an image folder to a packed store — offline, one-time.

    Decodes straight into the store memmap, so host RAM stays ~one image
    regardless of folder size (a 256² CelebA-scale folder is tens of GB
    decoded). The memmap is built at a temp path and moved into place only
    on success: a corrupt image or an interrupt must not leave a partial
    zero-filled store that a later run silently trains on.
    """
    names = _list_images(folder, limit)
    if not names:
        raise FileNotFoundError(f"no images in {folder}")
    out_path = store_path(out_path)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    tmp_path = out_path + ".tmp"
    try:
        out = np.lib.format.open_memmap(
            tmp_path, mode="w+", dtype=np.uint8,
            shape=(len(names), channels, size, size))
        for i, name in enumerate(names):
            out[i] = _decode_image(os.path.join(folder, name), size, channels)
        out.flush()
        del out
        os.replace(tmp_path, out_path)
    finally:
        if os.path.exists(tmp_path):
            os.remove(tmp_path)
    if os.path.exists(pairs_path(out_path)):   # frames-only writer: a stale
        os.remove(pairs_path(out_path))        # index must not apply here
    write_store_meta(out_path, {"origin": "image_folder",
                                "source": os.path.abspath(folder)})
    return out_path


VIDEO_EXTS = (".mp4", ".avi", ".mov", ".mkv", ".webm", ".mpg", ".mpeg")


def load_video(path: str, size: int, channels: int = 3, stride: int = 1,
               max_frames: Optional[int] = None) -> np.ndarray:
    """Decode one video file → (N, C, size, size) uint8 frames.

    Keeps every ``stride``-th frame. Non-square frames are center-cropped to
    the largest square before the resize (video footage is rarely square;
    stretching would distort the geometry the keypoints are meant to find).
    Host-side, ahead of training, like ``load_image_folder`` ([B:5] keeps
    only augmentation on device).
    """
    import cv2
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise FileNotFoundError(f"cv2 cannot open video: {path}")
    frames, i = [], 0
    while max_frames is None or len(frames) < max_frames:
        ok, img = cap.read()                               # BGR (H, W, 3)
        if not ok:
            break
        if i % stride == 0:
            h, w = img.shape[:2]
            s = min(h, w)
            y0, x0 = (h - s) // 2, (w - s) // 2
            img = img[y0:y0 + s, x0:x0 + s]
            img = cv2.resize(img, (size, size),
                             interpolation=cv2.INTER_AREA)
            if channels == 3:
                img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB).transpose(2, 0, 1)
            else:
                img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)[None]
            frames.append(img)
        i += 1
    cap.release()
    if not frames:
        raise ValueError(f"no frames decoded from {path}")
    return np.stack(frames).astype(np.uint8)


def video_to_store(source: str, out_path: str, size: int, channels: int = 3,
                   stride: int = 1, delta: int = 1,
                   max_frames_per_video: Optional[int] = None) -> str:
    """Decode video footage to a packed store with a temporal-pair index.

    ``source`` is one video file or a folder of them (sorted by name). Each
    file is one episode: the (i, i+delta) pair index never crosses a file
    boundary, so temporal-mode training (Transporter) sees only real motion
    pairs; warp-mode datasets simply ignore the index. ``delta`` counts
    STORED frames (i.e. ``stride`` source frames apart per unit). This is
    the real-footage on-ramp for the pose/Atari-style video datasets
    (SURVEY.md §2.1), sibling to ``image_folder_to_store``.
    """
    if os.path.isdir(source):
        paths = sorted(os.path.join(source, f) for f in os.listdir(source)
                       if f.lower().endswith(VIDEO_EXTS))
        if not paths:
            raise FileNotFoundError(f"no video files in {source}")
    else:
        paths = [source]
    # Host RAM stays bounded to ONE decoded clip: each clip spills to a
    # temporary .npy, then the clips stream into the final store memmap.
    # A realistic pose corpus (dozens of minutes-long 256² clips) is tens
    # of GB decoded — concatenating in RAM would OOM the host. The final
    # memmap is also built at a temp path and moved into place on success,
    # so an interrupt can't leave a partial store behind.
    out_path = store_path(out_path)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    store_tmp = out_path + ".tmp"
    tmp_paths, lengths = [], []
    try:
        for i, p in enumerate(paths):
            arr = load_video(p, size, channels, stride, max_frames_per_video)
            tmp = f"{out_path}.clip{i}.tmp.npy"
            np.save(tmp, arr)
            tmp_paths.append(tmp)
            lengths.append(len(arr))
            del arr
        out = np.lib.format.open_memmap(
            store_tmp, mode="w+", dtype=np.uint8,
            shape=(sum(lengths), channels, size, size))
        at = 0
        for tmp, n in zip(tmp_paths, lengths):
            out[at:at + n] = np.load(tmp, mmap_mode="r")
            at += n
        out.flush()
        del out
        os.replace(store_tmp, out_path)
    finally:
        for tmp in tmp_paths + [store_tmp]:
            if os.path.exists(tmp):
                os.remove(tmp)
    pairs = episode_pairs(lengths, delta)
    if len(pairs) == 0:
        # every clip shorter than delta+1 stored frames: a zero-row index
        # would only surface as an opaque device error later — omit it so
        # temporal-mode use fails with pair_stream's explicit message, and
        # say so now (warp-mode training doesn't need pairs at all)
        print(f"note: no temporal pairs (every clip < {delta + 1} stored "
              f"frames); writing a frames-only store", flush=True)
        if os.path.exists(pairs_path(out_path)):   # don't let an old
            os.remove(pairs_path(out_path))        # index linger
    else:
        np.save(pairs_path(out_path), pairs.astype(np.int32))
    write_store_meta(out_path, {"origin": "video",
                                "source": os.path.abspath(source)})
    return out_path
