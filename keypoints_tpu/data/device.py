"""Device-resident datasets: the whole store lives in HBM, sampling in jit.

Packed stores at research scale fit HBM (4500 Pong frames = 18 MB; 200k
CelebA crops at 128² u8 = 9.8 GB vs v5e's 16 GB), so the TPU-native way to
serve them is to upload the uint8 array once and do *all* sampling on
device: indices from ``jax.random`` inside the train step, frame gather as
an XLA take over the leading axis (whole-frame DMAs — the fast kind of
gather), u8→f32 conversion fused into the consumer. The host does nothing
per step; there is no H2D traffic at all after upload.

The budget is measured, not guessed: ``device_memory_budget()`` asks the
backend for free HBM (``memory_stats``) and keeps a headroom for
params/activations/double-buffering, so a 9.8 GB CelebA store IS admitted
on an idle 16 GB chip while the same store is correctly rejected on a busy
one. Backends without memory stats fall back to a conservative 4 GB.

Measured (transporter_atari, b128 @64²): host grain streaming ~2000
frames/s → device-resident ~5000+ (the synthetic-data ceiling).

Falls back gracefully: ``fits_in_memory`` gates on array bytes; the grain
streams in ``records.py`` (``workers>1`` for a threaded reader) remain the
path for bigger-than-HBM datasets and multi-host sharding.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from keypoints_tpu.data.records import FrameStore

# Fallback when the backend exposes no memory stats: ~1/4 of a 16 GB chip.
DEFAULT_BUDGET_BYTES = 4 << 30
# Kept free for params, activations, and compiler scratch when sizing from
# real memory stats (the celeba128 step peaks well under 2 GB; 3 GB is safe).
HEADROOM_BYTES = 3 << 30


# Known HBM sizes by device kind, used when the backend reports no memory
# stats (the axon tunnel's plugin returns None). Live stats take priority.
_HBM_BY_KIND = (
    ("TPU v5 lite", 16 << 30),   # v5e
    ("TPU v5e", 16 << 30),
    ("TPU v5p", 95 << 30),
    ("TPU v5", 16 << 30),
    ("TPU v6 lite", 32 << 30),   # v6e
    ("TPU v4", 32 << 30),
    ("TPU v3", 16 << 30),
)


def device_hbm_bytes() -> Optional[int]:
    """Total HBM of device 0: live ``memory_stats`` limit when the backend
    reports one, else the device kind's known size, else None (unknown
    backend — CPU/GPU/emulators)."""
    try:
        dev = jax.devices()[0]
        stats = dev.memory_stats() or {}
        limit = stats.get("bytes_limit") or stats.get(
            "bytes_reservable_limit")
        if limit:
            return int(limit)
        kind = getattr(dev, "device_kind", "") or ""
        for prefix, hbm in _HBM_BY_KIND:
            if kind.startswith(prefix):
                return hbm
    except Exception:
        pass
    return None


def device_memory_budget(headroom_bytes: int = HEADROOM_BYTES) -> int:
    """Bytes of HBM a resident dataset may use: free memory minus headroom.

    Uses the backend's live ``memory_stats`` when available (TPU plugins
    report ``bytes_limit``/``bytes_in_use``); falls back to the device
    kind's known HBM size (minus headroom), and finally to the
    conservative ``DEFAULT_BUDGET_BYTES`` on unknown backends (CPU/GPU).

    This sizes the STORE only; the step/eval programs' peak memory is
    checked separately by ``train()``'s compile-time preflight
    (``train._preflight_hbm`` asks XLA's buffer assignment for the real
    peak — the b64 pose256 lesson: a store that fits is not a loop that
    fits).
    """
    total = device_hbm_bytes()   # one probe shared with train()'s preflight
    if total is None:
        return DEFAULT_BUDGET_BYTES
    try:
        in_use = int((jax.devices()[0].memory_stats() or {})
                     .get("bytes_in_use", 0))
    except Exception:
        in_use = 0
    return max(0, total - in_use - headroom_bytes)


def fits_in_memory(store: FrameStore,
                   budget_bytes: Optional[int] = None) -> bool:
    if budget_bytes is None:
        budget_bytes = device_memory_budget()
    return store.frames.nbytes <= budget_bytes


class DeviceDataset:
    """Upload a FrameStore to HBM; sample batches inside jit.

    ``sample(key, batch)``        → (B, C, H, W) float32 in [0, 1]
    ``sample_pair(key, batch)``   → ((B,...), (B,...)) temporal pair batches
    Both are pure jittable functions of the key — call them *inside* the
    train step for a fully fused input pipeline.
    """

    def __init__(self, store: FrameStore,
                 budget_bytes: Optional[int] = None):
        if budget_bytes is None:
            budget_bytes = device_memory_budget()
        if not fits_in_memory(store, budget_bytes):
            raise ValueError(
                f"store is {store.frames.nbytes / 1e9:.2f} GB, over the "
                f"{budget_bytes / 1e9:.2f} GB device budget — use the grain "
                "streams in data.records instead")
        self.frames = jnp.asarray(np.asarray(store.frames))       # u8, HBM
        self.pairs = (jnp.asarray(np.asarray(store.pairs))
                      if store.pairs is not None else None)

    @property
    def num_frames(self) -> int:
        return self.frames.shape[0]

    def sample(self, key: jax.Array, batch: int) -> jnp.ndarray:
        return sample_frames(self.frames, key, batch)

    def sample_pair(self, key: jax.Array, batch: int):
        assert self.pairs is not None, "store has no temporal-pair index"
        return sample_pair_frames(self.frames, self.pairs, key, batch)


# Pure functions taking the frame array as an ARGUMENT: jit a wrapper that
# passes ``ds.frames`` at call time, never one that CLOSES over it — a
# closed-over device array becomes a jaxpr constant that is serialized into
# the compile payload (a 393 MB pose store overflowed the remote-compile
# tunnel with HTTP 413 before this split).

def sample_frames(frames: jnp.ndarray, key: jax.Array, batch: int,
                  limit: Optional[int] = None) -> jnp.ndarray:
    """``limit`` (static) restricts sampling to frames [0, limit) — the
    trainer reserves the store tail for held-out scoring (train.py)."""
    hi = frames.shape[0] if limit is None else limit   # 0 is NOT "no limit"
    idx = jax.random.randint(key, (batch,), 0, hi)
    return jnp.take(frames, idx, axis=0).astype(jnp.float32) / 255.0


def sample_pair_frames(frames: jnp.ndarray, pairs: jnp.ndarray,
                       key: jax.Array, batch: int,
                       limit: Optional[int] = None):
    hi = pairs.shape[0] if limit is None else limit
    row = jax.random.randint(key, (batch,), 0, hi)
    ij = jnp.take(pairs, row, axis=0)                             # (B, 2)
    a = jnp.take(frames, ij[:, 0], axis=0)
    b = jnp.take(frames, ij[:, 1], axis=0)
    return (a.astype(jnp.float32) / 255.0,
            b.astype(jnp.float32) / 255.0)
