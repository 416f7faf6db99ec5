"""Data pipeline tests: synthetic generators, FrameStore, streams, collector."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keypoints_tpu.data.collect import collect, collect_scripted_pong
from keypoints_tpu.data.records import (FrameStore, episode_pairs,
                                        pair_stream, prefetch, single_stream)
from keypoints_tpu.data.synthetic import (moving_dots_pair, render_dots,
                                          scripted_pong_pair)


def test_render_dots_peaks_at_positions():
    pos = jnp.array([[[0.0, 0.0], [0.5, -0.5]]])
    img = np.asarray(render_dots(pos, 33, channels=3, sigma=0.1))
    assert img.shape == (1, 3, 33, 33)
    # dot 0 is in channel 0, centered: pixel (16, 16)
    assert img[0, 0, 16, 16] > 0.95
    # dot 1 in channel 1 at x=0.5, y=-0.5 → col 24, row 8
    assert img[0, 1, 8, 24] > 0.95


def test_moving_dots_pair_shapes():
    src, tgt, pos = moving_dots_pair(jax.random.PRNGKey(0), 4, 32,
                                     num_dots=3, channels=1)
    assert src.shape == tgt.shape == (4, 1, 32, 32)
    assert pos.shape == (4, 3, 2)
    assert float(jnp.abs(src - tgt).max()) > 0.1   # actually moved


def test_scripted_pong_pair():
    f1, f2, state = scripted_pong_pair(jax.random.PRNGKey(1), 4, 64)
    assert f1.shape == f2.shape == (4, 1, 64, 64)
    assert state.shape == (4, 3, 2)
    assert float(f1.max()) <= 1.0 and float(f1.min()) >= 0.0
    # paddles present: columns near x=±0.9 have bright pixels
    assert float(f1[..., 3]. max()) > 0.9


def test_reflect_unit_identity_and_fold():
    from keypoints_tpu.data.synthetic import reflect_unit
    x = np.array([-0.9, 0.0, 0.5, 1.0, -1.0])
    np.testing.assert_allclose(reflect_unit(x), x, atol=1e-7)   # identity
    np.testing.assert_allclose(reflect_unit(np.array([1.1, -1.3, 2.5])),
                               [0.9, -0.7, -0.5], atol=1e-7)


def test_pong_pair_ball_actually_moves():
    """Regression: |mod(x+1,4)-2|-1 negated in-range positions, so every
    temporal pair had the ball at the origin-mirrored spot and every
    delta=2 stored pair had it at the IDENTICAL spot."""
    f1, f2, state = scripted_pong_pair(jax.random.PRNGKey(3), 16, 64, dt=0.15)
    # ball at t vs t+Δ: ball dominates the frame diff away from paddles
    inner = slice(8, 56)
    diff = np.abs(np.asarray(f1) - np.asarray(f2))[:, 0, :, inner]
    assert float(diff.max(axis=(1, 2)).min()) > 0.3  # moved in every example


def test_collected_rollout_pairs_move():
    frames, lengths = collect_scripted_pong(2, 30, 64, seed=0)
    pairs = episode_pairs(lengths, delta=2)
    f = frames.astype(np.float32) / 255.0
    disp = [np.abs(f[a] - f[b]).max() for a, b in pairs]
    # small nonzero displacement in nearly all delta=2 pairs (a rare pair can
    # straddle an exact reflection apex)
    assert np.mean(np.asarray(disp) > 0.2) > 0.9


def test_episode_pairs_respects_boundaries():
    pairs = episode_pairs([3, 2], delta=1)
    assert pairs.tolist() == [[0, 1], [1, 2], [3, 4]]
    pairs2 = episode_pairs([3, 2], delta=2)
    assert pairs2.tolist() == [[0, 2]]


def test_framestore_roundtrip_and_streams(tmp_path):
    frames = (np.random.RandomState(0).rand(10, 1, 8, 8) * 255).astype(np.uint8)
    pairs = episode_pairs([10], delta=1)
    path = str(tmp_path / "frames.npy")
    FrameStore.write(path, frames, pairs)
    store = FrameStore(path)
    assert len(store) == 9

    it = single_stream(store, batch_size=4, seed=0)
    batch = next(it)
    assert batch.shape == (4, 1, 8, 8)
    assert 0.0 <= float(batch.min()) and float(batch.max()) <= 1.0

    it2 = prefetch(pair_stream(store, batch_size=4, seed=0), depth=2)
    a, b = next(it2)
    assert a.shape == b.shape == (4, 1, 8, 8)


def test_collector_writes_pong_store(tmp_path):
    path = collect(str(tmp_path / "pong.npy"), env_name=None, episodes=2,
                   steps_per_episode=5, size=32, delta=1)
    store = FrameStore(path)
    assert store.frames.shape == (10, 1, 32, 32)
    assert store.frames.dtype == np.uint8
    assert len(store.pairs) == 8
    assert store.frames.max() > 100   # content present


def test_collect_cli(tmp_path, capsys):
    """The keypoints-collect entry point: args parse, store lands on disk."""
    from keypoints_tpu.data.collect import _cli
    out = str(tmp_path / "cli" / "pong.npy")
    _cli(["--out", out, "--env", "none", "--episodes", "2",
          "--steps-per-episode", "5", "--size", "32", "--delta", "1"])
    store = FrameStore(out)
    assert store.frames.shape == (10, 1, 32, 32)
    assert len(store.pairs) == 8
    assert "wrote" in capsys.readouterr().out


def test_device_dataset_sampling(tmp_path):
    from keypoints_tpu.data.device import DeviceDataset, fits_in_memory
    frames = (np.random.RandomState(0).rand(12, 1, 8, 8) * 255).astype(np.uint8)
    pairs = episode_pairs([12], delta=1)
    path = str(tmp_path / "d.npy")
    FrameStore.write(path, frames, pairs)
    store = FrameStore(path)
    assert fits_in_memory(store)

    ds = DeviceDataset(store)
    batch = ds.sample(jax.random.PRNGKey(0), 4)
    assert batch.shape == (4, 1, 8, 8)
    assert 0.0 <= float(batch.min()) and float(batch.max()) <= 1.0

    a, b = jax.jit(lambda k: ds.sample_pair(k, 4))(jax.random.PRNGKey(1))
    assert a.shape == b.shape == (4, 1, 8, 8)
    # temporal structure: each (a, b) row must be a consecutive-frame pair
    af = np.asarray(a * 255).astype(np.uint8)
    bf = np.asarray(b * 255).astype(np.uint8)
    for i in range(4):
        ja = int(np.argmin([np.abs(af[i].astype(int) - f.astype(int)).sum()
                            for f in frames]))
        jb = int(np.argmin([np.abs(bf[i].astype(int) - f.astype(int)).sum()
                            for f in frames]))
        assert jb == ja + 1


def test_threaded_stream_matches_serial(tmp_path):
    """workers>1 must deliver the exact same batch sequence as workers=1
    (the grain pipeline is index-random-access; threads only overlap IO)."""
    import itertools
    frames = (np.random.RandomState(1).rand(40, 1, 8, 8) * 255).astype(np.uint8)
    path = str(tmp_path / "t.npy")
    FrameStore.write(path, frames, episode_pairs([40], 1))
    store = FrameStore(path)
    a = list(itertools.islice(single_stream(store, 4, seed=7), 10))
    b = list(itertools.islice(single_stream(store, 4, seed=7, workers=4), 10))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # and resume: start_batch=5 continues the same sequence
    c = list(itertools.islice(
        single_stream(store, 4, seed=7, start_batch=5, workers=4), 5))
    for x, y in zip(a[5:], c):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_device_memory_budget_fallback(monkeypatch):
    from keypoints_tpu.data import device as dev
    # CPU backend exposes no limit → conservative default
    assert dev.device_memory_budget() == dev.DEFAULT_BUDGET_BYTES

    class FakeDev:
        def memory_stats(self):
            return {"bytes_limit": 16 << 30, "bytes_in_use": 2 << 30}

    monkeypatch.setattr(jax, "devices", lambda: [FakeDev()])
    assert dev.device_memory_budget() == (16 << 30) - (2 << 30) - (3 << 30)


def test_pose_generator_writes_trainable_store(tmp_path):
    from keypoints_tpu.data.pose import generate_pose_store, joint_positions, generate_episode
    path = generate_pose_store(str(tmp_path / "pose_64.npy"), episodes=2,
                               steps_per_episode=6, size=64)
    store = FrameStore(path)
    assert store.frames.shape == (12, 3, 64, 64)
    assert store.frames.dtype == np.uint8
    assert len(store.pairs) == 8                      # 2 * (6 - 2)
    f = store.frames.astype(np.float32) / 255.0
    assert f.max() > 0.8                              # figure present
    # all three channels (torso/arms/legs) drawn
    assert (f.reshape(12, 3, -1).max(axis=-1) > 0.5).all()
    # figure MOVES between temporal frames
    assert np.abs(f[0] - f[4]).max() > 0.3
    # 16 joints, inside the frame
    segs = generate_episode(4, np.random.RandomState(0))
    kp = joint_positions(segs)
    assert kp.shape == (4, 16, 2)
    assert np.abs(kp).max() <= 1.5


def test_pose_autogeneration_in_trainer(tmp_path, monkeypatch):
    """pose preset trains end-to-end with NO hand-placed files (VERDICT #9)."""
    from keypoints_tpu.configs import get_config
    from keypoints_tpu.train import make_batch_iterator
    monkeypatch.chdir(tmp_path)
    cfg = get_config("pose256").override(**{
        "data.image_size": 32, "train.batch_size": 2})
    it = make_batch_iterator(cfg)   # device-resident handle; iterable
    batch = next(iter(it))
    assert batch.shape == (2, 3, 32, 32)
    assert (tmp_path / "data" / "pose_32.npy").exists()


def test_device_dataset_rejects_oversized(tmp_path):
    from keypoints_tpu.data.device import DeviceDataset
    frames = np.zeros((4, 1, 8, 8), np.uint8)
    path = str(tmp_path / "d2.npy")
    FrameStore.write(path, frames)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="device budget"):
        DeviceDataset(FrameStore(path), budget_bytes=10)


def test_generate_face_store(tmp_path):
    """Offline CelebA stand-in: valid uint8 store, deterministic per seed,
    faces vary across images (landmark structure to discover)."""
    from keypoints_tpu.data.faces import generate_face_store
    from keypoints_tpu.data.records import FrameStore

    p = str(tmp_path / "celeba_32.npy")
    generate_face_store(p, count=8, size=32, seed=3, chunk=4)
    st = FrameStore(p)
    assert st.frames.shape == (8, 3, 32, 32) and st.frames.dtype == np.uint8
    assert st.pairs is None
    # images differ (random head pose) but are deterministic given the seed
    assert np.abs(st.frames[0].astype(int) - st.frames[1].astype(int)).max() > 10
    p2 = str(tmp_path / "again_32.npy")
    generate_face_store(p2, count=8, size=32, seed=3, chunk=4)
    np.testing.assert_array_equal(np.load(p2), st.frames)


def test_missing_store_error_message(tmp_path):
    from keypoints_tpu.configs import get_config
    from keypoints_tpu.train import make_batch_iterator

    cfg = get_config("celeba128").override(**{
        "data.dataset": "nosuch", "data.data_dir": str(tmp_path)})
    with pytest.raises(FileNotFoundError, match="image_folder_to_store"):
        make_batch_iterator(cfg)


def test_face_landmarks_sit_on_their_parts():
    """The exported ground-truth landmarks must land ON the drawn parts:
    the eye landmark pixel is much darker than the face average."""
    from keypoints_tpu.data.faces import render_faces

    imgs, marks = render_faces(6, 64, np.random.RandomState(11))
    assert imgs.shape == (6, 3, 64, 64) and marks.shape == (6, 4, 2)
    assert np.all(np.abs(marks) <= 1.0)
    for b in range(6):
        for k in (0, 1):                                  # the two eyes
            x, y = marks[b, k]
            j = int(round((x + 1) / 2 * 63))
            i = int(round((y + 1) / 2 * 63))
            eye = imgs[b, :, i, j].mean()
            assert eye < 0.35, (b, k, eye)


def test_collect_ale_branch_with_fake_gym(tmp_path, monkeypatch):
    """Exercise the REAL ALE code path (gym probe, rollout loop, grayscale/
    resize preprocessing, episode boundaries) against a fake gymnasium —
    ale-py isn't installable offline but the branch must not rot."""
    import sys
    import types

    from keypoints_tpu.data.collect import _ale_available, collect

    class _Space:
        def sample(self):
            return 0

    class _FakeEnv:
        def __init__(self):
            self._rng = np.random.RandomState(0)
            self._t = 0
            self.action_space = _Space()

        def reset(self, seed=None):
            self._t = 0
            return None, {}

        def step(self, action):
            self._t += 1
            return None, 0.0, self._t >= 7, False, {}

        def render(self):
            return self._rng.randint(0, 255, (84, 84, 3), dtype=np.uint8)

        def close(self):
            pass

    fake = types.ModuleType("gymnasium")
    fake.make = lambda name, render_mode=None: _FakeEnv()
    monkeypatch.setitem(sys.modules, "gymnasium", fake)

    assert _ale_available("ALE/Pong-v5")
    path = collect(str(tmp_path / "atari_32.npy"), env_name="ALE/Pong-v5",
                   episodes=2, steps_per_episode=10, size=32, delta=2)
    store = FrameStore(path)
    assert store.frames.shape == (14, 1, 32, 32)          # 2 episodes × 7
    assert store.frames.dtype == np.uint8
    # pair index never crosses the episode boundary at frame 7
    assert len(store.pairs) == 2 * 5
    assert np.all(store.pairs[:, 1] - store.pairs[:, 0] == 2)
    assert not np.any((store.pairs[:, 0] < 7) & (store.pairs[:, 1] >= 7))


def test_ale_probe_false_when_make_fails(monkeypatch):
    import sys
    import types

    from keypoints_tpu.data.collect import _ale_available

    fake = types.ModuleType("gymnasium")

    def _raise(name, render_mode=None):
        raise RuntimeError("no ROMs installed")

    fake.make = _raise
    monkeypatch.setitem(sys.modules, "gymnasium", fake)
    assert not _ale_available("ALE/Pong-v5")


# --- warp inversion / honest eval pairs (VERDICT r2 #7) ---------------------

def test_eval_field_at_matches_upsample():
    from keypoints_tpu.coords import coord_grid
    from keypoints_tpu.ops.warp import eval_field_at, upsample_field_aligned
    rs = np.random.RandomState(11)
    field = jnp.asarray(rs.randn(2, 9, 9, 2) * 0.1, jnp.float32)
    dense = upsample_field_aligned(field, 16, 16)            # (B, 16, 16, 2)
    pts = coord_grid(16, 16, align_corners=True).reshape(1, -1, 2)
    pts = jnp.broadcast_to(pts, (2, 256, 2))
    got = eval_field_at(field, pts).reshape(2, 16, 16, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(dense), atol=1e-6)


def test_invert_warp_at_round_trip():
    from keypoints_tpu.data.augment import WarpConfig, random_warp_field
    from keypoints_tpu.ops.warp import eval_field_at, invert_warp_at
    cfg = WarpConfig()
    field = random_warp_field(jax.random.PRNGKey(5), 3, cfg)
    q = jnp.asarray(np.random.RandomState(6).rand(3, 7, 2) * 1.2 - 0.6,
                    jnp.float32)
    p = invert_warp_at(field, q)
    # W(p) == q to fixed-point tolerance
    np.testing.assert_allclose(np.asarray(eval_field_at(field, p)),
                               np.asarray(q), atol=1e-5)


def test_make_pair_with_positions_tracks_blob():
    """A bright Gaussian blob placed at q must appear at the mapped position
    in the warped TARGET: centroid of the warped blob ≈ tgt_positions."""
    from keypoints_tpu.coords import coord_grid
    from keypoints_tpu.data.augment import (WarpConfig,
                                            make_pair_with_positions)
    cfg = WarpConfig(brightness=0.0, contrast=0.0, saturation=0.0)
    h = w = 64
    q = jnp.asarray([[[0.2, -0.3]], [[-0.4, 0.1]]], jnp.float32)  # (2, 1, 2)
    g = coord_grid(h, w, align_corners=True)                      # (H, W, 2)
    blob = jnp.exp(-jnp.sum((g[None, None] - q[:, :, None, None]) ** 2,
                            -1) / (2 * 0.05 ** 2))                # (2, 1, H, W)
    img = jnp.broadcast_to(blob, (2, 1, h, w))
    src, tgt, pos_t = jax.jit(
        lambda k, f, m: make_pair_with_positions(k, f, m, cfg))(
        jax.random.PRNGKey(9), img, q)
    tgt = np.asarray(tgt)[:, 0]
    # intensity centroid of the warped blob
    gg = np.asarray(g)
    mass = tgt.reshape(2, -1)
    mass = mass / mass.sum(axis=1, keepdims=True)
    cx = (mass * gg[..., 0].reshape(-1)).sum(axis=1)
    cy = (mass * gg[..., 1].reshape(-1)).sum(axis=1)
    got = np.stack([cx, cy], axis=-1)                             # (2, 2)
    want = np.asarray(pos_t)[:, 0]
    assert np.abs(got - want).max() < 0.05, (got, want)
    # and the pair really is warped: src differs from tgt
    assert float(np.abs(np.asarray(src) - np.asarray(tgt)).max()) > 0.05


def test_synthetic_eval_batch_warp_mode_pairs():
    """celeba/pose eval batches are warped (src != tgt != raw) with landmarks
    carried through the target warp — the honest-eval fix."""
    from keypoints_tpu.configs import get_config
    from keypoints_tpu.eval import synthetic_eval_batch
    cfg = get_config("celeba128").override(**{"data.image_size": 64})
    src, tgt, pos = synthetic_eval_batch(cfg, 2, jax.random.PRNGKey(4))
    assert src.shape == tgt.shape == (2, 3, 64, 64)
    assert pos.shape == (2, 4, 2)
    assert float(jnp.abs(src - tgt).max()) > 0.05       # independently warped
    # warped landmarks stay near the face region (mild warps)
    assert np.all(np.abs(pos) <= 1.2)


def test_stream_sharding_multi_host():
    """Grain streams partition the dataset across host shards (disjoint
    indices), and make_batch_iterator wires host_shard()/local_batch_size
    in automatically for the streaming path."""
    import tempfile

    from keypoints_tpu.data.records import FrameStore, single_stream

    with tempfile.TemporaryDirectory() as d:
        # frame i is constant-valued i → recover sampled indices from pixels
        frames = np.stack([np.full((1, 8, 8), i, np.uint8)
                           for i in range(32)])
        path = f"{d}/celeba_8.npy"
        FrameStore.write(path, frames)
        store = FrameStore(path)

        seen = []
        for shard in (0, 1):
            s = single_stream(store, 8, seed=0, shard_index=shard,
                              shard_count=2)
            ids = set()
            for _ in range(8):
                batch = np.asarray(next(s))              # (8,1,8,8) in [0,1]
                ids.update(np.round(batch[:, 0, 0, 0] * 255).astype(int))
            seen.append(ids)
        assert seen[0] and seen[1]
        assert not (seen[0] & seen[1])                   # disjoint shards
        assert (seen[0] | seen[1]) == set(range(32))     # full coverage

        # make_batch_iterator passes the shard + local batch automatically
        import jax

        from keypoints_tpu.configs import get_config
        from keypoints_tpu.data import device as device_mod
        from keypoints_tpu import train as train_mod

        cfg = get_config("celeba128").override(**{
            "data.data_dir": d, "data.image_size": 8,
            "train.batch_size": 8})
        orig_fits = device_mod.fits_in_memory
        orig_count, orig_index = jax.process_count, jax.process_index
        try:
            device_mod.fits_in_memory = lambda *a, **k: False
            jax.process_count = lambda: 2
            jax.process_index = lambda: 1
            it = train_mod.make_batch_iterator(cfg)
            batch = np.asarray(next(it))
            assert batch.shape == (4, 1, 8, 8) or batch.shape == (4, 3, 8, 8)
        finally:
            device_mod.fits_in_memory = orig_fits
            jax.process_count, jax.process_index = orig_count, orig_index


def _write_test_video(path, n_frames, w=48, h=32, value0=20):
    """MJPG clip of solid-gray frames with per-frame brightness value0+20i."""
    import cv2
    wr = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"MJPG"),
                         10, (w, h))
    if not wr.isOpened():
        pytest.skip("cv2 video encoding unavailable")
    for i in range(n_frames):
        wr.write(np.full((h, w, 3), value0 + 20 * i, np.uint8))
    wr.release()


def test_video_to_store_episodes_and_content(tmp_path):
    """Video folder → store: per-file episode pairs, center-crop, stride."""
    from keypoints_tpu.data.records import video_to_store
    folder = tmp_path / "clips"
    folder.mkdir()
    _write_test_video(folder / "a.avi", 6, value0=20)
    _write_test_video(folder / "b.avi", 4, value0=120)
    path = video_to_store(str(folder), str(tmp_path / "vid.npy"), size=16,
                          stride=2, delta=1)
    store = FrameStore(path)
    # stride 2 keeps frames 0,2,4 of a (3) and 0,2 of b (2)
    assert store.frames.shape == (5, 3, 16, 16)
    assert store.frames.dtype == np.uint8
    # pairs never cross the file boundary: (0,1),(1,2) in a, (3,4) in b
    assert [tuple(p) for p in store.pairs] == [(0, 1), (1, 2), (3, 4)]
    # content survives the lossy codec: solid-gray levels within ~6/255
    means = store.frames.reshape(5, -1).mean(axis=1)
    assert np.allclose(means, [20, 60, 100, 120, 160], atol=6)


def test_video_to_store_grayscale_and_cli(tmp_path, capsys):
    """--video mode of keypoints-collect; 1-channel path; max-frames cap."""
    from keypoints_tpu.data.collect import _cli
    clip = tmp_path / "clip.avi"
    _write_test_video(clip, 5)
    out = str(tmp_path / "vid.npy")
    _cli(["--out", out, "--video", str(clip), "--size", "16",
          "--channels", "1", "--max-frames", "3", "--delta", "2"])
    store = FrameStore(out)
    assert store.frames.shape == (3, 1, 16, 16)
    assert [tuple(p) for p in store.pairs] == [(0, 2)]
    assert "wrote" in capsys.readouterr().out


def test_video_to_store_edge_cases(tmp_path):
    """stride must be >= 1; clips shorter than delta yield a frames-only
    store (no malformed zero-row pair index) that pair_stream rejects with
    its explicit message."""
    from keypoints_tpu.data.records import load_video, video_to_store
    clip = tmp_path / "c.avi"
    _write_test_video(clip, 3)
    with pytest.raises(ValueError, match="stride"):
        load_video(str(clip), size=16, stride=0)
    path = video_to_store(str(clip), str(tmp_path / "v.npy"), size=16,
                          delta=5)
    store = FrameStore(path)
    assert store.pairs is None and store.frames.shape[0] == 3
    with pytest.raises(AssertionError, match="temporal-pair"):
        next(pair_stream(store, 2))
    # episode_pairs keeps its (N, 2) contract even when empty
    assert episode_pairs([3, 2], delta=5).shape == (0, 2)


def test_store_writer_hygiene(tmp_path):
    """Store writers are atomic, normalize suffix-less paths, and never let
    a stale pairs index apply to freshly written frames."""
    import cv2
    from keypoints_tpu.data.records import image_folder_to_store

    folder = tmp_path / "imgs"
    folder.mkdir()
    for i in range(3):
        cv2.imwrite(str(folder / f"{i}.png"),
                    np.full((8, 8, 3), 40 * i, np.uint8))

    # suffix-less out path: frames and pairs land on the .npy convention
    # (previously open_memmap wrote frames at 'store' while FrameStore
    # read pairs from 'store' too — the frames array AS the index)
    out = image_folder_to_store(str(folder), str(tmp_path / "store"), size=8)
    assert out.endswith("store.npy") and os.path.exists(out)
    assert FrameStore(str(tmp_path / "store")).frames.shape == (3, 3, 8, 8)

    # stale pairs index from a previous temporal store must not survive a
    # frames-only rewrite (it would index past the new frame count)
    np.save(str(tmp_path / "store_pairs.npy"),
            np.array([[0, 7]], np.int32))
    image_folder_to_store(str(folder), out, size=8)
    assert FrameStore(out).pairs is None
    FrameStore.write(out, np.zeros((2, 1, 4, 4), np.uint8),
                     pairs=np.array([[0, 1]], np.int32))
    assert FrameStore(out).pairs is not None
    FrameStore.write(out, np.zeros((2, 1, 4, 4), np.uint8))
    assert FrameStore(out).pairs is None

    # a corrupt image fails loudly AND leaves no partial store behind
    (folder / "zz_bad.jpg").write_bytes(b"not an image")
    dest = tmp_path / "bad.npy"
    with pytest.raises(ValueError, match="zz_bad.jpg"):
        image_folder_to_store(str(folder), str(dest), size=8)
    assert not dest.exists() and not (tmp_path / "bad.npy.tmp").exists()


def test_store_meta_provenance(tmp_path):
    """Every writer stamps origin provenance; FrameStore exposes it; stale
    sidecars never apply to rewritten stores (VERDICT r3 #5)."""
    import cv2
    from keypoints_tpu.data.collect import collect
    from keypoints_tpu.data.faces import generate_face_store
    from keypoints_tpu.data.records import image_folder_to_store

    # meta round-trip + stale removal through FrameStore.write
    p = str(tmp_path / "s.npy")
    FrameStore.write(p, np.zeros((2, 1, 4, 4), np.uint8),
                     meta={"origin": "x"})
    assert FrameStore(p).meta == {"origin": "x"}
    FrameStore.write(p, np.zeros((2, 1, 4, 4), np.uint8))
    assert FrameStore(p).meta == {}

    fp = str(tmp_path / "celeba_16.npy")
    generate_face_store(fp, count=4, size=16, seed=0, chunk=4)
    assert FrameStore(fp).meta["origin"] == "synthetic_faces"

    cp = str(tmp_path / "atari_16.npy")
    collect(cp, env_name=None, episodes=1, steps_per_episode=4, size=16)
    assert FrameStore(cp).meta["origin"] == "scripted_pong"

    folder = tmp_path / "imgs"
    folder.mkdir()
    cv2.imwrite(str(folder / "0.png"), np.zeros((8, 8, 3), np.uint8))
    ip = image_folder_to_store(str(folder), str(tmp_path / "real"), size=8)
    assert FrameStore(ip).meta["origin"] == "image_folder"


def test_stream_and_resident_limit_exclude_tail(tmp_path):
    """``limit`` keeps both the grain streams and the device-resident
    samplers strictly inside [0, limit): the tail is the held-out
    best-scoring slice and must be unseen by training (VERDICT r3 #6).
    Tail frames are marked 255 so a single leaked sample is detectable."""
    import jax
    from keypoints_tpu.data.device import sample_frames, sample_pair_frames
    from keypoints_tpu.data.records import (episode_pairs, pair_stream,
                                            single_stream)

    n, tail = 40, 8
    frames = np.zeros((n, 1, 8, 8), np.uint8)
    frames[n - tail:] = 255
    pairs = episode_pairs([n])                      # (39, 2) in index order
    p = str(tmp_path / "s.npy")
    FrameStore.write(p, frames, pairs)
    store = FrameStore(p)

    it = single_stream(store, 16, seed=0, limit=n - tail)
    for _ in range(20):
        assert float(np.asarray(next(it)).max()) < 1.0
    itp = pair_stream(store, 16, seed=0, limit=len(pairs) - tail)
    for _ in range(20):
        a, b = next(itp)
        # held-out pair rows reference tail frames; none may appear
        assert float(np.asarray(b).max()) < 1.0

    fr = jnp.asarray(frames)
    pr = jnp.asarray(pairs)
    for i in range(10):
        k = jax.random.PRNGKey(i)
        assert float(sample_frames(fr, k, 16, limit=n - tail).max()) < 1.0
        _, b = sample_pair_frames(fr, pr, k, 16, limit=len(pairs) - tail)
        assert float(b.max()) < 1.0
