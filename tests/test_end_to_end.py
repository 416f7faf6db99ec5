"""End-to-end pipeline tests over stored datasets (SURVEY.md §3 call stacks):
collector → FrameStore → stream → train step, for every dataset/model family.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keypoints_tpu.configs import get_config
from keypoints_tpu.data.collect import collect
from keypoints_tpu.data.records import (FrameStore, image_folder_to_store,
                                        pair_stream, prefetch, single_stream)
from keypoints_tpu.training import build_model, init_state, make_train_step


def _small(cfg, **over):
    return cfg.override(**{
        "model.encoder_filters": (8, 16),
        "model.encoder_strides": (2, 2),
        "model.decoder_filters": (16, 8),
        "model.decoder_upsample": (True, True),
        "model.groups": 4,
        "data.image_size": 32,
        "train.batch_size": 4,
        "train.compute_dtype": "float32",
        **over})


def test_transporter_on_collected_rollouts(tmp_path):
    """Atari-style path: scripted collector → temporal pairs → Transporter."""
    path = collect(str(tmp_path / "pong.npy"), env_name=None, episodes=2,
                   steps_per_episode=8, size=32, delta=2)
    store = FrameStore(path)
    cfg = _small(get_config("transporter_atari"))
    model = build_model(cfg)
    state = init_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, model))
    stream = prefetch(pair_stream(store, cfg.train.batch_size, seed=0))
    for i in range(3):
        src, tgt = next(stream)
        state, m = step(state, (src, tgt), jax.random.PRNGKey(1))
    assert np.isfinite(float(np.asarray(m["loss"])))
    assert int(np.asarray(state.step)) == 3


def test_celeba_style_folder_pipeline(tmp_path):
    """CelebA-style path: image folder → packed store → warp-mode training."""
    import cv2
    folder = tmp_path / "faces"
    folder.mkdir()
    rs = np.random.RandomState(0)
    for i in range(6):
        cv2.imwrite(str(folder / f"{i:03d}.png"),
                    (rs.rand(40, 40, 3) * 255).astype(np.uint8))
    path = image_folder_to_store(str(folder), str(tmp_path / "celeba_32.npy"),
                                 size=32, channels=3)
    store = FrameStore(path)
    assert store.frames.shape == (6, 3, 32, 32)

    cfg = _small(get_config("celeba128"))
    model = build_model(cfg)
    state = init_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, model))
    stream = prefetch(single_stream(store, cfg.train.batch_size, seed=0))
    for _ in range(2):
        imgs = next(stream)
        state, m = step(state, imgs, jax.random.PRNGKey(1))
    assert np.isfinite(float(np.asarray(m["loss"])))


def test_perceptual_loss_train_step():
    """pose256-style path (shrunk): perceptual VGG loss inside the train step."""
    from keypoints_tpu.losses import make_perceptual_loss
    from keypoints_tpu.models.vgg import make_feature_fn

    cfg = _small(get_config("pose256"), **{
        "model.num_keypoints": 4,
        "model.encoder_filters": (8, 16),
        "model.encoder_strides": (2, 2),
        "model.decoder_filters": (16, 8),
        "model.decoder_upsample": (True, True),
        "model.sigma": 0.3,
    })
    feat = make_feature_fn(layers=("relu1_2",))
    loss = make_perceptual_loss(feat, ("relu1_2",))
    model = build_model(cfg)
    state = init_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, model, loss=loss))
    imgs = jnp.asarray(np.random.RandomState(0).rand(4, 3, 32, 32), jnp.float32)
    state, m = step(state, imgs, jax.random.PRNGKey(1))
    assert np.isfinite(float(np.asarray(m["loss"])))
    assert float(np.asarray(m["grad_norm"])) > 0


def test_resume_is_bit_exact(tmp_path, monkeypatch):
    """train(8) == train(4)+resume(4): the step rng and the data stream are
    both pure functions of (seed, step), so an interrupted run continues the
    exact trajectory (SURVEY §5 checkpoint/resume; VERDICT r1 missing #7)."""
    from keypoints_tpu.train import train
    monkeypatch.chdir(tmp_path)

    def cfg(ckdir, steps):
        return _small(get_config("pong64"), **{
            "data.dataset": "synthetic_dots",
            "train.steps": steps,
            "train.log_every": 100,
            "train.eval_every": 1000,
            "train.checkpoint_every": 4,
            "train.checkpoint_dir": ckdir})

    s_full = train(cfg("ck_full", 8))
    train(cfg("ck_split", 4))             # checkpoints at step 4
    s_resumed = train(cfg("ck_split", 8))  # resumes from 4, runs 4 more

    flat_a = jax.tree_util.tree_leaves(s_full.params)
    flat_b = jax.tree_util.tree_leaves(s_resumed.params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_cli_resume(tmp_path, monkeypatch, capsys):
    """CLI path twice: second run resumes from the first's checkpoint."""
    from keypoints_tpu import train as train_mod
    monkeypatch.chdir(tmp_path)
    args = ["--preset", "pong64", "--steps", "4", "--override",
            "model.encoder_filters=(8,16)", "model.encoder_strides=(2,2)",
            "model.decoder_filters=(16,8)", "model.decoder_upsample=(True,True)",
            "model.groups=4", "data.image_size=32", "train.batch_size=4",
            "train.compute_dtype=float32", "train.log_every=2",
            "train.eval_every=100", "train.checkpoint_every=2",
            "data.dataset=synthetic_dots"]
    train_mod.main(args)
    out1 = capsys.readouterr().out
    assert "step      4" in out1
    train_mod.main(args + ["--steps", "6"])
    out2 = capsys.readouterr().out
    assert "resumed from step 4" in out2
    assert "step      6" in out2


def test_train_cli_data_parallel(tmp_path, monkeypatch, capsys):
    """train()'s DP branch end to end on the 8 virtual devices: shard_map
    step + host-dispatch batch placement + logging (previously only the DP
    step function was covered, not the loop around it)."""
    import jax

    from keypoints_tpu import train as train_mod
    assert len(jax.devices()) == 8
    monkeypatch.chdir(tmp_path)
    train_mod.main([
        "--preset", "pong64", "--steps", "4", "--override",
        "model.encoder_filters=(8,16)", "model.encoder_strides=(2,2)",
        "model.decoder_filters=(16,8)", "model.decoder_upsample=(True,True)",
        "model.groups=4", "data.image_size=32", "train.batch_size=16",
        "train.compute_dtype=float32", "train.log_every=2",
        "train.eval_every=2", "train.checkpoint_every=100",
        "train.data_parallel=True", "data.dataset=synthetic_dots"])
    out = capsys.readouterr().out
    assert "step      4" in out
    assert "data_parallel off" not in out


def test_dp_fused_chunk_device_resident(tmp_path):
    """The DP fused chunk over a device-RESIDENT store: frames replicated on
    the mesh, per-shard in-step gather, temporal pairs."""
    import jax
    import jax.numpy as jnp

    from keypoints_tpu.configs import get_config
    from keypoints_tpu.data.device import DeviceDataset
    from keypoints_tpu.data.records import FrameStore
    from keypoints_tpu.parallel import (data_parallel_mesh,
                                        make_dp_fused_chunk, replicate)
    from keypoints_tpu.train import DeviceResidentBatches
    from keypoints_tpu.training import init_state

    cfg = get_config("pong64").override(**{
        "model.encoder_filters": (8, 16), "model.encoder_strides": (2, 2),
        "model.decoder_filters": (16, 8),
        "model.decoder_upsample": (True, True), "model.groups": 4,
        "data.image_size": 32, "train.batch_size": 16,
        "train.compute_dtype": "float32"})
    frames = (np.random.RandomState(0).rand(24, 1, 32, 32) * 255).astype(
        np.uint8)
    pairs = np.stack([np.arange(23), np.arange(1, 24)], axis=1)
    path = str(tmp_path / "store.npy")
    FrameStore.write(path, frames, pairs)
    ds = DeviceDataset(FrameStore(path))
    smp = DeviceResidentBatches(ds, 16, "temporal", 0, 0)

    mesh = data_parallel_mesh()
    state = replicate(mesh, init_state(cfg, jax.random.PRNGKey(0)))
    fused = make_dp_fused_chunk(cfg, mesh, smp)
    args = replicate(mesh, smp.args())
    state, m = fused(state, args, jax.random.PRNGKey(1), 3)
    assert np.isfinite(float(np.asarray(m["loss"])))
    assert int(np.asarray(state.step)) == 3


def test_preflight_hbm_refuses_cleanly():
    """The compile-time HBM preflight (pose256-b64 lesson): an impossible
    budget raises a clean actionable error BEFORE any step runs; a generous
    budget returns the per-phase peaks."""
    import pytest

    import jax
    import jax.numpy as jnp

    from keypoints_tpu.configs import get_config
    from keypoints_tpu.train import SyntheticBatches, preflight_hbm
    from keypoints_tpu.training import (init_state, make_extract_fn,
                                        make_train_step, build_model)

    cfg = get_config("pong64").override(**{
        "model.encoder_filters": (8, 16), "model.encoder_strides": (2, 2),
        "model.decoder_filters": (16, 8),
        "model.decoder_upsample": (True, True), "model.groups": 4,
        "data.image_size": 32, "data.pair_mode": "warp",
        "train.batch_size": 8, "train.compute_dtype": "float32"})
    model = build_model(cfg)
    state = init_state(cfg, jax.random.PRNGKey(0))
    base_step = make_train_step(cfg, model)

    def mk(k, n):
        return jax.random.uniform(k, (n, 1, 32, 32), jnp.float32)

    smp = SyntheticBatches(mk, 8, 0, 0)

    def run_chunk(state, args, rng, n):
        def body(st, _):
            return base_step(st, smp.sample_in_step(args, st.step), rng)
        st, ms = jax.lax.scan(body, state, None, length=n)
        return st, jax.tree_util.tree_map(lambda x: x[-1], ms)

    step_chunk = jax.jit(run_chunk, static_argnums=(3,))
    extract = jax.jit(make_extract_fn(cfg, model))
    rng = jax.random.PRNGKey(1)

    info = preflight_hbm(step_chunk, state, (), rng, 2, extract,
                         (8, 1, 32, 32), limit=1 << 40, margin=0)
    assert info and info["step_peak"] > 0 and info["eval_peak"] > 0

    with pytest.raises(ValueError, match="cannot fit the device"):
        preflight_hbm(step_chunk, state, (), rng, 2, extract,
                      (8, 1, 32, 32), limit=1 << 20, margin=0)


def test_dp_resume_is_bit_exact(tmp_path, monkeypatch):
    """DP fused-loop resume: train(6) == train(3)+resume(3) on the 8-device
    mesh — the step rng, per-shard sampling keys, and data stream are all
    pure functions of (seed, step), so the property must survive shard_map
    chunking too."""
    import jax

    from keypoints_tpu.configs import get_config
    from keypoints_tpu.train import train

    assert len(jax.devices()) == 8
    monkeypatch.chdir(tmp_path)

    def cfg(name, steps):
        return get_config("pong64").override(**{
            "name": name,
            "model.encoder_filters": (8, 16), "model.encoder_strides": (2, 2),
            "model.decoder_filters": (16, 8),
            "model.decoder_upsample": (True, True), "model.groups": 4,
            "data.image_size": 32, "data.dataset": "synthetic_dots",
            "data.pair_mode": "warp",
            "train.batch_size": 16, "train.compute_dtype": "float32",
            # eval_every=99 keeps the cadence gcd at 3 so the fused loop
            # really runs MULTI-STEP scan chunks (100 would force chunk=1
            # and silently skip the chunked-resume property under test)
            "train.steps": steps, "train.log_every": 3,
            "train.eval_every": 99, "train.checkpoint_every": 3,
            "train.data_parallel": True,
        })

    s_full = train(cfg("dp_full", 6))
    train(cfg("dp_split", 3))
    s_resumed = train(cfg("dp_split", 6))
    for a, b in zip(jax.tree_util.tree_leaves(s_full.params),
                    jax.tree_util.tree_leaves(s_resumed.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_keypoint_video_rendering(tmp_path):
    """keypoints-video path: store → extract → annotated .mp4 (or the
    headless .npz fallback when no codec is available)."""
    import os

    import cv2

    from keypoints_tpu import video as video_mod
    from keypoints_tpu.training import make_extract_fn

    path = collect(str(tmp_path / "pong.npy"), env_name=None, episodes=1,
                   steps_per_episode=24, size=32, delta=1)
    cfg = _small(get_config("pong64"))
    model = build_model(cfg)
    state = init_state(cfg, jax.random.PRNGKey(0))
    extract = jax.jit(make_extract_fn(cfg, model))

    out = str(tmp_path / "tracked.mp4")
    frames = np.asarray(FrameStore(path).frames[:16])
    n = video_mod.render_keypoint_video(
        out, frames, lambda imgs: extract(state.params, imgs),
        fps=10.0, batch=8)
    assert n == 16
    if os.path.exists(out):                      # codec present: read back
        cap = cv2.VideoCapture(out)
        got = 0
        while cap.read()[0]:
            got += 1
        cap.release()
        assert got == 16
    else:                                        # fallback artifact
        alt = np.load(str(tmp_path / "tracked.npz"))
        assert alt["frames"].shape == (16, 32, 32, 3)


def test_video_cli_smoke(tmp_path, capsys):
    """The keypoints-video CLI end-to-end on the preset's auto-built store."""
    from keypoints_tpu import video as video_mod

    path = collect(str(tmp_path / "atari_32.npy"), env_name=None, episodes=1,
                   steps_per_episode=16, size=32, delta=1)
    out = str(tmp_path / "v.avi")
    video_mod._cli(["--preset", "pong64", "--store", path, "--out", out,
                    "--frames", "8", "--batch", "4", "--override",
                    "model.encoder_filters=(8,16)",
                    "model.encoder_strides=(2,2)",
                    "model.decoder_filters=(16,8)",
                    "model.decoder_upsample=(True,True)",
                    "model.groups=4", "data.image_size=32"])
    assert "wrote 8 frames" in capsys.readouterr().out


def test_video_from_artifact_and_npz_fallback(tmp_path, monkeypatch):
    """Video rendering straight from an exported artifact (no model code),
    with a frame batch bigger than the bucket (exercises bucket splitting);
    plus the codec-free .npz fallback path."""
    import builtins
    import os
    import sys

    from keypoints_tpu import video as video_mod
    from keypoints_tpu.export import export_extract, load_extract
    from keypoints_tpu.training import init_state

    cfg = _small(get_config("pong64"))
    state = init_state(cfg, jax.random.PRNGKey(0))
    art = tmp_path / "x.shlo"
    art.write_bytes(export_extract(cfg, state.params, batch=4))
    ext = load_extract(str(art))

    frames = (np.random.RandomState(0).rand(10, cfg.data.channels, 32, 32)
              * 255).astype(np.uint8)
    out = str(tmp_path / "a.mp4")
    n = video_mod.render_keypoint_video(out, frames, ext, batch=10)
    assert n == 10

    # simulate a cv2-less host: import cv2 raises -> .npz fallback
    real_import = builtins.__import__

    def no_cv2(name, *a, **k):
        if name == "cv2":
            raise ImportError("no cv2")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_cv2)
    sys.modules.pop("cv2", None)
    out2 = str(tmp_path / "b.mp4")
    n = video_mod.render_keypoint_video(out2, frames, ext, batch=4)
    assert n == 10 and not os.path.exists(out2)
    alt = np.load(str(tmp_path / "b.npz"))
    assert alt["frames"].shape == (10, 32, 32, 3)


def test_train_logs_keypoint_and_recon_images(tmp_path, monkeypatch):
    """With a logdir, train() logs BOTH viz artifacts the reference showed:
    keypoint overlays and target|reconstruction side-by-side grids."""
    import os

    from keypoints_tpu.train import train

    monkeypatch.chdir(tmp_path)
    cfg = _small(get_config("pong64"), **{
        "data.dataset": "synthetic_dots", "train.steps": 2,
        "train.log_every": 2, "train.eval_every": 2,
        "train.checkpoint_every": 100})
    train(cfg, logdir=str(tmp_path / "tb"))
    events = [f for f in os.listdir(tmp_path / "tb")
              if "tfevents" in f]
    assert events, "no tensorboard event file written"
    # both image tags present in the serialized events
    raw = (tmp_path / "tb" / events[0]).read_bytes()
    assert b"keypoints" in raw and b"recon" in raw


def test_crash_hint_messages():
    """The recovery hint must not point at a checkpoint that was never
    written (pre-first-save crash), and must name the real latest step."""
    from keypoints_tpu.train import _crash_hint

    cfg = get_config("pong64")
    fresh = _crash_hint(70, None, cfg)
    assert "No checkpoint has been written yet" in fresh
    assert "restarts from step 0" in fresh
    saved = _crash_hint(1234, 1000, cfg)
    assert "step 1000" in saved and "pong64" in saved
    assert "relaunch the same command" in saved


def test_best_tracker_logic(tmp_path):
    """BestTracker saves only on improvement; best.json survives resume."""
    from collections import namedtuple
    from keypoints_tpu.train import BestTracker
    S = namedtuple("S", "params step")
    s = S(params=np.zeros(3, np.float32), step=np.int32(0))
    bt = BestTracker(str(tmp_path / "b"))
    assert bt.update(1, 0.5, s)
    assert not bt.update(2, 0.6, s)          # worse: no save
    assert not bt.update(3, float("nan"), s)  # NaN: never best
    assert bt.update(4, 0.4, s)
    bt.finish()
    bt2 = BestTracker(str(tmp_path / "b"))   # fresh process / resume
    assert bt2.best == 0.4 and bt2.step == 4
    assert not bt2.update(5, 0.45, s)        # resumed best still wins


def test_best_tracker_crash_reconciliation(tmp_path):
    """A crash between the best.json replace and the checkpoint finalize
    must fall back to the PREVIOUS entry (the one the manager retained) —
    a later, worse value may then never evict the retained checkpoint."""
    import json
    from collections import namedtuple
    from keypoints_tpu.train import BestTracker
    S = namedtuple("S", "params step")
    s = S(params=np.zeros(3, np.float32), step=np.int32(0))
    bt = BestTracker(str(tmp_path / "b"))
    assert bt.update(4, 0.5, s)
    bt.finish()                              # manager retains step 4
    # simulate: json replaced for a step-10 improvement, save never landed
    with open(tmp_path / "b" / "best.json", "w") as f:
        json.dump({"step": 10, "eval_loss": 0.3,
                   "previous": {"step": 4, "eval_loss": 0.5}}, f)
    bt2 = BestTracker(str(tmp_path / "b"))
    assert bt2.best == 0.5 and bt2.step == 4   # reconciled to the retained
    assert not bt2.update(11, 0.55, s)         # worse than retained: kept


def test_train_keeps_best_checkpoint(tmp_path, monkeypatch):
    """train() writes a restorable best-by-eval-loss checkpoint + best.json."""
    import json
    from keypoints_tpu import checkpoint as ckpt_mod
    from keypoints_tpu.train import train
    from keypoints_tpu.training import init_state
    monkeypatch.chdir(tmp_path)
    cfg = _small(get_config("pong64"), **{
        "data.dataset": "synthetic_dots",
        "train.steps": 8, "train.log_every": 4, "train.eval_every": 4,
        "train.checkpoint_every": 8, "train.checkpoint_dir": "ck"})
    train(cfg)
    best_dir = tmp_path / "ck" / f"{cfg.name}_best"
    with open(best_dir / "best.json") as f:
        meta = json.load(f)
    assert np.isfinite(meta["eval_loss"]) and meta["step"] in (4, 8)
    # machine-readable scoring provenance (VERDICT r4 #6): a synthetic
    # source's independent-key draw is held-out data
    assert meta["held_out"] is True
    assert meta["scoring"] == "synthetic_draw" and meta["rows"] >= 1
    state = init_state(cfg, jax.random.PRNGKey(0))
    mgr = ckpt_mod.make_manager(str(best_dir))
    step, restored = ckpt_mod.restore_latest(mgr, state._asdict())
    assert step == meta["step"]
    assert any(np.asarray(l).size
               for l in jax.tree_util.tree_leaves(restored["params"]))


def test_train_perceptual_with_best(tmp_path, monkeypatch):
    """pose-style perceptual config (shrunk) through train(): the VGG loss
    feeds both the train step and the best-checkpoint scoring forward."""
    from keypoints_tpu.train import train
    monkeypatch.chdir(tmp_path)
    cfg = _small(get_config("pose256"), **{
        "data.dataset": "synthetic_dots",
        "data.image_size": 16,
        "train.batch_size": 2,
        "train.steps": 2, "train.log_every": 2, "train.eval_every": 2,
        "train.checkpoint_every": 2,
        "train.perceptual_layers": ("relu1_2",),
        "train.checkpoint_dir": "ck"})
    assert cfg.train.loss == "perceptual"
    train(cfg)
    import json
    with open(tmp_path / "ck" / f"{cfg.name}_best" / "best.json") as f:
        meta = json.load(f)
    assert np.isfinite(meta["eval_loss"])


def test_interrupt_saves_checkpoint_and_resume_is_exact(tmp_path, monkeypatch):
    """Ctrl-C mid-run saves at the interrupted step; relaunching the same
    command continues the exact trajectory (train(8) == interrupt@4 +
    resume(8)) — nothing is lost but the in-flight chunk."""
    from keypoints_tpu import train as train_mod
    monkeypatch.chdir(tmp_path)

    def cfg(ckdir, steps):
        return _small(get_config("pong64"), **{
            "data.dataset": "synthetic_dots",
            "train.steps": steps,
            "train.log_every": 4,
            "train.eval_every": 1000,
            "train.checkpoint_every": 1000,    # interrupt save only
            "train.checkpoint_dir": ckdir})

    s_full = train_mod.train(cfg("int_full", 8))

    calls = {"n": 0}
    orig = train_mod.Logger.scalars

    def interrupting_scalars(self, step, **kw):
        orig(self, step, **kw)
        calls["n"] += 1
        if calls["n"] == 1:                    # first log tick = step 4
            raise KeyboardInterrupt
    monkeypatch.setattr(train_mod.Logger, "scalars", interrupting_scalars)
    with pytest.raises(KeyboardInterrupt):
        train_mod.train(cfg("int_split", 8))
    monkeypatch.setattr(train_mod.Logger, "scalars", orig)

    s_resumed = train_mod.train(cfg("int_split", 8))   # resumes from 4
    for a, b in zip(jax.tree_util.tree_leaves(s_full.params),
                    jax.tree_util.tree_leaves(s_resumed.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_interrupt_inside_save_does_not_double_save(tmp_path, monkeypatch):
    """Ctrl-C landing INSIDE ckpt.save (after orbax registered the step but
    before the loop rebinds last_saved) must not re-save the same step from
    the interrupt handler — orbax would raise StepAlreadyExists and mask the
    clean interrupt."""
    from keypoints_tpu import train as train_mod
    cfg = _small(get_config("pong64"), **{
        "data.dataset": "synthetic_dots",
        "train.steps": 8,
        "train.log_every": 4,
        "train.eval_every": 1000,
        "train.checkpoint_every": 4,
        "train.checkpoint_dir": str(tmp_path / "int_insave")})

    orig_save = train_mod.ckpt.save
    calls = {"n": 0}

    def interrupting_save(mgr, step, state):
        orig_save(mgr, step, state)         # the save itself completes
        calls["n"] += 1
        if calls["n"] == 1:                 # Ctrl-C before `last_saved = step`
            raise KeyboardInterrupt
    monkeypatch.setattr(train_mod.ckpt, "save", interrupting_save)
    with pytest.raises(KeyboardInterrupt):   # NOT StepAlreadyExists
        train_mod.train(cfg)
    # the handler skipped the duplicate save: one registered step, one call
    assert calls["n"] == 1
    monkeypatch.setattr(train_mod.ckpt, "save", orig_save)
    s = train_mod.train(cfg)                 # resumes from step 4, finishes
    assert int(np.asarray(s.step)) == 8
    # it really resumed: only ONE checkpoint dir was written before the
    # interrupt, and the resume run restored from it
    assert (tmp_path / "int_insave" / "pong64" / "4").is_dir()


def test_state_saveable_guard():
    """_state_saveable: True for live arrays, False once a leaf's buffer is
    deleted (the donated-input case when an interrupt lands mid-dispatch)."""
    from keypoints_tpu.train import _state_saveable
    x = jnp.ones((4,))
    y = jnp.zeros((2, 2))
    assert _state_saveable({"a": x, "b": (y, 3)})
    y.delete()
    assert not _state_saveable({"a": x, "b": (y, 3)})


def test_chunk_cap_shrinks_with_grad_accum(tmp_path, monkeypatch, capsys):
    """grad_accum multiplies per-step device time, so the scan-chunk cap
    shrinks ~1/accum (dispatch LENGTH, not step count, trips the worker's
    execution deadline)."""
    from keypoints_tpu import train as train_mod
    monkeypatch.chdir(tmp_path)
    common = ["--preset", "pong64", "--steps", "400", "--dry-run",
              "--override",
              "model.encoder_filters=(8,16)", "model.encoder_strides=(2,2)",
              "model.decoder_filters=(16,8)",
              "model.decoder_upsample=(True,True)", "model.groups=4",
              "data.image_size=32", "train.batch_size=8",
              "train.compute_dtype=float32", "data.dataset=synthetic_dots",
              "train.log_every=400", "train.eval_every=400",
              "train.checkpoint_every=400"]
    train_mod.main(common)
    assert "chunk 100 step(s)/dispatch" in capsys.readouterr().out
    train_mod.main(common + ["train.grad_accum=4", "train.batch_size=8"])
    assert "chunk 25 step(s)/dispatch" in capsys.readouterr().out


@pytest.mark.slow
def test_supervised_restart_recovers_from_crash(tmp_path):
    """--supervise N: a mid-run crash (injected via the KEYPOINTS_TPU_FAULT
    hook) relaunches the trainer, which resumes from the latest checkpoint
    and completes — SURVEY §5's automatic restart-from-checkpoint recovery,
    driven through the real CLI in subprocesses."""
    import os
    import subprocess
    import sys

    env = {**os.environ,
           "PYTHONPATH": os.getcwd(),
           "KEYPOINTS_TPU_PLATFORM": "cpu",
           "KEYPOINTS_TPU_FAULT": f"6:{tmp_path / 'fault_marker'}"}
    cmd = [sys.executable, "-m", "keypoints_tpu.train",
           "--preset", "pong64", "--steps", "12", "--supervise", "2",
           "--override",
           "model.encoder_filters=(8,16)", "model.encoder_strides=(2,2)",
           "model.decoder_filters=(16,8)",
           "model.decoder_upsample=(True,True)", "model.groups=4",
           "data.image_size=32", "train.batch_size=4",
           "train.compute_dtype=float32", "data.dataset=synthetic_dots",
           "train.log_every=4", "train.eval_every=1000",
           "train.checkpoint_every=4",
           f"train.checkpoint_dir={tmp_path / 'ck'}"]
    out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         cwd=str(tmp_path), timeout=600)
    assert out.returncode == 0, out.stdout + "\n" + out.stderr
    assert "restart 1/2" in out.stdout            # exactly one relaunch
    assert "restart 2/2" not in out.stdout        # fault fired only once
    assert (tmp_path / "fault_marker").exists()
    assert "injected fault" in out.stderr         # the crash was the fault
    # the relaunch resumed and completed: final step checkpointed
    assert (tmp_path / "ck" / "pong64" / "12").is_dir()


def test_discovery_failure_detection_and_quarantine(tmp_path, monkeypatch):
    """VERDICT r4 #4: a keypoint_spread below the preset threshold past
    spread_check_step raises DiscoveryFailure when abort_on_plateau is set;
    main() quarantines the attempt's checkpoints and exits with the reroll
    code. min_spread=10 forces detection deterministically (spread of
    [-1,1] keypoints can never reach 10); min_spread ~0 never fires."""
    from keypoints_tpu import train as train_mod

    monkeypatch.chdir(tmp_path)
    over = ["model.encoder_filters=(8,16)", "model.encoder_strides=(2,2)",
            "model.decoder_filters=(16,8)",
            "model.decoder_upsample=(True,True)", "model.groups=4",
            "data.image_size=32", "train.batch_size=4",
            "train.compute_dtype=float32", "data.dataset=synthetic_dots",
            "train.log_every=4", "train.eval_every=4",
            "train.checkpoint_every=4", "train.checkpoint_dir=ck",
            "train.spread_check_step=4"]
    with pytest.raises(SystemExit) as ei:
        train_mod.main(["--preset", "pong64", "--steps", "8",
                        "--abort-on-plateau", "--override", *over,
                        "train.min_spread=10.0"])
    assert ei.value.code == train_mod.EXIT_DISCOVERY_FAILURE
    # checkpoints quarantined, non-destructively, so a reroll starts fresh
    assert (tmp_path / "ck" / "pong64_failed_seed0").is_dir()
    assert not (tmp_path / "ck" / "pong64").exists()
    # a healthy run (threshold tiny-but-truthy) completes untouched
    train_mod.main(["--preset", "pong64", "--steps", "8",
                    "--abort-on-plateau", "--override", *over,
                    "train.min_spread=1e-9"])
    assert (tmp_path / "ck" / "pong64" / "8").is_dir()


def test_abort_on_plateau_requires_threshold():
    """--abort-on-plateau on a preset without a pinned min_spread must
    error loudly (thresholds do not transfer across presets: pose256's
    healthy spread overlaps pong64's failure level)."""
    from keypoints_tpu import train as train_mod
    with pytest.raises(SystemExit):
        train_mod.main(["--preset", "celeba128", "--abort-on-plateau"])


@pytest.mark.slow
def test_reroll_on_plateau_advances_seed(tmp_path):
    """--reroll-on-plateau N: a discovery-failure exit relaunches the
    trainer with the NEXT seed (fresh start, prior attempt quarantined) —
    forced thresholds make both attempts fail, proving the seed advanced
    and the loop stopped at the budget."""
    import os
    import subprocess
    import sys

    env = {**os.environ, "PYTHONPATH": os.getcwd(),
           "KEYPOINTS_TPU_PLATFORM": "cpu"}
    cmd = [sys.executable, "-m", "keypoints_tpu.train",
           "--preset", "pong64", "--steps", "8", "--reroll-on-plateau", "1",
           "--override",
           "model.encoder_filters=(8,16)", "model.encoder_strides=(2,2)",
           "model.decoder_filters=(16,8)",
           "model.decoder_upsample=(True,True)", "model.groups=4",
           "data.image_size=32", "train.batch_size=4",
           "train.compute_dtype=float32", "data.dataset=synthetic_dots",
           "train.log_every=4", "train.eval_every=4",
           "train.checkpoint_every=4", "train.checkpoint_dir=ck",
           "train.spread_check_step=4", "train.min_spread=10.0"]
    out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         cwd=str(tmp_path), timeout=600)
    from keypoints_tpu.train import EXIT_DISCOVERY_FAILURE
    assert out.returncode == EXIT_DISCOVERY_FAILURE, \
        out.stdout + "\n" + out.stderr
    assert "retrying with seed offset 1" in out.stdout
    # both attempts quarantined under their own seeds: attempt 2 really ran
    # with seed+1 and did not resume attempt 1's checkpoints
    assert (tmp_path / "ck" / "pong64_failed_seed0").is_dir()
    assert (tmp_path / "ck" / "pong64_failed_seed1").is_dir()


def test_train_cli_dry_run_profile_conflict():
    from keypoints_tpu import train as train_mod
    with pytest.raises(SystemExit):
        train_mod.main(["--preset", "pong64", "--dry-run",
                        "--profile", "/tmp/never"])


def test_train_cli_dry_run(tmp_path, monkeypatch, capsys):
    """--dry-run resolves config + data source and exits without training."""
    from keypoints_tpu import train as train_mod
    monkeypatch.chdir(tmp_path)
    train_mod.main(["--preset", "pong64", "--steps", "4", "--dry-run",
                    "--logdir", str(tmp_path / "dr_logs"),
                    "--override",
                    "model.encoder_filters=(8,16)",
                    "model.encoder_strides=(2,2)",
                    "model.decoder_filters=(16,8)",
                    "model.decoder_upsample=(True,True)", "model.groups=4",
                    "data.image_size=32", "train.batch_size=4",
                    "train.compute_dtype=float32",
                    "data.dataset=synthetic_dots"])
    out = capsys.readouterr().out
    assert "dry run:" in out and '"batch_size": 4' in out
    assert "frames/s" not in out                  # no training happened
    import os
    assert not os.path.exists("checkpoints")
    # "no disk writes" includes the logdir: no event dir, no metrics.jsonl
    assert not (tmp_path / "dr_logs").exists()


def test_train_cli_rejects_abbreviated_flags():
    """allow_abbrev=False: an abbreviated --super would parse as --supervise
    but survive _strip_flag in the child argv, making every child another
    supervisor (an unbounded process chain)."""
    from keypoints_tpu import train as train_mod
    with pytest.raises(SystemExit):
        train_mod.main(["--preset", "pong64", "--super", "2"])


def test_train_loop_with_grad_accum(tmp_path, monkeypatch):
    """grad_accum runs through the full fused-chunk train loop."""
    from keypoints_tpu.train import train
    monkeypatch.chdir(tmp_path)
    cfg = _small(get_config("pong64"), **{
        "data.dataset": "synthetic_dots",
        "train.steps": 4,
        "train.grad_accum": 2,
        "train.log_every": 4,
        "train.eval_every": 4,
        "train.checkpoint_every": 4,
        "train.checkpoint_dir": "ga_ck"})
    state = train(cfg)
    assert int(np.asarray(state.step)) == 4


def test_supervise_passes_discovery_failure_through(monkeypatch):
    """A child exiting with EXIT_DISCOVERY_FAILURE must NOT be retried as a
    crash: the child quarantined its checkpoints, so "resume from latest"
    would deterministically re-train the same seed to the same plateau
    (r5 review #1). --supervise forwards the reroll code unchanged."""
    import subprocess
    from keypoints_tpu import train as train_mod

    launches = []

    class FakeProc:
        def __init__(self, cmd, **kw):
            launches.append(cmd)

        def wait(self):
            return train_mod.EXIT_DISCOVERY_FAILURE

    monkeypatch.setattr(subprocess, "Popen", FakeProc)
    code = train_mod._supervise(["--preset", "pong64"], max_restarts=3)
    assert code == train_mod.EXIT_DISCOVERY_FAILURE
    assert len(launches) == 1            # no restart burned on a non-crash


def test_reroll_supervise_composes_user_seed_offset(monkeypatch):
    """--seed-offset K + --reroll-on-plateau N runs attempts at K, K+1, ...
    (r5 review #2: argparse last-wins silently discarded the user's K, so a
    rerun meant to continue the lottery re-trained known-failing seeds)."""
    import subprocess
    from keypoints_tpu import train as train_mod

    launches = []

    class FakeProc:
        def __init__(self, cmd, **kw):
            launches.append(cmd)

        def wait(self):
            return train_mod.EXIT_DISCOVERY_FAILURE

    monkeypatch.setattr(subprocess, "Popen", FakeProc)
    code = train_mod._reroll_supervise(["--preset", "pong64"], 2,
                                       base_offset=5)
    assert code == train_mod.EXIT_DISCOVERY_FAILURE
    offsets = [c[c.index("--seed-offset") + 1] for c in launches]
    assert offsets == ["5", "6", "7"]


def test_reroll_cli_strips_and_forwards_seed_offset(monkeypatch):
    """main() strips the user's --seed-offset from the child argv (else the
    appended per-attempt offset and the user's would both parse, last-wins)
    and forwards it as the reroll base."""
    from keypoints_tpu import train as train_mod

    seen = {}

    def fake_reroll(child_argv, n, base_offset=0):
        seen.update(argv=child_argv, n=n, base=base_offset)
        return 0

    monkeypatch.setattr(train_mod, "_reroll_supervise", fake_reroll)
    with pytest.raises(SystemExit) as ei:
        train_mod.main(["--preset", "pong64", "--reroll-on-plateau", "2",
                        "--seed-offset", "5"])
    assert ei.value.code == 0
    assert seen["n"] == 2 and seen["base"] == 5
    assert "--seed-offset" not in seen["argv"]
    assert "--reroll-on-plateau" not in seen["argv"]


def test_convert_cli_applies_platform(monkeypatch):
    """keypoints-convert honors $KEYPOINTS_TPU_PLATFORM like every other
    CLI (r5 review #3: shape validation / the export-torch restore allocate
    on the default backend — grabbing the TPU mid-measurement — otherwise)."""
    from keypoints_tpu import checkpoint as ck
    from keypoints_tpu.utils import platform as plat

    calls = []
    monkeypatch.setattr(plat, "apply_platform",
                        lambda *a, **k: calls.append(True))
    with pytest.raises(SystemExit):     # no subcommand → argparse error,
        ck._cli([])                     # but the platform was forced first
    assert calls
