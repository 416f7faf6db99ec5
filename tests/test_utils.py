"""Tests for debug guards, profiling utils, viz, and the eval harness."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keypoints_tpu.configs import get_config
from keypoints_tpu.eval import coordinate_parity, evaluate
from keypoints_tpu.training import build_model, init_state
from keypoints_tpu.utils.debug import assert_batch, assert_finite
from keypoints_tpu.utils.profiling import StepTimer, fetch_sync, timed
from keypoints_tpu.viz import image_grid, overlay_keypoints, side_by_side


def test_assert_finite_raises():
    ok = {"a": jnp.ones(3), "b": {"c": jnp.zeros(2)}}
    assert_finite(ok)
    bad = {"a": jnp.array([1.0, jnp.nan])}
    with pytest.raises(FloatingPointError, match="a"):
        assert_finite(bad, "params")


def test_assert_batch():
    assert_batch(jnp.zeros((2, 3, 8, 8)), channels=3, size=8)
    with pytest.raises(AssertionError):
        assert_batch(jnp.zeros((2, 1, 8, 8)), channels=3, size=8)


def test_timed_and_fetch_sync():
    f = jax.jit(lambda x: x * 2)
    dt, out = timed(f, jnp.ones(16), reps=2)
    assert dt >= 0
    fetch_sync({"a": out})


def test_step_timer():
    t = StepTimer(batch_size=10)
    assert t.mark(5) > 0


def test_viz_shapes():
    imgs = np.random.RandomState(0).rand(4, 1, 16, 16).astype(np.float32)
    kp = np.array([[[0.0, 0.0], [1.0, 1.0], [-1.0, -1.0], [2.0, 0.0]]] * 4)
    over = overlay_keypoints(imgs, kp)
    assert over.shape == (4, 16, 16, 3)
    # out-of-bounds keypoint (2.0, 0) silently skipped
    grid = image_grid(over, cols=2)
    assert grid.shape == (2 * 16, 2 * 16, 3)
    sbs = side_by_side(over, over)
    assert sbs.shape == (4, 16, 32, 3)


def test_synthetic_eval_batch_per_dataset():
    from keypoints_tpu.eval import synthetic_eval_batch
    key = jax.random.PRNGKey(3)
    # pose → 16 ground-truth joints
    cfg = get_config("pose256").override(**{"data.image_size": 32})
    src, tgt, pos = synthetic_eval_batch(cfg, 4, key)
    assert src.shape == (4, 3, 32, 32) and pos.shape == (4, 16, 2)
    # pong-family → (ball, paddle, paddle)
    cfg = get_config("transporter_atari").override(**{"data.image_size": 32})
    src, tgt, pos = synthetic_eval_batch(cfg, 4, key)
    assert src.shape == (4, 1, 32, 32) and pos.shape == (4, 3, 2)
    # celeba → 4 facial landmarks on procedural faces
    cfg = get_config("celeba128").override(**{"data.image_size": 32})
    src, tgt, pos = synthetic_eval_batch(cfg, 4, key)
    assert src.shape == (4, 3, 32, 32) and pos.shape == (4, 4, 2)
    assert np.all(np.abs(pos) <= 1.0)
    # default → one dot per keypoint
    cfg = get_config("pong64").override(**{"data.image_size": 32,
                                           "data.dataset": "synthetic_dots"})
    src, tgt, pos = synthetic_eval_batch(cfg, 4, key)
    assert pos.shape == (4, cfg.model.num_keypoints, 2)


def test_evaluate_metrics():
    cfg = get_config("pong64").override(**{
        "model.encoder_filters": (8, 16),
        "model.encoder_strides": (2, 2),
        "model.decoder_filters": (16, 8),
        "model.decoder_upsample": (True, True),
        "model.groups": 4,
        "data.image_size": 32,
        "train.compute_dtype": "float32"})
    state = init_state(cfg, jax.random.PRNGKey(0))
    rs = np.random.RandomState(0)
    src = jnp.asarray(rs.rand(4, 1, 32, 32), jnp.float32)
    tgt = jnp.asarray(rs.rand(4, 1, 32, 32), jnp.float32)
    pos = rs.uniform(-1, 1, (4, 4, 2)).astype(np.float32)
    m = evaluate(cfg, state.params, src, tgt, true_positions=pos)
    for k in ("eval_loss", "keypoint_spread", "keypoint_in_bounds",
              "locking_median", "locking_mean"):
        assert np.isfinite(m[k]), k
    assert 0.0 <= m["pck@0.1"] <= m["pck@0.2"] <= 1.0

    # PCK sanity: ground truth placed exactly at the predicted keypoints
    # must score 1.0 at both thresholds
    kp = np.asarray(jax.jit(lambda p, s: build_model(cfg).apply(
        {"params": p}, s, method="extract_keypoints"))(state.params, tgt))
    exact = evaluate(cfg, state.params, src, tgt, true_positions=kp)
    assert exact["pck@0.1"] == 1.0 and exact["locking_median"] < 1e-5

    # parity helper: golden == the model itself → parity 0
    from keypoints_tpu.training import make_extract_fn
    model = build_model(cfg)
    extract = jax.jit(make_extract_fn(cfg, model))
    golden = lambda imgs: np.asarray(extract(state.params, jnp.asarray(imgs)))
    assert coordinate_parity(cfg, state.params, golden,
                             np.asarray(src)) < 1e-6


def test_eval_cli(tmp_path, capsys):
    """Train 2 steps via CLI, then evaluate the checkpoint via the eval CLI."""
    import os
    from keypoints_tpu import train as train_mod
    from keypoints_tpu import eval as eval_mod
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        over = ["model.encoder_filters=(8,16)", "model.encoder_strides=(2,2)",
                "model.decoder_filters=(16,8)", "model.decoder_upsample=(True,True)",
                "model.groups=4", "data.image_size=32", "train.batch_size=4",
                "train.compute_dtype=float32", "train.log_every=2",
                "train.eval_every=100", "train.checkpoint_every=2",
                "data.dataset=synthetic_dots"]
        train_mod.main(["--preset", "pong64", "--steps", "2",
                        "--override", *over])
        eval_mod._cli(["--preset", "pong64", "--checkpoint",
                       "checkpoints/pong64", "--batch", "4",
                       "--override", *over,
                       "--overlay", str(tmp_path / "ov.png")])
        out = capsys.readouterr().out
        assert "restored step 2" in out
        assert "locking_median" in out
        assert (tmp_path / "ov.png").exists()
    finally:
        os.chdir(cwd)


def test_logger_writes_tensorboard_events(tmp_path):
    from keypoints_tpu.viz import Logger
    log = Logger(str(tmp_path / "tb"))
    log.scalars(1, loss=0.5, fps=100.0)
    log.images(1, "grid", np.zeros((8, 8, 3), np.float32))
    log.close()
    files = list((tmp_path / "tb").glob("events.out.tfevents.*"))
    assert files and files[0].stat().st_size > 0
    # scalars also land in metrics.jsonl (headless training curves)
    import json
    lines = [json.loads(l) for l in
             (tmp_path / "tb" / "metrics.jsonl").read_text().splitlines()]
    assert lines == [{"step": 1, "loss": 0.5, "fps": 100.0}]
    # non-finite values serialize as null, keeping every line valid JSON
    log2 = Logger(str(tmp_path / "tb2"))
    log2.scalars(2, loss=float("nan"), ok=1.0)
    log2.close()
    row = json.loads((tmp_path / "tb2" / "metrics.jsonl").read_text())
    assert row == {"step": 2, "loss": None, "ok": 1.0}
    # no-op logger never writes
    Logger(None).scalars(1, loss=1.0)


def test_enable_compile_cache(tmp_path, monkeypatch):
    """CLI compile-cache helper: explicit arg > env > default, dir created."""
    import os

    import jax

    from keypoints_tpu.utils.compile_cache import enable_compile_cache

    try:
        monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
        p = enable_compile_cache(str(tmp_path / "c1"))
        assert os.path.isdir(p) and p.endswith("c1")
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "c2"))
        assert enable_compile_cache().endswith("c2")
    finally:
        jax.config.update("jax_compilation_cache_dir", None)


def test_capped_chunk_divides_cadence():
    from keypoints_tpu.train import capped_chunk
    assert capped_chunk(50) == 50
    assert capped_chunk(100) == 100
    assert capped_chunk(500) == 100      # the pose256-b64 crash config
    assert capped_chunk(600) == 100
    assert capped_chunk(303) == 3        # 3*101: largest divisor <= 100
    assert capped_chunk(997) == 1        # prime > cap -> per-step dispatch
    for g in (500, 600, 303, 997, 120, 7):
        c = capped_chunk(g)
        assert 1 <= c <= 100 and g % c == 0


def test_bench_backend_probe():
    """bench.py's watchdog: answers promptly on a live backend, None on a
    hung one (the 2026-08-18 axon outage mode) instead of hanging forever."""
    import importlib.util
    import os
    import time
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    probed = bench._probe_backend(timeout_s=30)                 # live (CPU)
    assert probed is not None and not isinstance(probed, Exception)
    assert bench._probe_backend(timeout_s=0.2,
                                devices_fn=lambda: time.sleep(30)) is None
    # a PROMPT failure is distinguished from a hang (different outage mode)
    def boom():
        raise RuntimeError("pjrt init failed")
    got = bench._probe_backend(timeout_s=5, devices_fn=boom)
    assert isinstance(got, Exception) and "pjrt" in str(got)


def test_checkify_step_catches_nonfinite():
    """debug.checkify_step compiles NaN/OOB checks into the REAL train step
    (SURVEY §5 sanitizers): clean batch passes, poisoned batch throws."""
    import jax
    import jax.numpy as jnp
    import pytest
    from keypoints_tpu.configs import get_config
    from keypoints_tpu.training import build_model, init_state, make_train_step
    from keypoints_tpu.utils.debug import checkify_step

    cfg = get_config("pong64").override(**{
        "model.encoder_filters": (4, 8), "model.encoder_strides": (2, 2),
        "model.decoder_filters": (8, 4), "model.decoder_upsample": (True, True),
        "model.groups": 2, "model.num_keypoints": 2,
        "data.image_size": 16, "train.batch_size": 2,
        "train.compute_dtype": "float32"})
    state = init_state(cfg, jax.random.PRNGKey(0))
    run, consume = checkify_step(make_train_step(cfg, build_model(cfg)))
    run = jax.jit(run)
    img = jnp.ones((2, 1, 16, 16), jnp.float32) * 0.5
    err, (state2, m) = run(state, (img, img), jax.random.PRNGKey(1))
    consume(err)                                   # clean: must not raise
    assert np.isfinite(float(np.asarray(m["loss"])))
    bad = img.at[0, 0, 0, 0].set(jnp.nan)
    err, _ = run(state, (bad, img), jax.random.PRNGKey(1))
    with pytest.raises(Exception):                 # checkify JaxRuntimeError
        consume(err)


def test_eval_batch_for_honest_store_routing(tmp_path, capsys):
    """eval_batch_for: synthetic-origin stores keep generator ground truth;
    real stores (no sidecar / ingested footage) get frames FROM the store
    and no fabricated locking GT unless --landmarks supplies it
    (VERDICT r3 #5)."""
    from keypoints_tpu.configs import get_config
    from keypoints_tpu.data.faces import generate_face_store
    from keypoints_tpu.data.records import FrameStore, episode_pairs
    from keypoints_tpu.eval import eval_batch_for, store_eval_batch

    size = 16
    key = jax.random.PRNGKey(0)
    cfg = get_config("celeba128").override(**{
        "data.data_dir": str(tmp_path), "data.image_size": size,
        "train.batch_size": 8})

    # no store yet → generator (the trainer would synthesize the same)
    _, _, pos, info = eval_batch_for(cfg, 4, key)
    assert pos is not None
    assert info["source"] == "synthetic" and info["held_out"]

    # synthetic-origin store → generator GT still honest
    generate_face_store(str(tmp_path / f"celeba_{size}.npy"),
                        count=32, size=size, seed=0, chunk=16)
    _, _, pos, info = eval_batch_for(cfg, 4, key)
    assert pos is not None and info["source"] == "synthetic"

    # hand-built store (no sidecar) = real footage: frames from the STORE
    # tail, locking GT honestly absent, note printed
    frames = np.zeros((32, 3, size, size), np.uint8)
    frames[-4:] = 200
    FrameStore.write(str(tmp_path / f"celeba_{size}.npy"), frames)
    capsys.readouterr()
    src, tgt, pos, info = eval_batch_for(cfg, 4, key)
    assert pos is None
    assert info == {"source": "store", "held_out": True, "rows": 4,
                    "requested_rows": 4, "gt": None}
    assert "locking/PCK skipped" in capsys.readouterr().out
    # warp-mode pair built from the marked tail frames (border padding)
    assert float(np.asarray(src).mean()) > 0.5

    # --landmarks restores locking on real footage (warp mode carries the
    # positions through the target warp)
    marks = np.zeros((32, 2, 2), np.float32)
    lp = str(tmp_path / "marks.npy")
    np.save(lp, marks)
    src, tgt, pos, info = eval_batch_for(cfg, 4, key, landmarks_path=lp)
    assert pos is not None and pos.shape == (4, 2, 2)
    assert info["gt"] == "landmarks" and info["held_out"]
    assert np.all(np.abs(pos) <= 1.2)          # center maps near center

    # row-count mismatch fails loudly
    np.save(lp, marks[:5])
    with pytest.raises(ValueError, match="landmarks rows"):
        eval_batch_for(cfg, 4, key, landmarks_path=lp)

    # temporal mode: pairs come from the stored index; landmarks indexed
    # by the TARGET frame of each pair
    pairs = episode_pairs([32])
    FrameStore.write(str(tmp_path / f"atari_{size}.npy"), frames[:, :1],
                     pairs)
    cfg_t = get_config("transporter_atari").override(**{
        "data.data_dir": str(tmp_path), "data.image_size": size,
        "train.batch_size": 8})
    capsys.readouterr()
    src, tgt, pos, _ = eval_batch_for(cfg_t, 4, jax.random.PRNGKey(1))
    assert pos is None and "locking/PCK skipped" in capsys.readouterr().out
    store = __import__("keypoints_tpu.data.records",
                       fromlist=["FrameStore"]).FrameStore(
        str(tmp_path / f"atari_{size}.npy"))
    marks1 = np.tile(np.arange(32, dtype=np.float32)[:, None, None],
                     (1, 3, 2)) / 32.0
    np.save(lp, marks1)
    src, tgt, pos, _ = store_eval_batch(cfg_t, store, 4, key, np.load(lp))
    ij = pairs[-4:]
    np.testing.assert_allclose(pos, marks1[ij[:, 1]])

    # UNMAPPED dataset name + sidecar-less store: origin and the mapped
    # origin are both None — a bare == would route real footage to the
    # synthetic generator with fabricated GT (ADVICE r4 medium #1). Must
    # come from the STORE with locking honestly skipped.
    frames_u = np.zeros((32, 3, size, size), np.uint8)
    frames_u[-4:] = 200
    FrameStore.write(str(tmp_path / f"mycam_{size}.npy"), frames_u)
    cfg_u = cfg.override(**{"data.dataset": "mycam"})
    capsys.readouterr()
    src, tgt, pos, info = eval_batch_for(cfg_u, 4, key)
    assert pos is None
    assert info["source"] == "store" and info["gt"] is None
    assert "locking/PCK skipped" in capsys.readouterr().out
    assert float(np.asarray(src).mean()) > 0.5   # the marked store tail


def test_store_eval_batch_clamps_to_heldout_tail(tmp_path, capsys):
    """An eval batch larger than the reserved tail is CLAMPED, never
    padded with trained rows (VERDICT r4 review: 56 of 64 default-batch
    eval rows used to come from the training stream)."""
    from keypoints_tpu.configs import get_config
    from keypoints_tpu.data.records import FrameStore
    from keypoints_tpu.eval import store_eval_batch
    from keypoints_tpu.train import scoring_holdout

    size, n = 16, 512
    frames = np.zeros((n, 3, size, size), np.uint8)
    frames[-64:] = 200                       # the reserved tail, marked
    sp = str(tmp_path / f"celeba_{size}.npy")
    FrameStore.write(sp, frames)
    cfg = get_config("celeba128").override(**{
        "data.data_dir": str(tmp_path), "data.image_size": size})
    assert scoring_holdout(cfg, n) == 64
    store = FrameStore(sp)
    capsys.readouterr()
    src, tgt, pos, info = store_eval_batch(cfg, store, 128,
                                            jax.random.PRNGKey(0))
    out = capsys.readouterr().out
    assert "clamped 128 -> 64" in out
    assert info == {"source": "store", "held_out": True, "rows": 64,
                    "requested_rows": 128, "gt": None}
    assert src.shape[0] == 64
    # every eval row comes from the marked held-out tail (border padding
    # in the warp keeps marked content dominant; trained rows are all 0)
    per_row = np.asarray(src).reshape(64, -1).mean(axis=1)
    assert per_row.min() > 0.5

    # a store too small to reserve a tail records the in-sample fallback
    # as a FIELD (VERDICT r4 #6), not only a stdout warning
    sp2 = str(tmp_path / "tiny" / f"celeba_{size}.npy")
    os.makedirs(str(tmp_path / "tiny"))
    FrameStore.write(sp2, frames[:16])
    cfg2 = cfg.override(**{"data.data_dir": str(tmp_path / "tiny")})
    capsys.readouterr()
    _, _, _, info = store_eval_batch(cfg2, FrameStore(sp2), 8,
                                     jax.random.PRNGKey(0))
    assert info["held_out"] is False and info["rows"] == 8
    assert "OVERLAP training data" in capsys.readouterr().out


def test_checkify_step_catches_warp_window_violation(monkeypatch):
    """debug runs assert the warp y-window contract inside the aug path
    (VERDICT r3 weak #5): a healthy WarpConfig passes; a window bound made
    too small (simulating a config change that breaks the ±3σ-clip
    derivation) raises through checkify instead of silently zero-filling."""
    from keypoints_tpu.configs import get_config
    from keypoints_tpu.data import augment
    from keypoints_tpu.training import build_model, init_state, make_train_step
    from keypoints_tpu.utils.debug import checkify_step

    cfg = get_config("pong64").override(**{
        "model.encoder_filters": (4, 8), "model.encoder_strides": (2, 2),
        "model.decoder_filters": (8, 4), "model.decoder_upsample": (True, True),
        "model.groups": 2, "model.num_keypoints": 2,
        "data.image_size": 16, "data.pair_mode": "warp",
        "train.batch_size": 2, "train.compute_dtype": "float32"})
    state = init_state(cfg, jax.random.PRNGKey(0))
    img = jnp.ones((2, 1, 16, 16), jnp.float32) * 0.5

    run, consume = checkify_step(make_train_step(cfg, build_model(cfg)))
    err, (_, m) = jax.jit(run)(state, img, jax.random.PRNGKey(1))
    consume(err)                                    # healthy bound: clean
    assert np.isfinite(float(np.asarray(m["loss"])))

    # break the bound: the kernel would now zero-fill rows silently — the
    # debug check must raise instead
    monkeypatch.setattr(augment, "warp_y_window", lambda cfg, h: 2)
    run2, consume2 = checkify_step(make_train_step(cfg, build_model(cfg)))
    err2, _ = jax.jit(run2)(state, img, jax.random.PRNGKey(1))
    with pytest.raises(Exception, match="y-window violated"):
        consume2(err2)

    # hot path: no window_checks context → no user check traced, no cost
    plain = jax.jit(make_train_step(cfg, build_model(cfg)))
    _, m3 = plain(state, img, jax.random.PRNGKey(1))
    assert np.isfinite(float(np.asarray(m3["loss"])))
