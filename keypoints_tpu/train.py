"""Training entry point: ``python -m keypoints_tpu.train --preset pong64``.

The reference's per-config train scripts collapsed into one loop (SURVEY.md
§2.1 "Train loop(s)", §3.1/§3.2): build config → data stream → jitted
(optionally shard_map-DP) train step → periodic logging, keypoint-overlay
visualization, Orbax checkpointing with automatic resume.

Step-loop design for TPU throughput [B:5]:
* synthetic/warp augmentation runs inside the jitted step (zero host work);
* stored datasets stream uint8 with double-buffered device prefetch;
* metrics are fetched only every ``log_every`` steps — no per-step host sync;
* train state is donated, so params never round-trip HBM.
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Iterator

import jax
import numpy as np

from keypoints_tpu import checkpoint as ckpt
from keypoints_tpu.configs import Config, get_config
from keypoints_tpu.data.records import FrameStore, pair_stream, prefetch, single_stream
from keypoints_tpu.data.synthetic import moving_dots_pair, scripted_pong_pair
from keypoints_tpu.losses import make_perceptual_loss
from keypoints_tpu.parallel import (data_parallel_mesh, make_dp_train_step,
                                    replicate, shard_batch)
from keypoints_tpu.training import (TrainState, build_model, init_state,
                                    make_extract_fn, make_train_step)
from keypoints_tpu.viz import Logger, image_grid, overlay_keypoints


def make_batch_iterator(cfg: Config, start_step: int = 0) -> Iterator:
    """→ iterator of raw-image batches (warp mode) or (src, tgt) pairs.

    The stream is a pure function of ``(cfg.train.seed, step index)``: batch
    ``i`` is derived by folding ``i`` into a base key (or indexing the grain
    pipeline at ``i``), so resuming from a checkpoint at step N with
    ``start_step=N`` replays the EXACT continuation of the uninterrupted
    stream — exact-resume determinism (SURVEY §5 checkpoint/resume) without
    carrying iterator state in the checkpoint.
    """
    import itertools
    d, b = cfg.data, cfg.train.batch_size
    warp_mode = d.pair_mode == "warp"
    if d.dataset == "synthetic_dots":
        def gen():
            base = jax.random.PRNGKey(cfg.train.seed + 1)
            # warp mode synthesizes its own (src, tgt) pair inside the train
            # step from a raw batch; temporal mode wants the generated pair.
            mk = jax.jit(lambda k: moving_dots_pair(
                k, b, d.image_size, num_dots=cfg.model.num_keypoints,
                channels=d.channels, max_shift=0.8)[:2])
            for i in itertools.count(start_step):
                pair = mk(jax.random.fold_in(base, i))
                yield pair[0] if warp_mode else pair
        return gen()
    if d.dataset == "synthetic_pong":
        def gen():
            base = jax.random.PRNGKey(cfg.train.seed + 1)
            mk = jax.jit(lambda k: scripted_pong_pair(k, b, d.image_size)[:2])
            for i in itertools.count(start_step):
                pair = mk(jax.random.fold_in(base, i))
                yield pair[0] if warp_mode else pair
        return gen()
    # stored datasets: device-resident sampling when the store fits in HBM
    # (zero host work and zero H2D per step), grain streams otherwise.
    store_path = f"{d.data_dir}/{d.dataset}_{d.image_size}.npy"
    if not os.path.exists(store_path) and d.dataset == "pose":
        # no offline human-pose footage ships with the repo: synthesize the
        # articulated-figure stand-in so pose256 trains out of the box
        # (swap in real frames via data.records.image_folder_to_store).
        from keypoints_tpu.data.pose import generate_pose_store
        print(f"generating synthetic pose store at {store_path}", flush=True)
        generate_pose_store(store_path, size=d.image_size,
                            seed=cfg.train.seed)
    store = FrameStore(store_path)
    from keypoints_tpu.data.device import DeviceDataset, fits_in_memory
    if fits_in_memory(store):
        from keypoints_tpu.data.device import (sample_frames,
                                               sample_pair_frames)
        ds = DeviceDataset(store)
        # frames/pairs are ARGUMENTS of the jitted sampler, not closures: a
        # closed-over device array is a jaxpr constant and gets serialized
        # into the (remote) compile payload — see data/device.py.
        if d.pair_mode == "temporal":
            fn = jax.jit(lambda fr, pr, k: sample_pair_frames(fr, pr, k, b))
            sample = lambda k: fn(ds.frames, ds.pairs, k)
        else:
            fn = jax.jit(lambda fr, k: sample_frames(fr, k, b))
            sample = lambda k: fn(ds.frames, k)

        def gen():
            base = jax.random.PRNGKey(cfg.train.seed + 3)
            for i in itertools.count(start_step):
                yield sample(jax.random.fold_in(base, i))
        return gen()
    if d.pair_mode == "temporal":
        return prefetch(pair_stream(store, b, cfg.train.seed,
                                    start_batch=start_step,
                                    workers=d.loader_workers))
    return prefetch(single_stream(store, b, cfg.train.seed,
                                  start_batch=start_step,
                                  workers=d.loader_workers))


def make_loss(cfg: Config):
    if cfg.train.loss == "perceptual":
        from keypoints_tpu.models.vgg import make_feature_fn
        feat = make_feature_fn(layers=cfg.train.perceptual_layers)
        return make_perceptual_loss(feat, cfg.train.perceptual_layers)
    return None  # default L2


def train(cfg: Config, logdir: str | None = None) -> TrainState:
    t = cfg.train
    model = build_model(cfg)
    loss = make_loss(cfg)
    state = init_state(cfg, jax.random.PRNGKey(t.seed))

    n_dev = len(jax.devices())
    dp = t.data_parallel and n_dev > 1
    if dp and t.batch_size % n_dev != 0:
        print(f"data_parallel off: batch {t.batch_size} not divisible by "
              f"{n_dev} devices", flush=True)
        dp = False
    if dp:
        mesh = data_parallel_mesh()
        step_fn = make_dp_train_step(cfg, mesh, loss=loss)
        state = replicate(mesh, state)
        put = lambda b: shard_batch(mesh, b)
    else:
        step_fn = jax.jit(make_train_step(cfg, model, loss=loss),
                          donate_argnums=(0,))
        put = lambda b: b

    extract = jax.jit(make_extract_fn(cfg, model))
    mgr = ckpt.make_manager(f"{t.checkpoint_dir}/{cfg.name}", t.max_to_keep)
    start, restored = ckpt.restore_latest(mgr, state._asdict())
    if start is not None:
        state = TrainState(**restored)
        print(f"resumed from step {start}", flush=True)

    log = Logger(logdir)
    # the step rng is fold_in(rng, state.step) inside the step and the data
    # stream is indexed by step, so a resumed run is bit-identical to the
    # uninterrupted one (tested in test_train_integration.py).
    rng = jax.random.PRNGKey(t.seed + 2)
    batches = make_batch_iterator(cfg, start_step=int(np.asarray(state.step)))
    eval_batch = None
    last_t, last_step = time.time(), int(np.asarray(state.step))

    for _ in range(int(np.asarray(state.step)), t.steps):
        batch = put(next(batches))
        if eval_batch is None:
            eval_batch = batch
        state, metrics = step_fn(state, batch, rng)
        step = int(np.asarray(state.step))

        if step % t.log_every == 0:
            now = time.time()
            fps = (step - last_step) * t.batch_size / max(now - last_t, 1e-9)
            last_t, last_step = now, step
            lv = float(np.asarray(metrics["loss"]))
            gn = float(np.asarray(metrics["grad_norm"]))
            if not (np.isfinite(lv) and np.isfinite(gn)):
                raise FloatingPointError(
                    f"training diverged at step {step}: loss={lv} grad={gn}; "
                    f"restart from the last checkpoint with a lower lr")
            print(f"step {step:6d} loss {lv:.5f} grad {gn:.3f} "
                  f"frames/s {fps:.0f}", flush=True)
            log.scalars(step, loss=lv, grad_norm=gn, frames_per_sec=fps)

        if step % t.eval_every == 0:
            imgs = eval_batch if not isinstance(eval_batch, tuple) \
                else eval_batch[1]
            imgs = imgs[:8]
            kp = extract(state.params, imgs)
            over = overlay_keypoints(np.asarray(imgs), np.asarray(kp))
            log.images(step, "keypoints", image_grid(over))

        if step % t.checkpoint_every == 0:
            ckpt.save(mgr, step, state._asdict())

    mgr.wait_until_finished()
    log.close()
    return state


def main(argv=None):
    p = argparse.ArgumentParser(description="keypoints_tpu trainer")
    p.add_argument("--preset", default="pong64")
    p.add_argument("--override", nargs="*", default=[],
                   help="dotted overrides, e.g. train.lr=3e-4")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--logdir", default=None)
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="write a jax.profiler trace for the first 20 steps")
    args = p.parse_args(argv)

    cfg = get_config(args.preset)
    overrides = {}
    for item in args.override:
        k, v = item.split("=", 1)
        import ast
        try:
            v = ast.literal_eval(v)  # literals only: ints, floats, tuples
        except (ValueError, SyntaxError):
            pass  # keep string
        overrides[k] = v
    if args.steps is not None:
        overrides["train.steps"] = args.steps
    if overrides:
        cfg = cfg.override(**overrides)
    if args.profile:
        from keypoints_tpu.utils.profiling import trace
        with trace(args.profile):
            train(cfg.override(**{"train.steps": min(cfg.train.steps, 20)}),
                  args.logdir)
    else:
        train(cfg, args.logdir)


if __name__ == "__main__":
    main()
