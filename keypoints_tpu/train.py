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
import jax.numpy as jnp
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
    d, b = cfg.data, cfg.train.batch_size
    warp_mode = d.pair_mode == "warp"
    if d.dataset == "synthetic_dots":
        def mk(k):
            pair = moving_dots_pair(k, b, d.image_size,
                                    num_dots=cfg.model.num_keypoints,
                                    channels=d.channels, max_shift=0.8)[:2]
            return pair[0] if warp_mode else pair
        return SyntheticBatches(mk, cfg.train.seed, start_step)
    if d.dataset == "synthetic_pong":
        def mk(k):
            pair = scripted_pong_pair(k, b, d.image_size)[:2]
            return pair[0] if warp_mode else pair
        return SyntheticBatches(mk, cfg.train.seed, start_step)
    # stored datasets: device-resident sampling when the store fits in HBM
    # (zero host work and zero H2D per step), grain streams otherwise.
    store_path = f"{d.data_dir}/{d.dataset}_{d.image_size}.npy"
    if not os.path.exists(store_path):
        # Every stored-dataset preset trains out of the box: real footage
        # can't be downloaded offline, so missing stores are synthesized
        # (pose: articulated figures; celeba: procedural faces; atari:
        # scripted-Pong rollouts, or real ALE if installed). Swap in real
        # frames via data.records.image_folder_to_store + data.data_dir.
        if d.dataset == "pose":
            from keypoints_tpu.data.pose import generate_pose_store
            print(f"generating synthetic pose store at {store_path}",
                  flush=True)
            generate_pose_store(store_path, size=d.image_size,
                                seed=cfg.train.seed)
        elif d.dataset == "celeba":
            from keypoints_tpu.data.faces import generate_face_store
            print(f"generating synthetic face store at {store_path}",
                  flush=True)
            generate_face_store(store_path, size=d.image_size,
                                seed=cfg.train.seed)
        elif d.dataset == "atari":
            from keypoints_tpu.data.collect import collect
            print(f"collecting rollouts into {store_path}", flush=True)
            collect(store_path, size=d.image_size, seed=cfg.train.seed)
        else:
            raise FileNotFoundError(
                f"{store_path} not found; convert real frames with "
                f"data.records.image_folder_to_store or point data.data_dir "
                f"at an existing store")
    store = FrameStore(store_path)
    from keypoints_tpu.data.device import DeviceDataset, fits_in_memory
    if fits_in_memory(store):
        ds = DeviceDataset(store)
        return DeviceResidentBatches(ds, b, d.pair_mode, cfg.train.seed,
                                     start_step)
    if d.pair_mode == "temporal":
        return prefetch(pair_stream(store, b, cfg.train.seed,
                                    start_batch=start_step,
                                    workers=d.loader_workers))
    return prefetch(single_stream(store, b, cfg.train.seed,
                                  start_batch=start_step,
                                  workers=d.loader_workers))


class InStepBatches:
    """A batch source that is a pure device function of the step index:
    ``train()`` fuses it INTO the jitted step — and runs a whole
    ``lax.scan`` CHUNK of steps per dispatch, so neither batches nor the
    step counter ever cross a dispatch boundary. On this environment's
    remote-TPU tunnel each dispatch/fetch costs tens of ms: the chunked
    loop took pong64 from ~1.3k to wire-speed and a 6 GiB device-resident
    celeba run from 0.6k to the synthetic-data rate.

    Also iterable (host-dispatch sampling) for the DP/shard_map path and
    for viz/eval batches; the iterator yields the SAME sequence the fused
    step consumes (both index batches by the step counter).
    """

    #: tuple of device arrays to pass through the jitted step (may be empty)
    def args(self) -> tuple:
        return ()

    def sample_in_step(self, args: tuple, step_index):
        raise NotImplementedError

    seed: int = 0
    start_step: int = 0

    _iter_jit = None

    def __iter__(self):
        import itertools
        a = self.args()
        # cache the jitted sampler on the instance: each iter() otherwise
        # builds a fresh jax.jit wrapper — a recompile every time a caller
        # does next(iter(src)) in a loop (as train()'s eval refresh does).
        if self._iter_jit is None:
            self._iter_jit = jax.jit(
                lambda args, i: self.sample_in_step(args, i))
        for i in itertools.count(self.start_step):
            yield self._iter_jit(a, i)


class SyntheticBatches(InStepBatches):
    """On-device synthetic generator, keyed by fold_in(seed+1, step)."""

    def __init__(self, make, seed: int, start_step: int):
        self.make = make
        self.seed = seed
        self.start_step = start_step

    def sample_in_step(self, args, step_index):
        base = jax.random.PRNGKey(self.seed + 1)
        return self.make(jax.random.fold_in(base, step_index))


class DeviceResidentBatches(InStepBatches):
    """Whole store in HBM; frames/pairs ride through the step as ARGUMENTS
    (a closed-over device array would be serialized into the remote-compile
    payload — see data/device.py)."""

    def __init__(self, ds, batch: int, pair_mode: str, seed: int,
                 start_step: int):
        self.ds = ds
        self.batch = batch
        self.pair_mode = pair_mode
        self.seed = seed
        self.start_step = start_step

    def args(self):
        if self.pair_mode == "temporal":
            return (self.ds.frames, self.ds.pairs)
        return (self.ds.frames,)

    def sample_in_step(self, args, step_index):
        from keypoints_tpu.data.device import (sample_frames,
                                               sample_pair_frames)
        k = jax.random.fold_in(jax.random.PRNGKey(self.seed + 3), step_index)
        if self.pair_mode == "temporal":
            return sample_pair_frames(args[0], args[1], k, self.batch)
        return sample_frames(args[0], k, self.batch)


def make_loss(cfg: Config):
    if cfg.train.loss == "perceptual":
        from keypoints_tpu.models.vgg import make_feature_fn
        # Run the frozen VGG trunk in the model's compute dtype: at 256² the
        # perceptual trunk is the FLOP-heavy part of the step and bf16 keeps
        # it on the MXU's fast path (taps are cast back to f32 inside
        # VGG16Features, so the layer-difference loss accumulates in f32).
        # Parity tests pin the f32 path (models/vgg.py default dtype=None).
        dtype = (jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16"
                 else None)
        # Pretrained weights: train.vgg_ckpt explicitly, else the
        # conventional {data_dir}/vgg16.pth drop-in (a torchvision
        # ``vgg16(weights=...).state_dict()`` saved with torch.save), else
        # fixed random init so everything still runs offline [B:10].
        ckpt = cfg.train.vgg_ckpt or None
        if ckpt is None:
            default = os.path.join(cfg.data.data_dir, "vgg16.pth")
            if os.path.exists(default):
                ckpt = default
        if ckpt:
            print(f"perceptual loss: VGG weights from {ckpt}", flush=True)
        feat = make_feature_fn(layers=cfg.train.perceptual_layers,
                               torch_ckpt=ckpt, dtype=dtype)
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

    # Device-side batch sources (synthetic generators, device-resident
    # stores) + single device: fuse sampling INTO the jitted step and scan
    # a CHUNK of steps per dispatch — batches and the step counter never
    # cross a dispatch boundary (each host round-trip through this tunnel
    # costs tens of ms). Chunk = gcd of the log/eval/checkpoint cadences so
    # every host-side action still lands exactly on its step. DP keeps
    # host-dispatch sampling so shard_batch can place shards.
    fused_src = isinstance(batches, InStepBatches) and not dp
    if fused_src:
        import math
        smp = batches
        base_step = make_train_step(cfg, model, loss=loss)
        chunk = math.gcd(math.gcd(t.log_every, t.eval_every),
                         t.checkpoint_every)

        def run_chunk(state, args, rng, n):
            def body(st, _):
                batch = smp.sample_in_step(args, st.step)
                return base_step(st, batch, rng)
            st, ms = jax.lax.scan(body, state, None, length=n)
            return st, jax.tree_util.tree_map(lambda x: x[-1], ms)

        step_chunk = jax.jit(run_chunk, static_argnums=(3,),
                             donate_argnums=(0,))
        src_args = smp.args()
        batch_iter = None
    else:
        chunk = 1
        batch_iter = iter(batches)

    eval_batch = None
    # the step counter is tracked on the HOST: fetching state.step every
    # iteration is a ~28 ms D2H round-trip through this tunnel AND a
    # pipeline barrier (the next step can't be dispatched until the fetch
    # lands) — measured ~90-150 ms/step of pure loop overhead before this.
    step = int(np.asarray(state.step))
    last_t, last_step = time.time(), step

    while step < t.steps:
        if fused_src:
            n = min(chunk, t.steps - step)
            state, metrics = step_chunk(state, src_args, rng, n)
            step += n
        else:
            batch = put(next(batch_iter))
            if eval_batch is None:
                eval_batch = batch
            state, metrics = step_fn(state, batch, rng)
            step += 1

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
            if eval_batch is None:          # resident path: sample once
                eval_batch = next(iter(batches))
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
    from keypoints_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()   # relaunch/resume skips the 20-182 s TPU compile
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
