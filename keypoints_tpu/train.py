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
import sys
import time
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from keypoints_tpu import checkpoint as ckpt
from keypoints_tpu.configs import Config, get_config
from keypoints_tpu.data.records import (FrameStore, pair_stream, prefetch,
                                        single_stream, store_path_for,
                                        tail_pair_frames)
from keypoints_tpu.data.synthetic import moving_dots_pair, scripted_pong_pair
from keypoints_tpu.losses import make_perceptual_loss
from keypoints_tpu.parallel import (data_parallel_mesh, make_dp_fused_chunk,
                                    make_dp_train_step, replicate,
                                    shard_batch)
from keypoints_tpu.training import (TrainState, build_model, init_state,
                                    make_extract_fn, make_train_step)
from keypoints_tpu.viz import (Logger, image_grid, overlay_keypoints,
                               side_by_side, to_hwc)


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
        def mk(k, n):
            pair = moving_dots_pair(k, n, d.image_size,
                                    num_dots=cfg.model.num_keypoints,
                                    channels=d.channels, max_shift=0.8)[:2]
            return pair[0] if warp_mode else pair
        return SyntheticBatches(mk, b, cfg.train.seed, start_step)
    if d.dataset == "synthetic_pong":
        def mk(k, n):
            pair = scripted_pong_pair(k, n, d.image_size)[:2]
            return pair[0] if warp_mode else pair
        return SyntheticBatches(mk, b, cfg.train.seed, start_step)
    # stored datasets: device-resident sampling when the store fits in HBM
    # (zero host work and zero H2D per step), grain streams otherwise.
    store_path = store_path_for(d)
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
    # Reserve the store tail for best-checkpoint scoring: the scored pair
    # must be data training NEVER sees (VERDICT r3 #6). Same holdout for
    # resident and stream sources so a store switches paths transparently.
    n_items = (len(store.pairs) if d.pair_mode == "temporal"
               and store.pairs is not None else len(store.frames))
    holdout = scoring_holdout(cfg, n_items)
    limit = n_items - holdout if holdout else None
    from keypoints_tpu.data.device import DeviceDataset, fits_in_memory
    if fits_in_memory(store):
        ds = DeviceDataset(store)
        return DeviceResidentBatches(ds, b, d.pair_mode, cfg.train.seed,
                                     start_step, limit=limit)
    # bigger-than-HBM: grain host streams. Under multi-host DP each process
    # reads only its own index shard at its local batch size (SURVEY §2.4
    # "per-host Grain sharding"); single-process runs see (0, 1) and the
    # full batch.
    from keypoints_tpu.parallel.multihost import host_shard, local_batch_size
    pid, n_hosts = host_shard()
    lb = local_batch_size(b)
    if d.pair_mode == "temporal":
        return prefetch(pair_stream(store, lb, cfg.train.seed,
                                    shard_index=pid, shard_count=n_hosts,
                                    start_batch=start_step,
                                    workers=d.loader_workers, limit=limit))
    return prefetch(single_stream(store, lb, cfg.train.seed,
                                  shard_index=pid, shard_count=n_hosts,
                                  start_batch=start_step,
                                  workers=d.loader_workers, limit=limit))


class InStepBatches:
    """A batch source that is a pure device function of the step index:
    ``train()`` fuses it INTO the jitted step — and runs a whole
    ``lax.scan`` CHUNK of steps per dispatch, so neither batches nor the
    step counter ever cross a dispatch boundary. On this environment's
    remote-TPU tunnel each dispatch/fetch costs tens of ms: the chunked
    loop took pong64 from ~1.3k to wire-speed and a 6 GiB device-resident
    celeba run from 0.6k to the synthetic-data rate.

    The sampling primitive is ``sample(args, key, n)`` — batch-size- and
    key-parametric so the DP path can draw per-shard sub-batches with
    decorrelated keys *inside* ``shard_map`` (parallel/dp.py): the fused
    chunked loop is the SAME loop under DP, not a slower host-dispatch
    special case (VERDICT r2 missing #2).

    Also iterable (host-dispatch sampling) for viz/eval batches; the
    iterator yields the SAME sequence the fused single-device step consumes
    (both index batches by the step counter).
    """

    batch: int = 0
    seed: int = 0
    start_step: int = 0
    #: fold_in salt separating this source's key stream from the step rng
    _key_salt: int = 1

    #: tuple of device arrays to pass through the jitted step (may be empty)
    def args(self) -> tuple:
        return ()

    def sample(self, args: tuple, key: jax.Array, n: int):
        """Draw an n-example batch — pure jittable function of (args, key)."""
        raise NotImplementedError

    def step_key(self, step_index) -> jax.Array:
        """The key for step ``step_index`` (before any per-shard folding)."""
        return jax.random.fold_in(
            jax.random.PRNGKey(self.seed + self._key_salt), step_index)

    def sample_in_step(self, args: tuple, step_index):
        return self.sample(args, self.step_key(step_index), self.batch)

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

    def __init__(self, make, batch: int, seed: int, start_step: int):
        self.make = make            # (key, n) -> batch or (src, tgt)
        self.batch = batch
        self.seed = seed
        self.start_step = start_step

    def sample(self, args, key, n):
        return self.make(key, n)


class DeviceResidentBatches(InStepBatches):
    """Whole store in HBM; frames/pairs ride through the step as ARGUMENTS
    (a closed-over device array would be serialized into the remote-compile
    payload — see data/device.py). ``limit`` restricts sampling to the
    first ``limit`` frames/pairs — the tail is the held-out scoring slice
    (``scoring_holdout``)."""

    _key_salt = 3

    def __init__(self, ds, batch: int, pair_mode: str, seed: int,
                 start_step: int, limit: int | None = None):
        self.ds = ds
        self.batch = batch
        self.pair_mode = pair_mode
        self.seed = seed
        self.start_step = start_step
        self.limit = limit

    def args(self):
        if self.pair_mode == "temporal":
            return (self.ds.frames, self.ds.pairs)
        return (self.ds.frames,)

    def sample(self, args, key, n):
        from keypoints_tpu.data.device import (sample_frames,
                                               sample_pair_frames)
        if self.pair_mode == "temporal":
            return sample_pair_frames(args[0], args[1], key, n,
                                      limit=self.limit)
        return sample_frames(args[0], key, n, limit=self.limit)


def scoring_rows(cfg: Config) -> int:
    """Rows in the fixed best-checkpoint scoring pair (small on purpose —
    it runs at every eval cadence and its forward counts against the HBM
    preflight)."""
    return min(8, cfg.train.batch_size)


def scoring_holdout(cfg: Config, n_items: int) -> int:
    """How many tail items (frames in warp mode, pairs in temporal mode) a
    store reserves as held-out data: the best-checkpoint scoring pair must
    be UNSEEN by training in every source mode (VERDICT r3 #6), and
    ``keypoints-eval`` on a store-backed dataset scores the same reserved
    tail — so the reserve is sized for an eval batch (up to 64 rows, at
    most a quarter of the store), not just the 8 scoring rows. Synthetic
    generators need no holdout (an independent key IS unseen data); tiny
    stores (reserve < the scoring rows, e.g. test fixtures) skip the
    holdout rather than starve training — scoring then falls back to the
    legacy seen-batch draw, documented at the eval_pair construction
    site, and eval prints an in-sample warning."""
    reserve = min(64, n_items // 4)
    return reserve if reserve >= scoring_rows(cfg) else 0


def heldout_scoring_pair(cfg: Config):
    """→ fixed (src, tgt) scoring pair from the store's held-out tail, or
    None (synthetic datasets / missing store / store too small to reserve).

    Reads the LAST ``scoring_rows`` items of the tail ``make_batch_iterator``
    excluded from training (via the shared ``records.tail_pair_frames`` —
    any tail subset is unseen): temporal mode scores stored pairs; warp
    mode applies one fixed independently-keyed warp pair (the training
    objective's distribution, like the in-step aug).
    """
    d = cfg.data
    if d.dataset in ("synthetic_dots", "synthetic_pong"):
        return None
    sp = store_path_for(d)
    if not os.path.exists(sp):
        return None
    store = FrameStore(sp)
    temporal = d.pair_mode == "temporal" and store.pairs is not None
    n_items = len(store.pairs) if temporal else len(store.frames)
    if not scoring_holdout(cfg, n_items):
        return None
    a, b, _ = tail_pair_frames(store, d.pair_mode, scoring_rows(cfg))
    if temporal:
        return a, b
    from keypoints_tpu.data.augment import make_pair
    from keypoints_tpu.training import warp_config
    return jax.jit(lambda k, f: make_pair(k, f, warp_config(cfg)))(
        jax.random.PRNGKey(cfg.train.seed + 9), a)


#: exit code a trainer child uses to signal "init never discovered all
#: objects — reroll the seed" to the --reroll-on-plateau supervisor
#: (distinct from crash codes so a real crash is never retried as a reroll)
EXIT_DISCOVERY_FAILURE = 23


class DiscoveryFailure(RuntimeError):
    """Raised at eval cadence when keypoint_spread stays below the preset's
    pinned threshold past spread_check_step and train.abort_on_plateau is
    set (VERDICT r4 #4: a failed-discovery run used to burn the full
    schedule and the user learned at eval time)."""

    def __init__(self, step: int, spread: float, threshold: float):
        super().__init__(
            f"discovery failure at step {step}: keypoint_spread "
            f"{spread:.3f} < {threshold} (quality.json: failed inits sit "
            f"at ~0.46 vs 0.88+ healthy)")
        self.step, self.spread = step, spread


#: HBM kept free for runtime/framework overhead beyond XLA's own accounting
PREFLIGHT_MARGIN_BYTES = 512 << 20

#: max train steps fused into one lax.scan dispatch — see train() in-line
#: comment (long single dispatches kill the remote TPU worker)
MAX_CHUNK_STEPS = 100


def capped_chunk(cadence_gcd: int, cap: int = MAX_CHUNK_STEPS) -> int:
    """Largest divisor of ``cadence_gcd`` that is ≤ ``cap``: the scan-chunk
    length must divide the log/eval/checkpoint cadence gcd so host-side
    actions land exactly on their steps, while staying short enough that a
    single device dispatch cannot trip the remote worker's execution
    deadline (measured: ~70 s dispatches kill the v5e worker; ≤14 s are
    clean — see BASELINE.md pose256-b64)."""
    if cadence_gcd <= cap:
        return cadence_gcd
    return max(d for d in range(1, cap + 1) if cadence_gcd % d == 0)


def _state_saveable(state) -> bool:
    """False when any leaf's device buffer is deleted — the case when an
    interrupt lands inside a dispatched step and ``state`` still names the
    DONATED input (donate_argnums marks it deleted at dispatch)."""
    return not any(leaf.is_deleted()
                   for leaf in jax.tree_util.tree_leaves(state)
                   if hasattr(leaf, "is_deleted"))


def _tree_bytes(tree) -> int:
    return sum(x.nbytes for x in jax.tree_util.tree_leaves(tree)
               if hasattr(x, "nbytes"))


def preflight_hbm(step_chunk, state, src_args, rng, chunk: int,
                  extract, eval_image_shape, limit: int | None = None,
                  margin: int = PREFLIGHT_MARGIN_BYTES,
                  eval_loss_fn=None) -> dict | None:
    """Compile-time total-HBM preflight for the fused train loop.

    A store that fits HBM is not a LOOP that fits: the step program's
    activations and the eval-extract program run with the store and train
    state resident, and an over-committed program kills the TPU worker
    outright rather than raising (the reproducible pose256-b64 failure —
    BASELINE.md; SURVEY §5 failure detection). This asks XLA's buffer
    assignment — exact, no execution — for each program's peak, adds the
    persistently-resident arrays where they are not already program
    arguments, and raises with actionable guidance if the worst phase
    cannot fit ``limit`` minus ``margin``.

    Returns {phase: bytes} (plus "limit") for logging, or None when the
    device's HBM size is unknown (CPU/GPU — nothing to preflight).
    """
    if limit is None:
        from keypoints_tpu.data.device import device_hbm_bytes
        limit = device_hbm_bytes()
    if not limit:
        return None
    def _peak(ma):
        # TPU backends report a real buffer-assignment peak; CPU leaves it 0
        return max(ma.peak_memory_in_bytes,
                   ma.argument_size_in_bytes + ma.output_size_in_bytes
                   + ma.temp_size_in_bytes - ma.alias_size_in_bytes)

    # the chunk program: arguments (state + resident store) + temps + outputs
    step_peak = _peak(step_chunk.lower(state, src_args, rng, chunk)
                      .compile().memory_analysis())
    # the eval pass: extract runs while state + store + a full sampled eval
    # batch stay resident (params ARE extract arguments — already counted)
    ex_imgs = jax.ShapeDtypeStruct(eval_image_shape, jnp.float32)
    ex_peak = _peak(extract.lower(state.params, ex_imgs)
                    .compile().memory_analysis())
    if eval_loss_fn is not None:
        # best-checkpoint scoring (train.save_best) runs a full forward —
        # including the VGG trunk for perceptual presets — in the same eval
        # phase; account for it or it is the one unpreflighted program
        ex_peak = max(ex_peak,
                      _peak(eval_loss_fn.lower(state.params, ex_imgs, ex_imgs)
                            .compile().memory_analysis()))
    resident_extra = (_tree_bytes(src_args) + _tree_bytes(state.opt_state)
                      + int(np.prod(eval_image_shape)) * 4)
    eval_peak = ex_peak + resident_extra
    worst = max(step_peak, eval_peak)
    info = {"step_peak": step_peak, "eval_peak": eval_peak,
            "limit": limit, "margin": margin}
    if worst > limit - margin:
        gib = 1 << 30
        raise ValueError(
            f"HBM preflight: this configuration cannot fit the device — "
            f"step program peaks at {step_peak / gib:.2f} GiB, eval phase at "
            f"{eval_peak / gib:.2f} GiB, vs {limit / gib:.2f} GiB HBM "
            f"(-{margin / gib:.2f} GiB margin). Reduce train.batch_size, "
            f"lower data.image_size, or stream the store from host "
            f"(data.loader_workers path) instead of device-resident. "
            f"Refusing before the first step rather than letting the TPU "
            f"worker be killed mid-run.")
    return info


class BestTracker:
    """Best-by-eval-loss checkpoint alongside latest (SURVEY §2.1
    checkpointing: the reference keeps a best/latest run-dir layout).

    Saves the full train state to its own one-slot Orbax manager only when
    ``eval_loss`` improves. ``best.json`` is replaced atomically BEFORE the
    (async) checkpoint write and carries the previous entry, so every
    single-crash interleaving reconciles at restart: whichever step the
    manager actually retained is matched against the current or previous
    entry, and a later, worse value can never evict a strictly better
    checkpoint. The save itself only blocks on the device→host fetch
    (Orbax's async path), not the disk write — no train-loop stall.
    """

    def __init__(self, directory: str):
        import json
        self.dir = directory
        self._mgr = None
        self.best, self.step = float("inf"), None
        meta = os.path.join(directory, "best.json")
        if os.path.exists(meta):
            with open(meta) as f:
                m = json.load(f)
            self._mgr = ckpt.make_manager(directory, max_to_keep=1)
            saved = self._mgr.latest_step()
            for entry in (m, m.get("previous")):
                # json is written just before the async save, so the
                # retained checkpoint is described by the current entry
                # (normal) or the previous one (crash before finalize)
                if entry is not None and entry["step"] == saved:
                    self.best = float(entry["eval_loss"])
                    self.step = int(entry["step"])
                    break

    def update(self, step: int, eval_loss: float, state,
               extra: Optional[dict] = None) -> bool:
        import json
        if not eval_loss < self.best:       # NaN also fails: never "best"
            return False
        prev = ({"step": self.step, "eval_loss": self.best}
                if self.step is not None else None)
        self.best, self.step = eval_loss, step
        if self._mgr is None:               # lazy: only runs that improve pay
            self._mgr = ckpt.make_manager(self.dir, max_to_keep=1)
        # ``extra`` carries the scoring-pair provenance (VERDICT r4 #6):
        # held_out=False marks the legacy seen-batch fallback so a
        # downstream consumer can tell in-sample scores apart WITHOUT
        # parsing stdout warnings.
        meta = {"step": step, "eval_loss": eval_loss, "previous": prev,
                **(extra or {})}
        tmp = os.path.join(self.dir, "best.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(self.dir, "best.json"))
        ckpt.save(self._mgr, step, state._asdict())
        return True

    def finish(self) -> None:
        """Block until any in-flight async save lands (call at loop exit)."""
        if self._mgr is not None:
            self._mgr.wait_until_finished()


def _crash_hint(step: int, last_saved, cfg: Config) -> str:
    """Operator-facing recovery message when the device runtime dies."""
    t = cfg.train
    where = (f"Latest checkpoint is step {last_saved} in "
             f"{t.checkpoint_dir}/{cfg.name} — relaunch the same command "
             f"to resume from it." if last_saved is not None
             else f"No checkpoint has been written yet (first save at step "
                  f"{t.checkpoint_every}) — a relaunch restarts from step 0.")
    return f"device runtime failed near step {step}. {where}"


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


def train(cfg: Config, logdir: str | None = None,
          dry_run: bool = False) -> TrainState:
    """Run the training loop; returns the final TrainState.

    ``dry_run`` stops after setup: config resolved, data source built, and
    (on TPU, fused sources) the HBM preflight printed — a cheap "will this
    run fit and what will it do" check before committing device hours.
    Ctrl-C saves a checkpoint at the interrupted step before re-raising, so
    relaunching the same command resumes the exact trajectory (resume is a
    pure function of (seed, step) — nothing is lost but the partial chunk).
    """
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
        state = replicate(mesh, state)
        put = lambda b: shard_batch(mesh, b)
    else:
        put = lambda b: b

    extract = jax.jit(make_extract_fn(cfg, model))
    # full forward for the recon side-by-side eval grid (reference viz,
    # SURVEY §2.1); 8-row program, compiled only if a logdir is active
    forward = jax.jit(lambda p, s, tgt: model.apply({"params": p}, s, tgt))
    # best-checkpoint scoring: full forward + the training objective on a
    # fixed 8-row pair; built here so preflight_hbm can account for it.
    # A dry run must not touch disk: no tracker/manager dirs are created
    # (eval_loss_fn is still built so the preflight stays representative).
    best = (BestTracker(f"{t.checkpoint_dir}/{cfg.name}_best")
            if t.save_best and not dry_run else None)
    eval_pair, eval_pair_info = None, None
    if t.save_best:
        from keypoints_tpu.losses import l2_loss
        _lf = loss or l2_loss
        eval_loss_fn = jax.jit(
            lambda p, s, t_: _lf(model.apply({"params": p}, s, t_)[0], t_))
    else:
        eval_loss_fn = None
    start = None
    if not dry_run:
        mgr = ckpt.make_manager(f"{t.checkpoint_dir}/{cfg.name}",
                                t.max_to_keep)
        start, restored = ckpt.restore_latest(mgr, state._asdict())
    if start is not None:
        state = TrainState(**restored)
        print(f"resumed from step {start}", flush=True)

    # a dry run must not touch disk: Logger(logdir) would create the event
    # dir + metrics.jsonl, so only a real run gets a writing logger
    log = Logger(logdir if not dry_run else None)
    # the step rng is fold_in(rng, state.step) inside the step and the data
    # stream is indexed by step, so a resumed run is bit-identical to the
    # uninterrupted one (tested in test_train_integration.py).
    rng = jax.random.PRNGKey(t.seed + 2)
    batches = make_batch_iterator(cfg, start_step=int(np.asarray(state.step)))

    # Device-side batch sources (synthetic generators, device-resident
    # stores): fuse sampling INTO the jitted step and scan a CHUNK of steps
    # per dispatch — batches and the step counter never cross a dispatch
    # boundary (each host round-trip through this tunnel costs tens of ms).
    # Chunk = gcd of the log/eval/checkpoint cadences so every host-side
    # action still lands exactly on its step. Under DP the SAME fused loop
    # runs inside shard_map with per-shard in-step sampling
    # (parallel.make_dp_fused_chunk) — DP is not a slower host-dispatch
    # special case.
    fused_src = isinstance(batches, InStepBatches)
    if fused_src:
        import math
        accum = max(1, t.grad_accum)
        smp = batches
        # Cap the steps per dispatch: a single device execution that runs
        # for minutes trips the remote worker's execution deadline and
        # KILLS it (measured on v5e/axon: pose256-b64 at 139 ms/step —
        # 100-step chunks = 14 s dispatches run clean for thousands of
        # steps; one 500-step chunk = ~70 s dispatch crashes the worker on
        # the first dispatch, reproducibly). 100 steps also already fully
        # amortizes the ~tens-of-ms host round-trip. grad_accum multiplies
        # per-step device time by ~accum (each step scans accum
        # micro-batches), so the cap shrinks with it — the deadline is on
        # DISPATCH length, not step count.
        chunk = capped_chunk(math.gcd(math.gcd(t.log_every, t.eval_every),
                                      t.checkpoint_every),
                             cap=max(1, MAX_CHUNK_STEPS // accum))
        if dp:
            step_chunk = make_dp_fused_chunk(cfg, mesh, smp, loss=loss)
            src_args = replicate(mesh, smp.args())
        else:
            base_step = make_train_step(cfg, model, loss=loss)

            def run_chunk(state, args, rng, n):
                def body(st, _):
                    batch = smp.sample_in_step(args, st.step)
                    return base_step(st, batch, rng)
                st, ms = jax.lax.scan(body, state, None, length=n)
                return st, jax.tree_util.tree_map(lambda x: x[-1], ms)

            step_chunk = jax.jit(run_chunk, static_argnums=(3,),
                                 donate_argnums=(0,))
            src_args = smp.args()

        def sample_replicated(key, n):
            """Draw n rows from the fused source, mesh-REPLICATED under DP:
            extract/forward consume it against replicated params, and under
            multi-process DP every host must hold the same global array
            (shard_batch would wrongly treat it as a process-local shard)."""
            kw = {}
            if dp:
                from jax.sharding import NamedSharding, PartitionSpec
                kw["out_shardings"] = NamedSharding(mesh, PartitionSpec())
            return jax.jit(lambda a, k: smp.sample(a, k, n), **kw)(
                src_args, key)

        batch_iter = None
        if jax.default_backend() == "tpu":
            d = cfg.data
            info = preflight_hbm(
                step_chunk, state, src_args, rng, chunk, extract,
                eval_image_shape=(min(8, t.batch_size), d.channels,
                                  d.image_size, d.image_size),
                eval_loss_fn=eval_loss_fn)
            if info:
                gib = 1 << 30
                print(f"HBM preflight: step peak "
                      f"{info['step_peak'] / gib:.2f} GiB, eval phase "
                      f"{info['eval_peak'] / gib:.2f} GiB of "
                      f"{info['limit'] / gib:.2f} GiB", flush=True)
    else:
        chunk = 1
        batch_iter = iter(batches)
        # host-dispatch per-step path (grain streams): one step per dispatch
        step_fn = (make_dp_train_step(cfg, mesh, loss=loss) if dp
                   else jax.jit(make_train_step(cfg, model, loss=loss),
                                donate_argnums=(0,)))

    if dry_run:
        import dataclasses
        import json as _json
        src_kind = type(batches).__name__
        print(f"dry run: preset {cfg.name!r}, {t.steps} steps of batch "
              f"{t.batch_size}, source {src_kind}"
              f"{' (fused in-step sampling)' if fused_src else ''}, "
              f"chunk {chunk} step(s)/dispatch, dp={dp} "
              f"({n_dev} device(s))", flush=True)
        print(_json.dumps(dataclasses.asdict(cfg), default=str, indent=2),
              flush=True)
        log.close()
        return state

    eval_batch = None
    # the step counter is tracked on the HOST: fetching state.step every
    # iteration is a ~28 ms D2H round-trip through this tunnel AND a
    # pipeline barrier (the next step can't be dispatched until the fetch
    # lands) — measured ~90-150 ms/step of pure loop overhead before this.
    step = int(np.asarray(state.step))
    last_t, last_step = time.time(), step
    last_saved = start                      # step of the newest checkpoint

    def advance(state, step):
        if fused_src:
            n = min(chunk, t.steps - step)
            state, metrics = step_chunk(state, src_args, rng, n)
            return state, metrics, step + n
        nonlocal eval_batch
        batch = put(next(batch_iter))
        if eval_batch is None:
            eval_batch = batch
        state, metrics = step_fn(state, batch, rng)
        return state, metrics, step + 1

    def _train_loop():
        nonlocal state, step, last_t, last_step, last_saved
        nonlocal eval_batch, eval_pair, eval_pair_info
        while step < t.steps:
            try:
                state, metrics, step = advance(state, step)
            except jax.errors.JaxRuntimeError as e:
                # the device runtime died mid-run (worker crash/restart —
                # SURVEY §5 failure detection): point at the recovery path
                # instead of a bare backend traceback.
                if "UNAVAILABLE" in str(e) or "crashed" in str(e):
                    raise RuntimeError(_crash_hint(step, last_saved, cfg)) from e
                raise
            _maybe_inject_fault(step)

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
                if fused_src and eval_batch is None:
                    # fused path: sample ONLY the viz rows, once. A full train
                    # batch here would pin e.g. 100 MB (pose256 b128) of HBM for
                    # the whole run that the preflight sized at 8 rows.
                    eval_batch = sample_replicated(smp.step_key(step),
                                                   min(8, t.batch_size))
                imgs = eval_batch if not isinstance(eval_batch, tuple) \
                    else eval_batch[1]
                imgs = imgs[:8]
                kp = extract(state.params, imgs)
                kp_np = np.asarray(kp)
                # discovery-failure detection (VERDICT r4 #4): spread is
                # the measured discriminator for the never-discovers init
                # (quality.json pong64_s0: 0.46 vs 0.88-0.95 healthy) —
                # surface it at every eval, in metrics.jsonl not just here.
                # MUST be eval.keypoint_metrics' spread — the pinned
                # min_spread thresholds were calibrated against it
                from keypoints_tpu.eval import keypoint_metrics
                spread = keypoint_metrics(kp_np)["keypoint_spread"]
                log.scalars(step, keypoint_spread=spread)
                if (t.min_spread and step >= t.spread_check_step
                        and spread < t.min_spread):
                    print(f"step {step:6d} DISCOVERY FAILURE SUSPECTED: "
                          f"keypoint_spread {spread:.3f} < {t.min_spread} "
                          f"past step {t.spread_check_step} — some objects "
                          f"were likely never discovered; rerolling the "
                          f"init seed is the measured fix (BASELINE.md "
                          f"r4 A/B; keypoints-train --reroll-on-plateau N "
                          f"automates it)", flush=True)
                    log.scalars(step, discovery_failure=1.0)
                    if t.abort_on_plateau:
                        raise DiscoveryFailure(step, spread, t.min_spread)
                over = overlay_keypoints(np.asarray(imgs), kp_np)
                log.images(step, "keypoints", image_grid(over))
                if log.active:
                    # recon side-by-side (target | reconstruction), the
                    # reference's second training-viz artifact
                    src = eval_batch[0][:8] if isinstance(eval_batch, tuple) \
                        else imgs
                    recon, _ = forward(state.params, src, imgs)
                    log.images(step, "recon", image_grid(
                        side_by_side(to_hwc(np.asarray(imgs)),
                                     to_hwc(np.asarray(recon)))))
                if best is not None:
                    if eval_pair is None:
                        # a FIXED pair scored with the training objective,
                        # on UNSEEN data in every source mode (VERDICT r3
                        # #6): store-backed sources score the held-out tail
                        # that make_batch_iterator excluded from training;
                        # synthetic sources draw with an INDEPENDENT base
                        # key (a fresh draw IS unseen data — the fused/
                        # stream symmetry). Only a store too small to
                        # reserve a tail (test fixtures) falls back to the
                        # legacy seen-batch draw.
                        eval_pair = heldout_scoring_pair(cfg)
                        if eval_pair is not None:
                            eval_pair_info = {"held_out": True,
                                              "scoring": "store_tail"}
                    if eval_pair is None:
                        # a fused synthetic source draws with an
                        # independent key (unseen); a fused tiny-store
                        # source re-samples TRAINED rows; the stream path
                        # reuses a seen training batch — record which
                        # (VERDICT r4 #6: held_out as a field, not a print)
                        synth_src = (cfg.data.dataset in
                                     ("synthetic_dots", "synthetic_pong")
                                     or not os.path.exists(
                                         store_path_for(cfg.data)))
                        eval_pair_info = (
                            {"held_out": True, "scoring": "synthetic_draw"}
                            if fused_src and synth_src else
                            {"held_out": False,
                             "scoring": ("store_insample" if fused_src
                                         else "seen_batch")})
                        held = (sample_replicated(
                                    jax.random.PRNGKey(t.seed + 101),
                                    min(8, t.batch_size))
                                if fused_src else eval_batch)
                        if isinstance(held, tuple):
                            eval_pair = (held[0][:8], held[1][:8])
                        elif cfg.data.pair_mode == "warp":
                            from keypoints_tpu.data.augment import make_pair
                            from keypoints_tpu.training import warp_config
                            eval_pair = jax.jit(
                                lambda k, f: make_pair(k, f, warp_config(cfg)))(
                                jax.random.PRNGKey(t.seed + 9), held[:8])
                        else:
                            eval_pair = (held[:8], held[:8])
                    el = float(np.asarray(
                        eval_loss_fn(state.params, *eval_pair)))
                    log.scalars(step, eval_loss=el)
                    if best.update(step, el, state,
                                   extra={**eval_pair_info,
                                          "rows": int(eval_pair[0].shape[0])}):
                        print(f"step {step:6d} new best eval_loss {el:.5f} "
                              f"-> {best.dir}", flush=True)

            if step % t.checkpoint_every == 0:
                ckpt.save(mgr, step, state._asdict())
                last_saved = step


    try:
        _train_loop()
    except KeyboardInterrupt:
        # clean interrupt: save at the interrupted step so relaunching the
        # same command resumes the exact trajectory (the step counter and
        # data stream are pure functions of (seed, step)); only the chunk
        # that was in flight is redone. Two hazards guard the save:
        # - an interrupt landing INSIDE a dispatched step leaves `state`
        #   naming the DONATED input (buffers deleted at dispatch) — saving
        #   it would raise and mask the interrupt, so skip (the last
        #   checkpoint stands and `step` has not advanced past it anyway);
        # - an interrupt between ckpt.save and the `last_saved` rebind
        #   leaves last_saved stale — re-saving a step orbax already
        #   registered raises StepAlreadyExists, so also check the manager.
        saveable = _state_saveable(state)
        newest = max(last_saved or 0, mgr.latest_step() or 0)
        if saveable and step > newest:
            ckpt.save(mgr, step, state._asdict())
            print(f"\ninterrupted at step {step}: checkpoint saved to "
                  f"{t.checkpoint_dir}/{cfg.name}; rerun the same command "
                  f"to resume", flush=True)
        raise
    finally:
        # one shutdown path for normal exit, Ctrl-C, and crashes: flush
        # pending orbax saves, settle the best-checkpoint dir, close logs
        mgr.wait_until_finished()
        if best is not None:
            best.finish()
        log.close()
    return state


def _supervise(child_argv: list[str], max_restarts: int) -> int:
    """Supervised training: run the trainer in a subprocess and relaunch it
    on a crash (non-zero exit), resuming from the latest checkpoint — the
    automatic restart-from-checkpoint recovery model (SURVEY §5 failure
    detection). Covers device-runtime deaths the in-process loop cannot
    survive (a crashed/restarted remote TPU worker poisons the whole jax
    backend in that process; only a fresh process re-tunnels cleanly).

    Returns the final exit code (0 on success). A KeyboardInterrupt is
    forwarded to the child so it writes its interrupt checkpoint, and is
    NOT treated as a crash."""
    import signal
    import subprocess

    cmd = [sys.executable, "-m", "keypoints_tpu.train", *child_argv]
    restarts = 0
    while True:
        # new session: a terminal Ctrl-C hits ONLY the supervisor (a child
        # in the same process group would get the TTY's SIGINT too, and the
        # forwarded signal below would then land as a SECOND interrupt
        # inside its handler, aborting the interrupt-checkpoint save)
        proc = subprocess.Popen(cmd, start_new_session=True)
        try:
            code = proc.wait()
        except KeyboardInterrupt:
            proc.send_signal(signal.SIGINT)
            return proc.wait()
        if code == 0:
            return 0
        if code == EXIT_DISCOVERY_FAILURE:
            # a reroll signal, not a crash: the child already quarantined
            # its checkpoints, so "resume from latest" would deterministically
            # re-train the same seed to the same plateau — pass it through
            # (the inverse of _reroll_supervise's "a crash is a crash" rule)
            print("supervisor: discovery failure (not a crash) — not "
                  "restarting; use --reroll-on-plateau to retry with a new "
                  "seed", flush=True)
            return code
        if restarts >= max_restarts:
            print(f"supervisor: giving up after {restarts} restart(s) "
                  f"(exit code {code})", flush=True)
            return code
        restarts += 1
        print(f"supervisor: trainer exited with code {code}; restart "
              f"{restarts}/{max_restarts} resumes from the latest "
              f"checkpoint", flush=True)


def _reroll_supervise(child_argv: list[str], max_rerolls: int,
                      base_offset: int = 0) -> int:
    """Automated init-reroll (VERDICT r4 #4): run the trainer in a child
    with discovery-failure ABORT enabled; when it exits with
    EXIT_DISCOVERY_FAILURE, relaunch with the NEXT seed (--seed-offset),
    up to ``max_rerolls`` times. Any other exit code (success or crash)
    passes through — a crash is a crash, not a lottery reroll. The child
    quarantines its failed attempt's checkpoint dirs before exiting, so a
    retry starts fresh instead of resuming the plateaued params.

    ``base_offset`` is the user's own --seed-offset (stripped from
    ``child_argv`` by the caller): attempts run at base, base+1, ... so a
    rerun can continue the lottery past seeds already known to fail."""
    import signal
    import subprocess

    for attempt in range(max_rerolls + 1):
        cmd = [sys.executable, "-m", "keypoints_tpu.train", *child_argv,
               "--abort-on-plateau",
               "--seed-offset", str(base_offset + attempt)]
        proc = subprocess.Popen(cmd, start_new_session=True)
        try:
            code = proc.wait()
        except KeyboardInterrupt:
            proc.send_signal(signal.SIGINT)
            return proc.wait()
        if code != EXIT_DISCOVERY_FAILURE:
            return code
        if attempt < max_rerolls:
            print(f"reroll supervisor: discovery failure — retrying with "
                  f"seed offset {base_offset + attempt + 1} "
                  f"({attempt + 1}/{max_rerolls})", flush=True)
    print(f"reroll supervisor: still failing after {max_rerolls} "
          f"reroll(s)", flush=True)
    return EXIT_DISCOVERY_FAILURE


def _strip_flag(argv: list[str], flag: str) -> list[str]:
    """Remove ``flag value`` / ``flag=value`` pairs from an argv list."""
    out, skip = [], False
    for a in argv:
        if skip:
            skip = False
        elif a == flag:
            skip = True
        elif not a.startswith(flag + "="):
            out.append(a)
    return out


#: env hook for fault-injection tests: ``"STEP:MARKER_PATH"`` raises a
#: synthetic RuntimeError the first time the loop passes STEP, creating
#: MARKER_PATH so the fault fires exactly once (SURVEY §5 fault injection)
FAULT_ENV = "KEYPOINTS_TPU_FAULT"


def _maybe_inject_fault(step: int) -> None:
    spec = os.environ.get(FAULT_ENV)
    if not spec:
        return
    at, _, marker = spec.partition(":")
    if marker and step >= int(at) and not os.path.exists(marker):
        open(marker, "w").close()
        raise RuntimeError(
            f"injected fault at step {step} ({FAULT_ENV}={spec})")


def main(argv=None):
    from keypoints_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()   # relaunch/resume skips the 20-182 s TPU compile
    # allow_abbrev=False: an abbreviated `--super 2` would parse as
    # --supervise but survive _strip_flag in the child argv — every child
    # would become another supervisor (an unbounded process chain)
    p = argparse.ArgumentParser(description="keypoints_tpu trainer",
                                allow_abbrev=False)
    p.add_argument("--preset", default="pong64")
    p.add_argument("--override", nargs="*", default=[],
                   help="dotted overrides, e.g. train.lr=3e-4")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--logdir", default=None)
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="write a jax.profiler trace for the first 20 steps")
    p.add_argument("--dry-run", action="store_true",
                   help="resolve the config, build the data source, run the "
                        "HBM preflight (TPU), print, and exit — no training")
    p.add_argument("--supervise", type=int, default=None, metavar="N",
                   help="run the trainer in a supervised subprocess; on a "
                        "crash, relaunch up to N times, each resuming from "
                        "the latest checkpoint")
    p.add_argument("--reroll-on-plateau", type=int, default=None,
                   metavar="N",
                   help="run the trainer in a subprocess with discovery-"
                        "failure abort enabled (train.min_spread must be "
                        "set — pong64 pins it); on a detected failure, "
                        "retry with the next seed up to N times (the "
                        "measured fix for the ~1-in-3 pong64 "
                        "never-discovers init, BASELINE.md r4/r5)")
    p.add_argument("--abort-on-plateau", action="store_true",
                   help="exit with the reroll code when discovery failure "
                        "is detected (sets train.abort_on_plateau; the "
                        "--reroll-on-plateau supervisor passes this)")
    p.add_argument("--seed-offset", type=int, default=0,
                   help="add this to train.seed after overrides (reroll "
                        "attempts use 1, 2, ...)")
    p.add_argument("--platform", default=os.environ.get(
                        "KEYPOINTS_TPU_PLATFORM"),
                   choices=["cpu", "tpu"],
                   help="force the jax platform (the axon TPU plugin ignores "
                        "JAX_PLATFORMS; this sets jax.config after import). "
                        "Also honored from $KEYPOINTS_TPU_PLATFORM")
    args = p.parse_args(argv)
    if args.dry_run and args.profile:
        p.error("--dry-run and --profile are mutually exclusive "
                "(a dry run never dispatches the steps a trace would record)")
    if args.supervise is not None:
        if args.dry_run or args.profile or args.reroll_on_plateau is not None:
            p.error("--supervise cannot be combined with "
                    "--dry-run/--profile/--reroll-on-plateau")
        raw = list(argv) if argv is not None else list(sys.argv[1:])
        raise SystemExit(_supervise(_strip_flag(raw, "--supervise"),
                                    args.supervise))
    if args.reroll_on_plateau is not None:
        if args.dry_run or args.profile:
            p.error("--reroll-on-plateau cannot be combined with "
                    "--dry-run/--profile")
        raw = list(argv) if argv is not None else list(sys.argv[1:])
        raise SystemExit(_reroll_supervise(
            _strip_flag(_strip_flag(raw, "--reroll-on-plateau"),
                        "--seed-offset"),
            args.reroll_on_plateau, base_offset=args.seed_offset))
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    # Multi-host bootstrap (SURVEY §2.4): must run before any device access
    # so jax.distributed can wire DCN process coordination on pods. A no-op
    # in single-process runs (VERDICT r3 #3 — no custom launcher needed).
    from keypoints_tpu.parallel import multihost
    multihost.initialize()

    from keypoints_tpu.configs import apply_overrides
    cfg = apply_overrides(get_config(args.preset), args.override)
    if args.steps is not None:
        cfg = cfg.override(**{"train.steps": args.steps})
    if args.seed_offset:
        cfg = cfg.override(**{"train.seed": cfg.train.seed + args.seed_offset})
    if args.abort_on_plateau:
        if not cfg.train.min_spread:
            p.error("--abort-on-plateau needs train.min_spread (preset-"
                    "pinned on pong64; pass --override train.min_spread=X "
                    "elsewhere — thresholds do NOT transfer across presets)")
        cfg = cfg.override(**{"train.abort_on_plateau": True})
    if args.dry_run:
        train(cfg, args.logdir, dry_run=True)
    elif args.profile:
        from keypoints_tpu.utils.profiling import trace
        if (cfg.data.image_size >= 256 or
                cfg.train.batch_size * cfg.data.image_size ** 2 >= 128 * 128 ** 2):
            # the profiler's trace buffers add device-memory overhead on top
            # of the program's peak; tracing a near-HBM-limit program has
            # crashed a remote TPU worker outright (2026-08-18 incident).
            # Profile a smaller batch and scale the op table instead.
            print("warning: profiling a large program adds device-memory "
                  "overhead and can destabilize the worker — prefer a "
                  "smaller train.batch_size for the trace", flush=True)
        with trace(args.profile):
            train(cfg.override(**{"train.steps": min(cfg.train.steps, 20)}),
                  args.logdir)
    else:
        try:
            train(cfg, args.logdir)
        except DiscoveryFailure as e:
            # quarantine this attempt's checkpoints (non-destructively) so
            # the next seed starts FRESH instead of resuming the plateaued
            # params, then signal the reroll supervisor
            for d in (f"{cfg.train.checkpoint_dir}/{cfg.name}",
                      f"{cfg.train.checkpoint_dir}/{cfg.name}_best"):
                if os.path.isdir(d):
                    dst, i = f"{d}_failed_seed{cfg.train.seed}", 1
                    while os.path.exists(dst):
                        dst = f"{d}_failed_seed{cfg.train.seed}.{i}"
                        i += 1
                    os.rename(d, dst)
            print(f"aborting: {e}", flush=True)
            raise SystemExit(EXIT_DISCOVERY_FAILURE)


if __name__ == "__main__":
    main()
