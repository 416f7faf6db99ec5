"""Data parallelism: shard_map over a 1-D ICI mesh with gradient pmean.

SURVEY.md §2.3/§2.4 — the one parallelism strategy this model family needs
(no attention → TP/PP/SP/EP are structurally N/A; resolution scaling happens
inside the Pallas kernels). Batch is sharded over the ``data`` axis, params
are replicated, and the only collective is the gradient/loss ``pmean``, which
XLA lowers to an ICI all-reduce. The same code runs on 8 virtual CPU devices
in tests [§4.4] and on a real slice unmodified.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from keypoints_tpu.configs import Config
from keypoints_tpu.training import build_model, make_train_step

DATA_AXIS = "data"


def data_parallel_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (DATA_AXIS,))


def replicate(mesh: Mesh, tree):
    """Place a pytree fully-replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(mesh: Mesh, batch):
    """Shard the leading (batch) axis of a pytree over the data axis.

    Single-process: ``batch`` is the GLOBAL batch and ``device_put`` splits
    it across local devices. Multi-process: each host passes only its LOCAL
    shard — exactly what the per-host grain stream yields
    (``train.make_batch_iterator`` reads ``batch/n_hosts`` per process) —
    and the global array is assembled from the process-local slabs.
    ``data_parallel_mesh`` orders devices process-major (``jax.devices()``),
    so host i's rows land on host i's chips with no cross-host transfer.
    Treating the local slab as the global value here would silently train
    on ``batch/n_hosts`` frames per step (or fail to shard outright).
    """
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)

    def leaf(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x,
                                                      global_shape)
    return jax.tree_util.tree_map(leaf, batch)


def shard_rng(rng: jax.Array) -> jax.Array:
    """Per-shard rng inside ``shard_map``: fold in the data-axis index so
    warp-mode augmentation draws independent warps on every device (a
    correlated-shard bug would silently train on 1/N the warp diversity —
    tested directly in tests/test_parallel.py)."""
    return jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))


def make_dp_train_step(cfg: Config, mesh: Mesh, tx=None,
                       loss: Optional[Callable] = None) -> Callable:
    """Jitted DP train step over ``mesh``: (state, batch, rng) → (state, metrics).

    Per-shard RNG is decorrelated by folding in the data-axis index, so
    warp-mode augmentation draws independent warps on every device.
    """
    model = build_model(cfg)
    inner = make_train_step(cfg, model, tx, loss, axis_name=DATA_AXIS)

    def sharded(state, batch, rng):
        return inner(state, batch, shard_rng(rng))

    shard_fn = jax.shard_map(
        sharded, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(shard_fn, donate_argnums=(0,))


def make_dp_extract(cfg: Config, params, batches: Sequence[int],
                    mesh: Optional[Mesh] = None,
                    input_dtype: str = "float32"):
    """Data-parallel serving: → a ``BucketedExtract`` running on a mesh.

    The extract path (Ψ → soft-argmax; SURVEY §3.3) is embarrassingly
    row-parallel, so scaling it over a slice is pure DP: params replicated
    once, the request batch split over the ``data`` axis, zero collectives
    in the program. Each device runs the whole extractor on its local
    ``b/n_dev`` rows via ``shard_map`` — the Pallas kernels see local
    shapes, so no GSPMD partitioning of opaque custom calls is needed.

    Bucket sizes must be divisible by the mesh size (each device gets a
    static local shape — the TPU fast path). The returned object plugs into
    ``serve.BatchingExtractor`` / the HTTP CLI exactly like an AOT bundle;
    requests pad up to the smallest covering bucket and oversized requests
    split into max-bucket chunks (rows independent ⇒ exact).
    """
    from keypoints_tpu.export import BucketedExtract
    from keypoints_tpu.training import make_extract_fn

    mesh = mesh if mesh is not None else data_parallel_mesh()
    n_dev = mesh.devices.size
    sizes = sorted({int(b) for b in batches})
    if not sizes or sizes[0] < 1:
        raise ValueError(f"invalid bucket list {batches!r}")
    bad = [b for b in sizes if b % n_dev]
    if bad:
        raise ValueError(
            f"bucket sizes {bad} not divisible by the {n_dev}-device mesh "
            f"(each device needs a static local batch)")

    if input_dtype not in ("float32", "uint8"):
        raise ValueError(f"input_dtype must be float32|uint8, "
                         f"got {input_dtype!r}")
    model = build_model(cfg)
    base_extract = make_extract_fn(cfg, model)
    if input_dtype == "uint8":
        # raw 0-255 frames in, /255 on device: the live-serving twin of
        # export's uint8 artifacts — 4x smaller H2D uploads per request
        def extract(params, images):
            return base_extract(params,
                                images.astype(jnp.float32) / 255.0)
    else:
        extract = base_extract
    sharded = jax.jit(jax.shard_map(
        extract, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    ))
    params_r = replicate(mesh, params)
    batch_sharding = NamedSharding(mesh, P(DATA_AXIS))

    def fn(images):
        # one H2D placement splits the (already bucket-padded) batch over
        # the data axis; jit specializes per bucket shape, compiled once
        return sharded(params_r, jax.device_put(images, batch_sharding))

    d = cfg.data
    meta = {"format": "keypoints-extract-bundle", "version": 1,
            "batches": sizes, "image_size": d.image_size,
            "channels": d.channels,
            "num_keypoints": cfg.model.num_keypoints,
            "input_dtype": input_dtype,
            "data_parallel_devices": n_dev}
    return BucketedExtract({b: fn for b in sizes}, meta)


def make_dp_fused_chunk(cfg: Config, mesh: Mesh, sampler,
                        loss: Optional[Callable] = None,
                        tx=None) -> Callable:
    """The fused chunked train loop, DP edition (VERDICT r2 missing #2).

    → fn(state, args, rng, n): runs ``n`` train steps in ONE dispatch — a
    ``lax.scan`` *inside* ``shard_map``, with each device drawing its own
    ``batch/n_dev`` sub-batch from ``sampler`` per step (per-shard key =
    fold_in(step key, axis index)), so neither batches nor the step counter
    ever cross a dispatch or host boundary. This is the exact DP analog of
    ``train.py``'s single-device chunk: without it, DP paid per-step host
    dispatch + ``shard_batch`` H2D — ~21 ms/step through the axon tunnel.

    ``sampler`` is a ``train.InStepBatches``; ``args`` its device arrays,
    placed REPLICATED on the mesh (each chip holds the store in its own HBM
    and gathers locally — no cross-chip traffic in the input path; the only
    collective in the step remains the gradient pmean over ICI).

    The returned fn caches one jitted program per distinct ``n`` (the loop
    uses a fixed chunk plus at most one tail size).
    """
    import functools

    model = build_model(cfg)
    inner = make_train_step(cfg, model, tx, loss, axis_name=DATA_AXIS)
    n_dev = mesh.devices.size
    b = cfg.train.batch_size
    if b % n_dev:
        raise ValueError(f"batch {b} not divisible by {n_dev} devices")
    shard_b = b // n_dev

    def chunk_body(state, args, rng, nsteps):
        rng = shard_rng(rng)     # decorrelate warp-mode aug across shards,
                                 # exactly like make_dp_train_step's per-step
                                 # path (inner folds in state.step itself)
        def body(st, _):
            key = shard_rng(sampler.step_key(st.step))
            batch = sampler.sample(args, key, shard_b)
            return inner(st, batch, rng)
        st, ms = jax.lax.scan(body, state, None, length=nsteps)
        return st, jax.tree_util.tree_map(lambda x: x[-1], ms)

    @functools.lru_cache(maxsize=None)
    def compiled(nsteps: int):
        fn = jax.shard_map(
            lambda state, args, rng: chunk_body(state, args, rng, nsteps),
            mesh=mesh,
            in_specs=(P(), P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return jax.jit(fn, donate_argnums=(0,))

    def run(state, args, rng, n):
        return compiled(int(n))(state, args, rng)

    # expose AOT lowering so train()'s HBM preflight can ask XLA's buffer
    # assignment for the chunk program's true peak before the first step
    run.lower = lambda state, args, rng, n: compiled(int(n)).lower(
        state, args, rng)
    return run
