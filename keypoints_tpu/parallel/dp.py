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
    """Shard the leading (batch) axis of a pytree over the data axis."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.device_put(batch, sharding)


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
