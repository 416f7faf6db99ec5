"""Numerical guards (SURVEY.md §5 "Race detection/sanitizers" analog).

JAX programs are functional so data races don't exist; the failure modes that
matter here are NaN/Inf blowups and silent shape drift. This module provides:

* :func:`guard_metrics` — wrap a train step so non-finite loss/grad-norm
  raises on the host at the next fetch (cheap: piggybacks on metrics already
  being logged; no extra device sync).
* :func:`assert_finite` — chex-based tree check for tests/eval.
* :func:`checkify_step` — optional ``jax.experimental.checkify`` wrapping for
  debugging runs: out-of-bounds and NaN checks *inside* jit.
"""

from __future__ import annotations

from typing import Callable

import chex
import jax
import jax.numpy as jnp
import numpy as np


def assert_finite(tree, name: str = "tree") -> None:
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            where = "/".join(str(getattr(p, "key", p)) for p in path)
            raise FloatingPointError(
                f"non-finite values in {name}:{where} "
                f"(nan={np.isnan(arr).sum()}, inf={np.isinf(arr).sum()})")


def guard_metrics(step_fn: Callable) -> Callable:
    """Wrap (state, batch, rng) → (state, metrics) to raise on bad metrics.

    The check runs on the host against the fetched metric scalars the loop
    logs anyway, so it adds no device work.
    """
    def wrapped(state, batch, rng):
        state, metrics = step_fn(state, batch, rng)
        return state, metrics

    def check(metrics: dict) -> None:
        for k, v in metrics.items():
            v = np.asarray(v)
            if v.ndim == 0 and not np.isfinite(v):
                raise FloatingPointError(f"metric {k!r} is {v} — training "
                                         "diverged (see utils/debug.py)")
    wrapped.check = check
    return wrapped


def checkify_step(step_fn: Callable):
    """→ (checked_fn, consume) with NaN + OOB checks compiled into the step.

    ``checked_fn`` has the same signature; call ``consume(err)`` on the
    returned error to raise. Debug-run-only: adds device overhead. Also
    traces the warp y-window contract assert into any augmentation inside
    the step (``data.augment.window_checks`` — a violated window raises
    here instead of silently zero-filling in the Pallas kernel).
    """
    from jax.experimental import checkify

    from keypoints_tpu.data.augment import window_checks

    checked = checkify.checkify(
        step_fn, errors=checkify.float_checks | checkify.index_checks
        | checkify.user_checks)

    def run(state, batch, rng):
        with window_checks():     # flag matters at trace time; cheap after
            err, out = checked(state, batch, rng)
        return err, out

    def consume(err) -> None:
        err.throw()

    return run, consume


def assert_batch(images: jnp.ndarray, channels: int, size: int) -> None:
    """Shape/dtype/range guard for incoming image batches."""
    chex.assert_rank(images, 4)
    chex.assert_axis_dimension(images, 1, channels)
    chex.assert_axis_dimension(images, 2, size)
    chex.assert_axis_dimension(images, 3, size)
    chex.assert_type(images, jnp.floating)
