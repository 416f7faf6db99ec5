"""Profiling and timing utilities (SURVEY.md §5 "Tracing/profiling").

* :func:`trace` — context manager around ``jax.profiler.trace`` writing a
  tensorboard-profile trace (view with ``tensorboard --logdir``).
* :func:`timed` — wall-clock timing that REALLY synchronizes. On this
  environment's remote-TPU tunnel ``block_until_ready`` returns eagerly, so
  the only reliable fence is a device-to-host fetch of (a slice of) the
  result — that's what this does.
* :class:`StepTimer` — rolling frames/sec for training loops.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def fetch_sync(x) -> None:
    """Force real device completion: D2H-fetch a tiny slice of each leaf."""
    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(jax.numpy.ravel(leaf)[:1])


def timed(fn, *args, reps: int = 5, **kwargs) -> tuple[float, object]:
    """→ (best seconds, last output); warmup call + ``reps`` timed calls."""
    out = fn(*args, **kwargs)
    fetch_sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        fetch_sync(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


class StepTimer:
    """Rolling throughput: call :meth:`mark` every logged step."""

    def __init__(self, batch_size: int):
        self.batch = batch_size
        self._t = time.perf_counter()
        self._step = 0

    def mark(self, step: int) -> float:
        now = time.perf_counter()
        fps = (step - self._step) * self.batch / max(now - self._t, 1e-9)
        self._t, self._step = now, step
        return fps
