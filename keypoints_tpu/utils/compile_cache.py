"""Persistent XLA compilation cache (SURVEY.md §5 "failure detection /
restart": restart-from-checkpoint is the recovery model, so restart cost is
part of the serving story).

TPU compiles of the fused train step are expensive — measured 182 s cold for
a single conv graph through this environment's remote-compile tunnel, and
20–40 s on a directly-attached chip — while a persistent-cache hit restores
the executable in under a second (236× measured here). JAX ships the cache
but leaves it off; the CLI entry points (train/eval/bench) turn it on via
:func:`enable_compile_cache`.

Library users who embed keypoints_tpu keep full control: nothing here runs
at import time, and an explicit ``JAX_COMPILATION_CACHE_DIR`` env var (the
standard JAX knob) takes precedence over the default location.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = "~/.cache/keypoints_tpu/jax"


def enable_compile_cache(cache_dir: str | None = None) -> str:
    """Turn on JAX's persistent compilation cache; returns the directory.

    Precedence: explicit ``cache_dir`` arg > ``JAX_COMPILATION_CACHE_DIR``
    env (in which case JAX already picked it up and this is a no-op) >
    ``~/.cache/keypoints_tpu/jax``. Safe to call more than once.
    """
    import jax

    env = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    path = os.path.expanduser(cache_dir or env or _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # default gate is 1 MB / long-compile-only; the small fused steps here
    # are exactly the ones worth caching
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
