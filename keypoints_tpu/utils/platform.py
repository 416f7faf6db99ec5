"""Platform forcing for the CLIs.

The axon TPU plugin IGNORES ``JAX_PLATFORMS`` — the only way to force CPU
is ``jax.config.update("jax_platforms", ...)`` after importing jax (the
same trick tests/conftest.py uses). ``keypoints-train`` has always honored
``--platform`` / ``$KEYPOINTS_TPU_PLATFORM``; the other CLIs route through
this helper so e.g. ``KEYPOINTS_TPU_PLATFORM=cpu keypoints-eval ...`` works
everywhere (found r5: the eval CLI was impossible to run CPU-side while the
TPU was occupied by a measurement campaign).
"""

from __future__ import annotations

import os

import jax

ENV = "KEYPOINTS_TPU_PLATFORM"


def apply_platform(platform: str | None = None) -> None:
    """Force the jax platform from an explicit arg or $KEYPOINTS_TPU_PLATFORM.

    Call before any device access. No-op when neither is set.
    """
    p = platform or os.environ.get(ENV)
    if p:
        if p not in ("cpu", "tpu"):
            raise SystemExit(f"{ENV}/--platform must be cpu or tpu, got {p!r}")
        jax.config.update("jax_platforms", p)
