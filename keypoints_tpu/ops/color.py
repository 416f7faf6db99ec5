"""Color jitter — brightness / contrast / saturation, pure jnp, per-example keyed.

TPU-native analog of the torchvision ColorJitter the reference applies on the
host (SURVEY.md §2.1 "Affine warp + color jitter", provenance [B:5]): factors
are drawn from ``jax.random`` per example and the whole transform runs inside
the jitted device-side augmentation step. Semantics follow torchvision:

* brightness: ``img * f``,             f ~ U[max(0, 1-b), 1+b]
* contrast:   ``mean + (img - mean) * f`` with mean = grayscale mean, f ~ U[...]
* saturation: ``gray + (img - gray) * f`` per pixel, f ~ U[...]

Images are NCHW float in [0, 1]; output is clipped back to [0, 1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ITU-R 601 luma weights — what torchvision's rgb_to_grayscale uses.
# Plain tuple, NOT a jnp array: a module-level device array would initialize
# the XLA backend at import time, which breaks jax.distributed.initialize
# (it must run before any backend access) for anyone importing this package
# first on a multi-host deployment.
_LUMA = (0.299, 0.587, 0.114)


def _factor(key, strength: float, batch: int, dtype) -> jnp.ndarray:
    lo = jnp.maximum(0.0, 1.0 - strength)
    hi = 1.0 + strength
    return jax.random.uniform(key, (batch, 1, 1, 1), dtype, lo, hi)


def _grayscale(image: jnp.ndarray) -> jnp.ndarray:
    if image.shape[1] == 3:
        luma = jnp.asarray(_LUMA, dtype=image.dtype)
        return jnp.einsum("bchw,c->bhw", image, luma)[:, None]
    return image.mean(axis=1, keepdims=True)


def color_jitter(key: jax.Array, image: jnp.ndarray,
                 brightness: float = 0.0, contrast: float = 0.0,
                 saturation: float = 0.0) -> jnp.ndarray:
    """Apply brightness/contrast/saturation jitter with per-example factors."""
    b = image.shape[0]
    kb, kc, ks = jax.random.split(key, 3)
    out = image
    if brightness > 0:
        out = out * _factor(kb, brightness, b, image.dtype)
    if contrast > 0:
        mean = _grayscale(out).mean(axis=(2, 3), keepdims=True)
        out = mean + (out - mean) * _factor(kc, contrast, b, image.dtype)
    if saturation > 0 and image.shape[1] == 3:
        gray = _grayscale(out)
        out = gray + (out - gray) * _factor(ks, saturation, b, image.dtype)
    return jnp.clip(out, 0.0, 1.0)
