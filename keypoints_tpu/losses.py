"""Reconstruction losses: pixel L2 and VGG perceptual.

SURVEY.md §2.1 "Perceptual (VGG) loss" [PAPER][B:5][B:10]. The perceptual loss
closes over frozen VGG features (built in ``models/vgg.py``); both losses are
pure functions usable inside the jitted train step.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp


def l2_loss(recon: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error over all pixels (matches torch MSELoss 'mean')."""
    return jnp.mean((recon - target) ** 2)


def make_perceptual_loss(vgg_apply: Callable[[jnp.ndarray], dict],
                         layers: tuple[str, ...]) -> Callable:
    """Σ_l mean‖VGG_l(recon) − VGG_l(target)‖² over the selected layers.

    ``vgg_apply`` maps NCHW [0,1] images to a {layer_name: feature} dict with
    frozen parameters already bound (see models/vgg.py:make_feature_fn).
    """
    def loss(recon: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        fr = vgg_apply(recon)
        ft = vgg_apply(target)
        total = 0.0
        for name in layers:
            total = total + jnp.mean((fr[name] - ft[name]) ** 2)
        return total
    return loss
