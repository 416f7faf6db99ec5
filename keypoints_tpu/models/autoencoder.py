"""Jakab-2018 keypoint autoencoder: the geometry-bottleneck composite model.

Assembly (SURVEY.md §2.1 / §3.1, provenance [PAPER][B:5]):

    fmap    = Φ(x_source)                      # appearance stream
    hm      = Ψ(x_target)                      # geometry stream
    kp      = spatial_softmax(hm)              # K (x, y) in [-1, 1]
    G       = gaussian_maps(kp, σ)             # re-rendered bottleneck
    x̂_tgt  = decoder(concat(fmap, G))         # reconstruct the *target*

Geometry can only flow through the K-keypoint bottleneck, forcing Ψ to
discover landmarks. Public call convention is NCHW images in [0, 1] to match
the reference API ([B:5] "same model constructors, same coordinate
conventions"); internals run NHWC (see models/nets.py).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from keypoints_tpu.coords import DEFAULT_ALIGN_CORNERS
from keypoints_tpu.models.nets import Decoder, Encoder, KeyNet
# kernels.* dispatch to the fused Pallas kernels on TPU (joint softmax,
# Gaussian raster) and to the pure-jnp oracles elsewhere.
from keypoints_tpu.kernels import (extract_and_render,
                                   spatial_softmax)


class KeypointAutoencoder(nn.Module):
    num_keypoints: int
    out_channels: int = 3
    sigma: float = 0.1
    temperature: float = 1.0
    softmax_variant: str = "marginal"
    align_corners: bool = DEFAULT_ALIGN_CORNERS
    encoder_filters: Sequence[int] = (32, 32, 64, 64, 128)
    encoder_strides: Sequence[int] = (1, 2, 1, 2, 1)
    decoder_filters: Sequence[int] = (128, 64, 32)
    decoder_upsample: Sequence[bool] = (True, True, False)
    groups: int = 8
    dtype: Any = None

    def setup(self):
        self.encoder = Encoder(self.encoder_filters, self.encoder_strides,
                               self.groups, dtype=self.dtype)
        self.keynet = KeyNet(self.num_keypoints, self.encoder_filters,
                             self.encoder_strides, self.groups,
                             dtype=self.dtype)
        self.decoder = Decoder(self.out_channels, self.decoder_filters,
                               self.decoder_upsample, self.groups,
                               dtype=self.dtype)

    def extract_keypoints(self, x: jnp.ndarray) -> jnp.ndarray:
        """NCHW images → (B, K, 2) keypoints. The inference benchmark path [B:2]."""
        hm = self.keynet(x.transpose(0, 2, 3, 1))          # (B, h, w, K)
        hm = hm.transpose(0, 3, 1, 2)                      # (B, K, h, w)
        kp = spatial_softmax(hm.astype(jnp.float32), self.temperature,
                             self.softmax_variant, self.align_corners)
        return kp

    def __call__(self, x_source: jnp.ndarray, x_target: jnp.ndarray):
        """(NCHW src, NCHW tgt) → (reconstruction NCHW, keypoints (B, K, 2))."""
        fmap = self.encoder(x_source.transpose(0, 2, 3, 1))  # (B, h, w, F)
        hm = self.keynet(x_target.transpose(0, 2, 3, 1)).transpose(0, 3, 1, 2)
        h, w = fmap.shape[1:3]
        # extract → re-render in one fused kernel on TPU (joint variant)
        kp, gmaps = extract_and_render(hm.astype(jnp.float32), h, w,
                                       self.temperature, self.sigma,
                                       self.softmax_variant,
                                       self.align_corners)
        gmaps = gmaps.transpose(0, 2, 3, 1).astype(fmap.dtype)  # (B, h, w, K)
        recon = self.decoder(jnp.concatenate([fmap, gmaps], axis=-1))
        return recon.transpose(0, 3, 1, 2).astype(jnp.float32), kp
