"""Kulkarni-2019 Transporter: feature transport between trajectory frames.

Transport equation (SURVEY.md §2.1 "Transporter module", provenance
[PAPER][B:9]), for a source frame x_s and target frame x_t from the same
trajectory:

    Φ_s, Φ_t = Φ(x_s), Φ(x_t)              # feature maps
    G_s, G_t = raster(softargmax(Ψ(x_s))), raster(softargmax(Ψ(x_t)))
    Φ̂ = (1 − G_s)·(1 − G_t)·sg[Φ_s] + G_t·Φ_t
    x̂_t = decoder(Φ̂),   loss = ‖x̂_t − x_t‖²

with stop-gradients on the source-frame feature map *and* source-frame
heatmaps (sg[·] = ``jax.lax.stop_gradient``) so gradients flow only through
the target branch — the published training recipe. G maps are reduced over
keypoints with max (the heatmask is 1 where *any* keypoint attends).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from keypoints_tpu.coords import DEFAULT_ALIGN_CORNERS
from keypoints_tpu.models.nets import Decoder, Encoder, KeyNet
# kernels.* dispatch to the fused Pallas kernels on TPU (joint softmax,
# Gaussian raster) and to the pure-jnp oracles elsewhere.
from keypoints_tpu.kernels import (extract_and_render,
                                   spatial_softmax)


class Transporter(nn.Module):
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

    def _heat(self, x_nhwc: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """NHWC image → (keypoints (B,K,2), attention map (B,h,w,1) in [0,1])."""
        hm = self.keynet(x_nhwc).transpose(0, 3, 1, 2)     # (B, K, h, w)
        h, w = hm.shape[2:]
        # extract → re-render in one fused kernel on TPU (joint variant)
        kp, g = extract_and_render(hm.astype(jnp.float32), h, w,
                                   self.temperature, self.sigma,
                                   self.softmax_variant, self.align_corners)
        g = g.max(axis=1)[..., None]                       # (B, h, w, 1)
        return kp, g

    def extract_keypoints(self, x: jnp.ndarray) -> jnp.ndarray:
        """NCHW images → (B, K, 2)."""
        hm = self.keynet(x.transpose(0, 2, 3, 1)).transpose(0, 3, 1, 2)
        return spatial_softmax(hm.astype(jnp.float32), self.temperature,
                               self.softmax_variant, self.align_corners)

    def __call__(self, x_source: jnp.ndarray, x_target: jnp.ndarray):
        """(NCHW src, NCHW tgt) → (reconstruction of target, target keypoints)."""
        xs = x_source.transpose(0, 2, 3, 1)
        xt = x_target.transpose(0, 2, 3, 1)
        phi_s = jax.lax.stop_gradient(self.encoder(xs))
        phi_t = self.encoder(xt)
        _, g_s = self._heat(xs)
        g_s = jax.lax.stop_gradient(g_s)
        kp_t, g_t = self._heat(xt)
        g_s = g_s.astype(phi_t.dtype)
        g_t = g_t.astype(phi_t.dtype)
        transported = (1.0 - g_s) * (1.0 - g_t) * phi_s + g_t * phi_t
        recon = self.decoder(transported)
        return recon.transpose(0, 3, 1, 2).astype(jnp.float32), kp_t
