"""Model zoo: encoder Φ, keypoint net Ψ, decoder — config-driven conv stacks.

TPU-native realization of the reference's CNN trio (SURVEY.md §2.1, provenance
[PAPER][R-med]): plain conv / GroupNorm / ReLU blocks with stride-2
downsampling in Φ/Ψ and nearest-upsample + conv in the decoder.

Design notes (TPU-first):
* Internals are NHWC — XLA's native conv layout on TPU (channels on the lane
  axis feed the MXU directly). The composite models in ``autoencoder.py`` /
  ``transporter.py`` adapt from the public NCHW convention at the boundary.
* GroupNorm rather than BatchNorm: batch-stat-free so the jitted train step is
  pure (no mutable collections), shards trivially under data parallelism, and
  its reductions fuse into the conv epilogue. The golden torch model uses the
  identical normalization so parity is exact.
* Widths/strides are config-driven to cover the three resolutions in the
  BASELINE configs: 64² (4 kp), 128² (10 kp), 256² (16 kp) [B:7][B:8][B:10].
* ``compute_dtype`` lets the hot path run bf16 on the MXU while parameters and
  parity tests stay fp32.
* Convs use explicit symmetric padding ((1,1),(1,1)) — torch's ``padding=1``
  convention — NOT "SAME": for stride-2 on even sizes XLA's SAME pads (0,1)
  asymmetrically, which would break torch checkpoint parity.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


def _maybe_cast(x, dtype):
    return x.astype(dtype) if dtype is not None else x


class Encoder(nn.Module):
    """Φ: image (B, H, W, C) → feature map (B, H/2^d, W/2^d, F).

    ``filters[i]`` with ``strides[i]`` per block; d = number of stride-2 blocks.
    """
    filters: Sequence[int] = (32, 32, 64, 64, 128)
    strides: Sequence[int] = (1, 2, 1, 2, 1)
    groups: int = 8
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = _maybe_cast(x, self.dtype)
        for f, s in zip(self.filters, self.strides):
            x = nn.Conv(f, (3, 3), strides=(s, s), padding=((1, 1), (1, 1)),
                        dtype=self.dtype)(x)
            x = nn.GroupNorm(num_groups=min(self.groups, f), epsilon=1e-5,
                             dtype=self.dtype)(x)
            x = nn.relu(x)
        return x


class KeyNet(nn.Module):
    """Ψ: image (B, H, W, C) → K raw heatmaps (B, H/2^d, W/2^d, K)."""
    num_keypoints: int
    filters: Sequence[int] = (32, 32, 64, 64, 128)
    strides: Sequence[int] = (1, 2, 1, 2, 1)
    groups: int = 8
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = Encoder(self.filters, self.strides, self.groups,
                    dtype=self.dtype, name="trunk")(x)
        # 1x1 head, no norm/activation — raw logits for the spatial softmax.
        return nn.Conv(self.num_keypoints, (1, 1), dtype=self.dtype,
                       name="head")(x)


class Decoder(nn.Module):
    """Feature map (B, h, w, F) → image (B, h*2^u, w*2^u, C_out).

    Nearest-neighbor upsample ×2 then conv per up-block (checkerboard-free,
    and upsample+conv lowers to a single conv on a broadcast — MXU-friendly),
    with a stride-1 conv block between ups, then a linear 3×3 head.
    """
    out_channels: int
    filters: Sequence[int] = (128, 64, 32)
    upsample: Sequence[bool] = (True, True, False)
    groups: int = 8
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = _maybe_cast(x, self.dtype)
        for f, up in zip(self.filters, self.upsample):
            if up:
                x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            x = nn.Conv(f, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype)(x)
            x = nn.GroupNorm(num_groups=min(self.groups, f), epsilon=1e-5,
                             dtype=self.dtype)(x)
            x = nn.relu(x)
        return nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name="head")(x)
