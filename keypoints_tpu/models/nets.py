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

import jax
import jax.numpy as jnp
from flax import linen as nn


def _maybe_cast(x, dtype):
    return x.astype(dtype) if dtype is not None else x


# nearest-up(2x)+conv3x3 → one stride-2 transposed conv: the 4x4 kernel is a
# fixed linear transform of the 3x3 kernel. 1-D: y[2a]=w0·x[a-1]+(w1+w2)·x[a],
# y[2a+1]=(w0+w1)·x[a]+w2·x[a+1] ⇒ k2 = A w Aᵀ per channel pair with
_UP_A = ((0.0, 0.0, 1.0), (0.0, 1.0, 1.0), (1.0, 1.0, 0.0), (1.0, 0.0, 0.0))


class UpsampleConv(nn.Module):
    """Fused nearest-×2-upsample + 3×3 conv (one lhs-dilated conv).

    Mathematically identical to ``repeat(x, 2, H) → repeat(2, W) → Conv3x3``
    but the upsampled intermediate never exists: XLA materialized the
    ``jnp.repeat`` as a 5-D broadcast whose size-2 dim lands on sublanes
    (4× tile padding) plus a mirror reduce in the backward — measured
    ~3.7 ms of the 33 ms celeba128 step. Parameters are bit-identical to
    ``nn.Conv(features, (3, 3))`` (same shapes, names, init), so golden
    torch checkpoints convert unchanged.
    """
    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        a = jnp.asarray(_UP_A, kernel.dtype)
        k2 = jnp.einsum("ui,vj,ijcd->uvcd", a, a, kernel)[::-1, ::-1]
        x = _maybe_cast(x, self.dtype)
        k2 = k2.astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            x, k2, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(y.dtype)


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
        for i, (f, up) in enumerate(zip(self.filters, self.upsample)):
            if up:
                # fused upsample+conv; params named Conv_i like a plain conv
                x = UpsampleConv(f, dtype=self.dtype, name=f"Conv_{i}")(x)
            else:
                x = nn.Conv(f, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name=f"Conv_{i}")(x)
            x = nn.GroupNorm(num_groups=min(self.groups, f), epsilon=1e-5,
                             dtype=self.dtype)(x)
            x = nn.relu(x)
        return nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name="head")(x)
