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

_UP_DN = ("NHWC", "HWIO", "NHWC")


def _flip_t(k):
    """The transposed-conv kernel involution: spatial flip + IO transpose."""
    return jnp.transpose(k[::-1, ::-1], (0, 1, 3, 2))


@jax.custom_vjp
def _upconv2x(x, k2):
    """y = conv(dilate₂(x), k2, pad 2) — the fused ×2-upsample conv.

    Custom VJP because XLA's transpose of an lhs-dilated conv spatially
    REVERSES the (large) dy activation before the weight grad (profiled
    ~2.3 ms/step at celeba128/b128: two bf16[128,128,128,·] reverses plus
    relayout fusions). Both gradients are instead expressed through the
    ordinary stride-2 conv ``C(dy, k') = conv(dy, k', strides 2, pad 1)``,
    which is the exact adjoint of the forward in x when k' = flip+transpose
    of k2 — the same well-lowered path every stride-2 encoder conv backward
    already takes (no activation reverses in its HLO).
    """
    return jax.lax.conv_general_dilated(
        x, k2, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=_UP_DN)


def _upconv2x_fwd(x, k2):
    return _upconv2x(x, k2), (x, k2)


def _upconv2x_bwd(res, dy):
    x, k2 = res
    kt = _flip_t(k2)                              # (4,4,D,C) — tiny
    # dx: ⟨dy, conv(dilate₂(x), k2)⟩ = ⟨conv(dy, kt, s2, pad 1), x⟩ —
    # derivation: y[p,q,d] touches x[i,j,c] iff p = 2i+2-u, so
    # dx[i,j,c] = Σ_{u,v,d} dy[2i+2-u, 2j+2-v, d]·k2[u,v,c,d], a 4×4
    # stride-2 correlation of dy with the flipped, IO-transposed kernel.
    dx = jax.lax.conv_general_dilated(
        dy, kt, (2, 2), ((1, 1), (1, 1)), dimension_numbers=_UP_DN,
        preferred_element_type=x.dtype)
    # dk2: gradient of the SAME bilinear form in its kernel slot — the
    # standard weight-grad of C(dy, ·) with output-cotangent x, mapped back
    # through the (self-inverse) flip+transpose.
    _, wgrad = jax.vjp(
        lambda kk: jax.lax.conv_general_dilated(
            dy, kk, (2, 2), ((1, 1), (1, 1)), dimension_numbers=_UP_DN), kt)
    (dkt,) = wgrad(x)
    return dx, _flip_t(dkt)


_upconv2x.defvjp(_upconv2x_fwd, _upconv2x_bwd)


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
        y = _upconv2x(x, k2)
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
