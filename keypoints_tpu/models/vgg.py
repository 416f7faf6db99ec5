"""VGG-16 feature extractor for the perceptual loss (SURVEY.md §2.1, [B:10]).

Flax port of the torchvision VGG-16 *features* trunk: conv3x3/ReLU blocks with
2x2 max-pools, tapped at the canonical perceptual-loss layers. Weights load
from a torch checkpoint through ``checkpoint.convert_torch_state_dict`` (the
torchvision ``vgg16`` state dict converts directly — layer names below map
``features.N`` indices); with no checkpoint the net runs with fixed
random-init weights, which still yields a usable (if weaker) perceptual
metric and keeps the pipeline runnable offline.

Inputs are NCHW RGB in [0, 1]; normalization uses the ImageNet mean/std the
torchvision models expect.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# torchvision vgg16.features indices for each conv, and the tap names.
# (conv index, out_channels, tap-name-after-relu or None)
_VGG16_LAYOUT: list[tuple[int, int, str | None]] = [
    (0, 64, "relu1_1"), (2, 64, "relu1_2"), (-1, 0, "pool1"),
    (5, 128, "relu2_1"), (7, 128, "relu2_2"), (-1, 0, "pool2"),
    (10, 256, "relu3_1"), (12, 256, "relu3_2"), (14, 256, "relu3_3"),
    (-1, 0, "pool3"),
    (17, 512, "relu4_1"), (19, 512, "relu4_2"), (21, 512, "relu4_3"),
    (-1, 0, "pool4"),
    (24, 512, "relu5_1"), (26, 512, "relu5_2"), (28, 512, "relu5_3"),
]

_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


@jax.custom_vjp
def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """2×2/stride-2 max pool (NHWC) with a cheap exact backward.

    Forward is the stock reduce-window. The default backward lowers to XLA
    ``select-and-scatter`` — a notoriously slow TPU lowering (measured in
    benchmarks/bench_maxpool.py; numbers in docs/DESIGN.md). This VJP
    replaces it with elementwise compare/mask ops while keeping tie routing
    EXACT: the gradient goes to the first window element equal to the max
    in (dy, dx) row-major order — the same element XLA's select-and-scatter
    (GE select) and torch's MaxPool2d indices pick, so golden-parity is
    unaffected even on plateaus (e.g. ReLU zeros).
    """
    assert x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0, x.shape
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def _mp_fwd(x):
    y = max_pool_2x2(x)
    return y, (x, y)


def _mp_bwd(res, g):
    x, y = res
    # corners of each window as strided 4-D slices (no size-2 sublane dims —
    # a (…,2,C) reshape would tile-pad 4x on TPU, the decoder-upsample lesson)
    x00, x01 = x[:, ::2, ::2], x[:, ::2, 1::2]
    x10, x11 = x[:, 1::2, ::2], x[:, 1::2, 1::2]
    e00, e01, e10, e11 = (x00 == y), (x01 == y), (x10 == y), (x11 == y)
    f01 = e01 & ~e00
    f10 = e10 & ~(e00 | e01)
    f11 = e11 & ~(e00 | e01 | e10)
    z = g.dtype.type(0)
    row0 = _interleave_w(jnp.where(e00, g, z), jnp.where(f01, g, z))
    row1 = _interleave_w(jnp.where(f10, g, z), jnp.where(f11, g, z))
    return (_interleave_h(row0, row1),)


def _interleave_w(a, b):
    n, h, w, c = a.shape
    return jnp.stack([a, b], axis=3).reshape(n, h, 2 * w, c)


def _interleave_h(a, b):
    n, h, w, c = a.shape
    return jnp.stack([a, b], axis=2).reshape(n, 2 * h, w, c)


max_pool_2x2.defvjp(_mp_fwd, _mp_bwd)


class VGG16Features(nn.Module):
    """Run the trunk and return {tap_name: NHWC feature} for requested taps."""
    layers: Sequence[str] = ("relu1_2", "relu2_2", "relu3_3")
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x_nhwc: jnp.ndarray) -> dict[str, jnp.ndarray]:
        wanted = set(self.layers)
        deepest = max(i for i, (_, _, name) in enumerate(_VGG16_LAYOUT)
                      if name in wanted)
        out: dict[str, jnp.ndarray] = {}
        x = x_nhwc if self.dtype is None else x_nhwc.astype(self.dtype)
        for i, (conv_idx, feats, name) in enumerate(_VGG16_LAYOUT):
            if i > deepest:
                break
            if conv_idx < 0:   # pool layer (custom VJP — see max_pool_2x2)
                x = max_pool_2x2(x)
            else:
                x = nn.Conv(feats, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name=f"conv{conv_idx}")(x)
                x = nn.relu(x)
            if name in wanted:
                out[name] = x.astype(jnp.float32)
        return out


def torchvision_rename_map() -> dict[str, str]:
    """torchvision ``vgg16().features.N`` → our ``convN`` module names."""
    return {f"features.{idx}": f"conv{idx}"
            for idx, _, _ in _VGG16_LAYOUT if idx >= 0}


def load_params(layers: Sequence[str],
                torch_ckpt: str | None = None) -> dict:
    """Init (or convert-from-torch) params for the feature trunk."""
    model = VGG16Features(layers=tuple(layers))
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(17), dummy)["params"]
    if torch_ckpt:
        from keypoints_tpu.checkpoint import (assert_tree_shapes_match,
                                              load_torch_checkpoint)
        converted = load_torch_checkpoint(torch_ckpt,
                                          rename=torchvision_rename_map())
        # keep only trunk entries that exist in our net (classifier dropped)
        converted = {k: v for k, v in converted.items() if k in params}
        assert_tree_shapes_match(converted, params)
        params = converted
    return params


def make_feature_fn(layers: Sequence[str] = ("relu1_2", "relu2_2", "relu3_3"),
                    torch_ckpt: str | None = None,
                    dtype: jnp.dtype | None = None) -> Callable:
    """→ fn(images_nchw [0,1]) -> {layer: features}; params frozen in closure."""
    model = VGG16Features(layers=tuple(layers), dtype=dtype)
    params = load_params(layers, torch_ckpt)
    mean = jnp.asarray(_MEAN)
    std = jnp.asarray(_STD)

    def features(images: jnp.ndarray) -> dict[str, jnp.ndarray]:
        x = images.transpose(0, 2, 3, 1)
        if x.shape[-1] == 1:                     # grayscale → RGB
            x = jnp.repeat(x, 3, axis=-1)
        x = (x - mean) / std
        return model.apply({"params": params}, x)

    return features
