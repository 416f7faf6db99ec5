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


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """2×2/stride-2 max pool (NHWC) — plain reduce-window autodiff.

    This is the HONESTLY-measured TPU optimum at the pose256-b128 shapes
    (benchmarks/bench_pool_alts.py → pool_alts.json, r5): fwd+bwd via XLA
    select-and-scatter is 11.47 ms at (128,256,256,64) bf16 and 5.66 ms at
    (128,128,128,128), vs 25.9 / 12.1 ms for the r4 custom VJP (strided
    corner compares + ``stack(axis=3)`` lane-splitting W-interleaves) that
    used to live here. The r4 bench that crowned that VJP consumed only
    ``dx[0]``, so XLA sliced through its elementwise masks and the design
    measured 2.2× faster than it really is; a Pallas selection-matmul pool
    was also built and measured no better than reduce_window
    (kernels/experimental.py). Tie routing is unchanged: XLA's
    select-and-scatter (GE select) sends the gradient to the FIRST window
    element equal to the max in row-major order — the same element torch's
    MaxPool2d picks — pinned bit-exactly (incl. plateaus and bf16) by
    tests/test_vgg.py::test_max_pool_2x2_backward_exact.
    """
    assert x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0, x.shape
    return nn.max_pool(x, (2, 2), strides=(2, 2))


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
