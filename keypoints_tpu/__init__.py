"""keypoints_tpu — a TPU-native unsupervised-keypoint framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
``DuaneNielsen/keypoints`` research codebase (see SURVEY.md): Jakab-2018
keypoint autoencoders, Kulkarni-2019 Transporter, spatial-softmax keypoint
bottlenecks, Gaussian heatmap rasterization, device-side TPS/affine paired-frame
augmentation, perceptual losses, and shard_map data-parallel training.
"""

from keypoints_tpu import coords
from keypoints_tpu.ops.gaussian import gaussian_maps
from keypoints_tpu.ops.spatial_softmax import (marginal_softmax,
                                               spatial_softmax,
                                               spatial_softmax2d)
from keypoints_tpu.ops.warp import affine_grid, grid_sample, tps_grid

__version__ = "0.1.0"

__all__ = [
    "coords",
    "gaussian_maps",
    "spatial_softmax",
    "spatial_softmax2d",
    "marginal_softmax",
    "grid_sample",
    "affine_grid",
    "tps_grid",
    "__version__",
]
