from keypoints_tpu.ops.color import color_jitter
from keypoints_tpu.ops.gaussian import gaussian_maps
from keypoints_tpu.ops.spatial_softmax import (marginal_softmax,
                                               spatial_softmax,
                                               spatial_softmax2d)
from keypoints_tpu.ops.warp import (affine_grid, grid_sample, tps_coefficients,
                                    tps_evaluate, tps_grid)

__all__ = [
    "color_jitter",
    "gaussian_maps",
    "marginal_softmax",
    "spatial_softmax",
    "spatial_softmax2d",
    "affine_grid",
    "grid_sample",
    "tps_coefficients",
    "tps_evaluate",
    "tps_grid",
]
