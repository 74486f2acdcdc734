"""Low-level ops: the TPU-native equivalents of the reference's native layer.

Reference L1 inventory (SURVEY.md §2.1): correlation2d, furthest_point_sampling,
k_nearest_neighbor (+ squared_distance helper), plus the geometric/warping ops
from models/utils.py. Pure-XLA formulations are the reference implementations;
Pallas kernels provide the fast paths on TPU.
"""

from .correlation import correlation2d, correlation2d_ref
from .fps import furthest_point_sampling
from .gather import batch_gather
from .geometry import (
    CameraInfo,
    parallel2perspect,
    perspect2parallel,
    project_feat_with_nn_corr,
    project_pc2image,
)
from .interp import (
    backwarp_3d,
    convex_upsample,
    knn_interpolation,
    pad_to_64x,
    resize_bilinear_ac,
    resize_flow2d,
    resize_to_64x,
)
from .knn import k_nearest_neighbor, squared_distance
from .sample import backwarp_2d, grid_sample_2d, mesh_grid

__all__ = [
    "CameraInfo",
    "backwarp_2d",
    "backwarp_3d",
    "batch_gather",
    "convex_upsample",
    "correlation2d",
    "correlation2d_ref",
    "furthest_point_sampling",
    "grid_sample_2d",
    "k_nearest_neighbor",
    "knn_interpolation",
    "mesh_grid",
    "pad_to_64x",
    "parallel2perspect",
    "perspect2parallel",
    "project_feat_with_nn_corr",
    "project_pc2image",
    "resize_bilinear_ac",
    "resize_flow2d",
    "resize_to_64x",
    "squared_distance",
]
