"""TPU-native point-cloud primitive ops.

This package is the full "native surface" of the reference
(SURVEY.md section 2.3): everything the reference delegated to external
CUDA/C++ (pytorch3d kNN + chamfer, PyTorchEMD auction, Open3D FPS) plus its
pure-torch primitives, re-designed for XLA/MXU.
"""

from .autodiff import has_tangents
from .ball import ball_query, ball_query_multi
from .chamfer import (
    chamfer_distance,
    chamfer_loss_cf,
    chamfer_per_sample,
    min_sqdist,
    nearest_neighbor_idx,
)
from .distance import pdist2squared, square_distance
from .emd import emd, emd_assignment_dist, emd_assignment_sparse, sinkhorn_emd
from .fps import fps, fps_points
from .gather import index_points, knn_gather
from .interpolate import three_nn_interpolate
from .knn import cells_eligible, knn, knn_points, knn_prefix, knn_self_resi
from .polyfit import polyfit_eval, polyfit_eval_xyz

__all__ = [
    "has_tangents",
    "ball_query",
    "ball_query_multi",
    "chamfer_distance",
    "chamfer_loss_cf",
    "chamfer_per_sample",
    "min_sqdist",
    "nearest_neighbor_idx",
    "pdist2squared",
    "square_distance",
    "emd",
    "sinkhorn_emd",
    "emd_assignment_dist",
    "emd_assignment_sparse",
    "fps",
    "fps_points",
    "index_points",
    "knn_gather",
    "three_nn_interpolate",
    "knn",
    "knn_self_resi",
    "cells_eligible",
    "knn_points",
    "knn_prefix",
    "polyfit_eval",
    "polyfit_eval_xyz",
]
