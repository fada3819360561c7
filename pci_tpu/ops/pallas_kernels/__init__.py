"""Pallas TPU kernels for the hot ops.

These fuse the O(N^2) distance computation with neighbor selection inside
VMEM so the full [N, M] distance matrix never touches HBM — the unfused
XLA path is HBM-bound (~30ms for a 16k x 16k fp32 matrix on v5e).
"""

from .fps_tpu import fps_pallas, fps_pallas_interleaved
from .fusion_cells_tpu import knn_fusion_cells
from .fusion_knn_tpu import (
    knn_fusion_adaptive,
    knn_fusion_attention,
    knn_fusion_multi,
)
from .knn_tpu import knn_pallas

__all__ = [
    "fps_pallas",
    "fps_pallas_interleaved",
    "knn_fusion_adaptive",
    "knn_fusion_attention",
    "knn_fusion_cells",
    "knn_fusion_multi",
    "knn_pallas",
]
