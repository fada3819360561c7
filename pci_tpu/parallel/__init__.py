"""Multi-device parallelism (new capability — the reference is single-GPU)."""

from .mesh import batch_sharding, make_mesh, replicated, shard_batch_pytree
from .ring import chamfer_distance_sharded, knn_sharded

__all__ = [
    "batch_sharding",
    "make_mesh",
    "replicated",
    "shard_batch_pytree",
    "chamfer_distance_sharded",
    "knn_sharded",
]
