"""Multi-device parallelism (new capability — the reference is single-GPU)."""

from .mesh import (
    batch_sharding,
    init_multihost,
    make_mesh,
    replicated,
    shard_batch_pytree,
)
from .ring import chamfer_distance_sharded, knn_sharded
from .sharded_model import transformer_layer_sharded

__all__ = [
    "transformer_layer_sharded",
    "batch_sharding",
    "init_multihost",
    "make_mesh",
    "replicated",
    "shard_batch_pytree",
    "chamfer_distance_sharded",
    "knn_sharded",
]
