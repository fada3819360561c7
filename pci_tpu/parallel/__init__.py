"""Multi-device parallelism (new capability — the reference is single-GPU)."""

from .mesh import batch_sharding, make_mesh, replicated, shard_batch_pytree

__all__ = ["batch_sharding", "make_mesh", "replicated", "shard_batch_pytree"]
