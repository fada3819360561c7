"""Batched gather primitives (the TPU analog of torch batched indexing and
pytorch3d.ops.knn_gather).

Reference behavior mirrored (not copied):
  /root/reference/Utils/Pointnet2Utils.py:44-61 (index_points)
  pytorch3d knn_gather call sites at /root/reference/Utils/Layers.py:393-434
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def index_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather points by per-batch indices.

    Args:
      points: ``[B, N, C]``.
      idx: ``[B, ...]`` int32 indices into the N axis.

    Returns:
      ``[B, ..., C]`` gathered points.
    """
    B = points.shape[0]
    C = points.shape[-1]
    out_shape = idx.shape + (C,)
    flat_idx = idx.reshape(B, -1)
    out = jnp.take_along_axis(points, flat_idx[..., None], axis=1)
    return out.reshape(out_shape)


def knn_gather(x: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather features for kNN neighbor indices.

    Args:
      x: ``[B, N, C]`` features.
      idx: ``[B, S, K]`` neighbor indices into the N axis.

    Returns:
      ``[B, S, K, C]``.
    """
    return index_points(x, idx)
