"""Pairwise squared-distance primitives.

The O(N^2) distance matrix is the computational core of kNN / ball query /
chamfer / EMD in this domain.  On TPU the cross term is a single MXU matmul
(`-2 * src @ dst^T`), so we phrase everything around `jnp.einsum`.

Reference behavior mirrored (not copied):
  /root/reference/Utils/Pointnet2Utils.py:20-41 (square_distance)
  /root/reference/Utils/Utils.py:13-19          (pdist2squared)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def square_distance(src: jax.Array, dst: jax.Array) -> jax.Array:
    """Pairwise squared euclidean distance.

    Args:
      src: ``[..., N, C]`` query points.
      dst: ``[..., M, C]`` reference points.

    Returns:
      ``[..., N, M]`` squared distances ``|src_i - dst_j|^2``.

    The cross term is computed in fp32 on the MXU via
    ``preferred_element_type`` so bf16 inputs still produce accurate
    distances.
    """
    s2 = jnp.sum(src.astype(jnp.float32) ** 2, axis=-1)[..., :, None]
    d2 = jnp.sum(dst.astype(jnp.float32) ** 2, axis=-1)[..., None, :]
    # Geometry needs true fp32: HIGHEST keeps the MXU from dropping the
    # cross term to bf16 (which would corrupt kNN/ball-query decisions).
    cross = jnp.einsum(
        "...nc,...mc->...nm",
        src,
        dst,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return s2 + d2 - 2.0 * cross


def pdist2squared(x: jax.Array, y: jax.Array) -> jax.Array:
    """Channels-first variant used by the reference's training utils.

    Args:
      x: ``[B, C, N]``
      y: ``[B, C, M]``

    Returns:
      ``[B, N, M]`` squared distances, NaNs replaced by 0, clamped to >= 0.
    """
    d = square_distance(jnp.swapaxes(x, -1, -2), jnp.swapaxes(y, -1, -2))
    d = jnp.nan_to_num(d, nan=0.0)
    return jnp.maximum(d, 0.0)
