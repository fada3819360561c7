"""Three-nearest-neighbor inverse-distance feature interpolation
(three_nn + three_interpolate).

Mirrors two slightly different reference variants:
  * /root/reference/Utils/Layers.py:163-192 (FeaturePropagation):
    distances clamped to >= 1e-10 before inversion.
  * /root/reference/Utils/Pointnet2Utils.py:266-316 (PointNet++ FP):
    ``1 / (d + 1e-8)``.
Both are exposed via the ``mode`` argument.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .gather import index_points
from .knn import knn


def three_nn_interpolate(
    query_xyz: jax.Array,
    ref_xyz: jax.Array,
    ref_feats: jax.Array,
    mode: str = "clamp",
) -> jax.Array:
    """Interpolate ``ref_feats`` onto ``query_xyz`` via inverse-distance 3-NN.

    Args:
      query_xyz: ``[B, N, 3]`` dense points to interpolate onto.
      ref_xyz: ``[B, S, 3]`` sparse points carrying features.
      ref_feats: ``[B, S, C]``.
      mode: ``"clamp"`` (Layers.py variant) or ``"eps"`` (Pointnet2Utils
        variant).

    Returns:
      ``[B, N, C]`` interpolated features.
    """
    _, idx = knn(query_xyz, ref_xyz, 3)  # sorted ascending
    # recompute exact squared distances from the indices: the Pallas kNN
    # path emits quantized distances (packed sort keys) and only the
    # INDICES are contract-exact; the weights here divide by d, where a
    # relative quantization error would be amplified near zero
    nn_xyz = index_points(ref_xyz, idx)  # [B, N, 3, 3]
    d = jnp.sum((nn_xyz - query_xyz[:, :, None, :]) ** 2, axis=-1)
    if mode == "clamp":
        d = jnp.maximum(d, 1e-10)
        recip = 1.0 / d
    elif mode == "eps":
        recip = 1.0 / (d + 1e-8)
    else:
        raise ValueError(f"unknown mode {mode!r}")
    weights = recip / jnp.sum(recip, axis=-1, keepdims=True)  # [B, N, 3]
    gathered = index_points(ref_feats, idx)  # [B, N, 3, C]
    return jnp.sum(gathered * weights[..., None], axis=2)
