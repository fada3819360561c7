"""Batched gather primitives (the TPU analog of torch batched indexing and
pytorch3d.ops.knn_gather).

Reference behavior mirrored (not copied):
  /root/reference/Utils/Pointnet2Utils.py:44-61 (index_points)
  pytorch3d knn_gather call sites at /root/reference/Utils/Layers.py:393-434
"""

from __future__ import annotations

import os

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


def scatter_add_rows(idx: jax.Array, g: jax.Array, n_out: int,
                     method: str | None = None) -> jax.Array:
    """Transpose of a batched row gather: ``out[b, m] += g[b, q]`` for
    every ``q`` with ``idx[b, q] == m`` (the VJP of :func:`index_points`
    over a flat index list — e.g. the kNN-graph transpose in the fusion
    backward, where duplicate targets are the common case).

    Args:
      idx: ``[B, Q]`` int32 in ``[0, n_out)``.
      g:   ``[B, Q, C]`` cotangents.
      n_out: output row count.
      method: ``"scatter"`` — XLA ``.at[].add`` (a TPU scatter with
        duplicate indices may lower to a serialized update loop);
        ``"sort"`` — gather-only formulation: argsort by target row,
        fp32 cumsum, one ``searchsorted`` for segment ends, segment sums
        as cumsum differences.  ``None`` reads ``PCI_TPU_KNN_BWD``
        (default ``scatter``).

    The sort path accumulates through a length-Q fp32 prefix sum, so
    segment sums carry ~``sqrt(Q)·eps``relative error vs the scatter
    path's direct adds — fine for gradients, not for exact-identity
    tests.
    """
    if method is None:
        method = os.environ.get("PCI_TPU_KNN_BWD", "scatter")
    B, Q = idx.shape
    if method == "scatter":
        bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
        return jnp.zeros((B, n_out) + g.shape[2:], g.dtype).at[bidx, idx].add(g)
    if method != "sort":
        raise ValueError(f"scatter_add_rows: unknown method {method!r}")
    order = jnp.argsort(idx, axis=1)
    si = jnp.take_along_axis(idx, order, axis=1)
    sg = jnp.take_along_axis(g, order[..., None], axis=1)
    cs = jnp.cumsum(sg.astype(jnp.float32), axis=1)
    csz = jnp.pad(cs, ((0, 0), (1, 0), (0, 0)))
    targets = jnp.arange(n_out, dtype=idx.dtype)
    # ends[b, m] = #{q : idx[b,q] <= m}; integer keys make "left of m" =
    # "right of m-1", so one searchsorted + a shift covers both bounds.
    ends = jax.vmap(
        lambda s: jnp.searchsorted(s, targets, side="right")
    )(si).astype(jnp.int32)
    starts = jnp.pad(ends[:, :-1], ((0, 0), (1, 0)))
    out = (jnp.take_along_axis(csz, ends[..., None], axis=1)
           - jnp.take_along_axis(csz, starts[..., None], axis=1))
    return out.astype(g.dtype)
