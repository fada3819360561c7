"""Exact k-nearest-neighbor search on TPU.

Replaces pytorch3d.ops.knn_points (CUDA) used throughout the reference
(call sites: /root/reference/Utils/Layers.py:10,220,311,393,430;
/root/reference/PolyPCI/Models/Models_V1.py:113).

Design: the distance matrix is one MXU matmul; for large clouds we tile the
*reference* (key) axis and keep a running top-k so the full ``[N, M]``
matrix never materializes.  Results are sorted ascending by distance, like
pytorch3d's default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from .distance import square_distance
from .gather import index_points

# Above this key-axis size we switch to the tiled running-top-k path.
_TILE_THRESHOLD = 8192
_KEY_TILE = 4096


def _knn_direct(query: jax.Array, points: jax.Array, k: int):
    d = square_distance(query, points)
    neg_d, idx = lax.top_k(-d, k)
    return -neg_d, idx.astype(jnp.int32)


def _knn_tiled(query: jax.Array, points: jax.Array, k: int, tile: int):
    """Running top-k merge over key tiles. points axis must divide by tile."""
    B, N, C = points.shape
    num_tiles = N // tile
    pts = points.reshape(B, num_tiles, tile, C)

    def step(carry, inp):
        best_d, best_i = carry
        tile_pts, tile_off = inp
        d = square_distance(query, tile_pts)  # [B, S, tile]
        td, ti = lax.top_k(-d, min(k, tile))
        td = -td
        ti = ti.astype(jnp.int32) + tile_off
        cat_d = jnp.concatenate([best_d, td], axis=-1)
        cat_i = jnp.concatenate([best_i, ti], axis=-1)
        nd, pos = lax.top_k(-cat_d, k)
        ni = jnp.take_along_axis(cat_i, pos, axis=-1)
        return (-nd, ni), None

    S = query.shape[1]
    init_d = jnp.full((B, S, k), jnp.inf, dtype=jnp.float32)
    init_i = jnp.zeros((B, S, k), dtype=jnp.int32)
    offsets = jnp.arange(num_tiles, dtype=jnp.int32) * tile
    (best_d, best_i), _ = lax.scan(
        step, (init_d, init_i), (jnp.swapaxes(pts, 0, 1), offsets)
    )
    return best_d, best_i


@functools.partial(jax.jit, static_argnums=(2,))
def knn(query: jax.Array, points: jax.Array, k: int):
    """Exact kNN of ``query`` into ``points``.

    Args:
      query: ``[B, S, C]``.
      points: ``[B, N, C]``.
      k: number of neighbors (static).

    Returns:
      ``(sq_dists [B, S, k], idx [B, S, k])`` sorted ascending by distance.
      Distances carry no gradient (indices are integer); gather the points
      with :func:`knn_points` if you need differentiable neighbor coords.
    """
    query = lax.stop_gradient(query)
    points = lax.stop_gradient(points)
    N = points.shape[1]
    if N > _TILE_THRESHOLD and N % _KEY_TILE == 0:
        return _knn_tiled(query, points, k, _KEY_TILE)
    return _knn_direct(query, points, k)


@functools.partial(jax.jit, static_argnums=(2,))
def knn_prefix(query: jax.Array, points: jax.Array, k: int, valid_n: jax.Array):
    """Exact kNN into the first ``valid_n`` entries of ``points``.

    The adaptive fusion head samples a *data-dependent* number of points
    per batch element; with a shuffled point array the valid set is always
    a prefix, so a data-dependent neighbor pool reduces to masking key
    positions ``>= valid_n`` — fully static shapes.

    Args:
      query: ``[B, S, C]``.
      points: ``[B, N, C]`` — only the prefix is eligible.
      k: neighbor count (static).  Callers must guarantee ``valid_n >= 1``;
        if ``valid_n < k`` the trailing neighbors repeat prefix points.
      valid_n: ``[B]`` int32 per-sample prefix lengths.

    Returns:
      ``(sq_dists [B,S,k], idx [B,S,k])``; masked keys get ``inf`` distance.
    """
    query = lax.stop_gradient(query)
    points = lax.stop_gradient(points)
    N = points.shape[1]
    d = square_distance(query, points)  # [B, S, N]
    pos = jnp.arange(N, dtype=jnp.int32)
    mask = pos[None, None, :] < valid_n[:, None, None]
    d = jnp.where(mask, d, jnp.inf)
    neg_d, idx = lax.top_k(-d, k)
    return -neg_d, idx.astype(jnp.int32)


def knn_points(query: jax.Array, points: jax.Array, k: int):
    """kNN + differentiable gather of neighbor coordinates.

    Mirrors ``pytorch3d.ops.knn_points(..., return_nn=True)``:
    returns ``(sq_dists [B,S,k], idx [B,S,k], nn [B,S,k,C])`` where ``nn``
    backpropagates into ``points``.
    """
    d, idx = knn(query, points, k)
    nn = index_points(points, idx)
    return d, idx, nn
