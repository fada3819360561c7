"""Chamfer distance — the training loss and headline eval metric.

Replaces pytorch3d.loss.chamfer_distance (CUDA), call sites
/root/reference/Utils/Utils.py:39-48, train.py:121, test.py:74.

Semantics match pytorch3d defaults: squared distances, mean over points in
each direction, the two directional means summed, then averaged over batch.

For clouds whose ``[N, M]`` distance matrix would blow past on-chip memory
we tile the reference axis with a running min (``lax.scan``), so memory is
``O(N * tile)``; the tile matmuls still ride the MXU.  Fully
differentiable: gradients flow through the min via the recomputed distance
of the argmin pair.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from .distance import square_distance
from .gather import index_points

_TILE_THRESHOLD = 8192
_TILE = 4096


def _min_sqdist_direct(a: jax.Array, b: jax.Array):
    d = square_distance(a, b)  # [B, N, M]
    idx = jnp.argmin(d, axis=-1)
    return idx.astype(jnp.int32)


def _min_sqdist_tiled(a: jax.Array, b: jax.Array, tile: int):
    B, M, C = b.shape
    num_tiles = M // tile
    bt = jnp.swapaxes(b.reshape(B, num_tiles, tile, C), 0, 1)
    offsets = jnp.arange(num_tiles, dtype=jnp.int32) * tile

    def step(carry, inp):
        best_d, best_i = carry
        tile_pts, off = inp
        d = square_distance(a, tile_pts)  # [B, N, tile]
        td = jnp.min(d, axis=-1)
        ti = jnp.argmin(d, axis=-1).astype(jnp.int32) + off
        better = td < best_d
        return (jnp.where(better, td, best_d), jnp.where(better, ti, best_i)), None

    N = a.shape[1]
    init = (
        jnp.full((B, N), jnp.inf, dtype=jnp.float32),
        jnp.zeros((B, N), dtype=jnp.int32),
    )
    (_, best_i), _ = lax.scan(step, init, (bt, offsets))
    return best_i


def nearest_neighbor_idx(a: jax.Array, b: jax.Array) -> jax.Array:
    """Index in ``b`` of the nearest neighbor of every point of ``a``.

    ``a: [B, N, C]``, ``b: [B, M, C]`` -> ``[B, N]`` int32.
    """
    a_ = lax.stop_gradient(a)
    b_ = lax.stop_gradient(b)
    M = b.shape[1]
    from .knn import _use_pallas

    if _use_pallas(b_, 1):
        # fused kernel with k=1; the global nearest neighbor is exact
        # under bucketing (the min of its bucket is the min)
        from .pallas_kernels import knn_pallas

        bucket = 16 if M <= 32768 else 64
        _, idx = knn_pallas(a_, b_, 1, None, bucket)
        return idx[..., 0]
    if M > _TILE_THRESHOLD and M % _TILE == 0:
        return _min_sqdist_tiled(a_, b_, _TILE)
    return _min_sqdist_direct(a_, b_)


def min_sqdist(a: jax.Array, b: jax.Array) -> jax.Array:
    """Differentiable per-point min squared distance ``a -> b``: ``[B, N]``."""
    idx = nearest_neighbor_idx(a, b)
    nn = index_points(b, idx)  # [B, N, C] — differentiable gather
    return jnp.sum((a - nn) ** 2, axis=-1)


@jax.jit
def chamfer_distance(pc1: jax.Array, pc2: jax.Array) -> jax.Array:
    """Symmetric chamfer distance between point clouds.

    Args:
      pc1: ``[B, N, 3]``.
      pc2: ``[B, M, 3]``.

    Returns:
      scalar: ``mean_B( mean_N d(pc1->pc2) + mean_M d(pc2->pc1) )``.
    """
    d12 = jnp.mean(min_sqdist(pc1, pc2), axis=-1)
    d21 = jnp.mean(min_sqdist(pc2, pc1), axis=-1)
    return jnp.mean(d12 + d21)


@functools.partial(jax.jit, static_argnums=())
def chamfer_per_sample(pc1: jax.Array, pc2: jax.Array) -> jax.Array:
    """Per-sample chamfer ``[B]`` (for eval tables)."""
    d12 = jnp.mean(min_sqdist(pc1, pc2), axis=-1)
    d21 = jnp.mean(min_sqdist(pc2, pc1), axis=-1)
    return d12 + d21


def chamfer_loss_cf(pc1_cf: jax.Array, pc2_cf: jax.Array) -> jax.Array:
    """Channels-first convenience wrapper matching the reference signature
    (``[B, 3, N]`` inputs, /root/reference/Utils/Utils.py:39-48)."""
    return chamfer_distance(
        jnp.swapaxes(pc1_cf, -1, -2), jnp.swapaxes(pc2_cf, -1, -2)
    )
