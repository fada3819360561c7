"""Exact and TPU-accelerated k-nearest-neighbor search.

Replaces pytorch3d.ops.knn_points (CUDA) used throughout the reference
(call sites: /root/reference/Utils/Layers.py:10,220,311,393,430;
/root/reference/PolyPCI/Models/Models_V1.py:113).

Selection engine: ``lax.approx_min_k`` — the TPU has a hardware-assisted
partial-reduce TopK path that is ~8x faster than exact ``lax.top_k`` at
16k keys (measured: 258ms -> 30ms at [16384, 16384] k=32, recall 0.987).
``exact=True`` forces the exact path (tests, small problems, or when
bitwise reference parity matters).  On CPU the approx primitive lowers to
an exact top-k, so hermetic tests see exact results either way.

For very large key counts the reference axis is tiled with a running
top-k merge so the full [N, M] matrix never materializes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from .distance import square_distance
from .gather import index_points

# Above this key-axis size we switch to the tiled running-top-k path.
_TILE_THRESHOLD = 32768
_KEY_TILE = 8192

# Recall target for the approximate path (fraction of true neighbors).
APPROX_RECALL = 0.98


def _use_pallas(points: jax.Array, k: int) -> bool:
    """Fused Pallas kernel: TPU backend, xyz clouds, big-enough key set."""
    return (
        jax.default_backend() == "tpu"
        and points.shape[-1] == 3
        and points.shape[-2] >= 4096
        and k <= 128
    )


def _select_min_k(d: jax.Array, k: int, exact: bool):
    """Row-wise k smallest of ``d`` -> (values, indices)."""
    if exact or k >= d.shape[-1]:
        neg, idx = lax.top_k(-d, min(k, d.shape[-1]))
        return -neg, idx.astype(jnp.int32)
    val, idx = lax.approx_min_k(d, k, recall_target=APPROX_RECALL)
    return val, idx.astype(jnp.int32)


def _knn_direct(query, points, k, exact):
    d = square_distance(query, points)
    return _select_min_k(d, k, exact)


def _knn_tiled(query, points, k, tile, exact):
    """Running top-k merge over key tiles. points axis must divide by tile."""
    B, N, C = points.shape
    num_tiles = N // tile
    pts = points.reshape(B, num_tiles, tile, C)

    def step(carry, inp):
        best_d, best_i = carry
        tile_pts, tile_off = inp
        d = square_distance(query, tile_pts)  # [B, S, tile]
        td, ti = _select_min_k(d, min(k, tile), exact)
        ti = ti + tile_off
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


def knn(query: jax.Array, points: jax.Array, k: int, exact: bool = False):
    """kNN of ``query`` into ``points``.

    Args:
      query: ``[B, S, C]``.
      points: ``[B, N, C]``.
      k: number of neighbors (static).
      exact: force exact selection (default False uses the TPU-fast
        approximate TopK at ~0.98 recall; identical results on CPU).

    Returns:
      ``(sq_dists [B, S, k], idx [B, S, k])`` sorted ascending by distance.
      Distances carry no gradient (indices are integer); gather the points
      with :func:`knn_points` if you need differentiable neighbor coords.

    Distance precision: on the TPU Pallas path the returned distances are
    QUANTIZED (packed sort keys zero the mantissa LSBs that carry the
    index, ~2^-13 relative at 16k keys); only the indices are
    contract-exact.  Consumers that divide by or compare distances should
    recompute them from ``idx`` (see ops/interpolate.py, ops/chamfer.py).
    """
    # Self-ness MUST be decided here, OUTSIDE the jit boundary: a jitted
    # impl receives two distinct tracers for a duplicated argument, so
    # ``query is points`` inside is always False (the r3 lesson,
    # CLAUDE.md) — which silently disabled the cells self-route for every
    # ops.knn(x, x, k) caller until r5.
    return _knn_impl(query, points, k, exact, query is points)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _knn_impl(query, points, k: int, exact: bool, self_query: bool):
    # rebind to ONE object for the self case: knn_cells keys its
    # shared-sort/forced-cover-chunk path on ``query is points``, and two
    # separate stop_gradient calls would produce distinct tracers
    if self_query:
        query = points = lax.stop_gradient(points)
    else:
        query = lax.stop_gradient(query)
        points = lax.stop_gradient(points)
    N = points.shape[1]
    if not exact and _use_pallas(points, k):
        if N >= _CELLS_MIN_N and k <= 64 and query is points:
            # cell-pruned kernel, SELF-kNN only: 64k k=32 on real LiDAR
            # 9.6 ms / recall 0.966 vs the flat kernel's 19.5 ms / 0.945
            # (bucket 64).  Cross-cloud stays on the flat kernel —
            # measured recall 0.81 at 16k->64k (separate Morton sorts,
            # no covering-chunk guarantee).
            from .pallas_kernels.knn_cells_tpu import knn_cells

            return knn_cells(query, points, k, m_chunks=16, tile=256)
        from .pallas_kernels import knn_pallas

        # larger buckets above 32k keys keep the VMEM candidate buffer
        # bounded (cand = 2 * (N/bucket) * 512 * 4B)
        return knn_pallas(query, points, k, None, 16 if N <= 32768 else 64)
    if N > _TILE_THRESHOLD and N % _KEY_TILE == 0:
        return _knn_tiled(query, points, k, _KEY_TILE, exact)
    return _knn_direct(query, points, k, exact)


@functools.partial(jax.jit, static_argnums=(2, 4))
def knn_prefix(
    query: jax.Array, points: jax.Array, k: int, valid_n: jax.Array,
    exact: bool = False,
):
    """Exact-semantics kNN into the first ``valid_n`` entries of ``points``.

    The adaptive fusion head samples a *data-dependent* number of points
    per batch element; with a shuffled point array the valid set is always
    a prefix, so a data-dependent neighbor pool reduces to masking key
    positions ``>= valid_n`` — fully static shapes.

    Args:
      query: ``[B, S, C]``.
      points: ``[B, N, C]`` — only the prefix is eligible.
      k: neighbor count (static).  Callers must guarantee ``valid_n >= 1``.
        If ``valid_n < k``, the first ``valid_n`` output slots hold real
        in-prefix neighbors (finite distances, sorted first) and the rest
        carry the sentinel distance with arbitrary indices — consume at
        most ``valid_n`` slots (the fusion head's ``k1 <= N1`` guarantees
        this).
      valid_n: ``[B]`` int32 per-sample prefix lengths.

    Returns:
      ``(sq_dists [B,S,k], idx [B,S,k])``; masked keys get a huge sentinel
      distance (not inf — the approximate TopK path mishandles inf rows).
    """
    query = lax.stop_gradient(query)
    points = lax.stop_gradient(points)
    N = points.shape[1]
    if not exact and _use_pallas(points, k):
        from .pallas_kernels import knn_pallas

        return knn_pallas(query, points, k, valid_n, 16 if N <= 32768 else 64)
    d = square_distance(query, points)  # [B, S, N]
    pos = jnp.arange(N, dtype=jnp.int32)
    mask = pos[None, None, :] < valid_n[:, None, None]
    d = jnp.where(mask, d, jnp.float32(1e30))
    return _select_min_k(d, k, exact)


# Below this size the flat Pallas kernel (2.1 ms @16k) beats the Morton
# sort + chunk-ranking overhead of the cell-pruned kernel; above it the
# flat kernel's O(S*N) distance tiles dominate (19.5 ms @64k) and IVF-style
# pruning wins (see ops/pallas_kernels/knn_cells_tpu.py).
_CELLS_MIN_N = 32768


def cells_eligible(points: jax.Array, k: int) -> bool:
    """True when :func:`knn_self_resi` will route to the cell-pruned
    kernel (callers that have a cheaper fused-gather layout for the dense
    path use this to branch at trace time)."""
    return (
        jax.default_backend() == "tpu"
        and points.shape[-1] == 3
        and points.shape[-2] >= _CELLS_MIN_N
        and k <= 64
    )


def knn_self_resi(points: jax.Array, k: int):
    """Self-kNN + exact neighbor-minus-query residuals.

    The point-transformer's neighborhood pattern
    (/root/reference/Utils/Layers.py:405-443: kNN + gather + ``q - knn_xyz``
    offsets): on TPU at large N this routes to the cell-pruned kernel,
    which emits the residuals IN-KERNEL (skipping the [B,N,k,3] xyz gather
    entirely) and prunes the O(N^2) distance work IVF-style.

    Args:
      points: ``[B, N, 3]``.
      k: neighbor count (static).

    Returns:
      ``(idx [B,N,k] int32, resi [B,N,k,3] fp32)`` with
      ``resi = points[idx] - points[:, :, None]`` exact (not quantized).
      No gradients flow (neighbor selection is non-differentiable; callers
      re-gather via :func:`index_points` if they need diff-able coords).
    """
    if cells_eligible(points, k):
        from .pallas_kernels.knn_cells_tpu import knn_cells

        # tuned on real 64k LiDAR (benchmarks/bench_knn_cells.py r3 A/B):
        # tile=256/M=16 -> recall 0.991 @ 11.9 ms vs tile=128's 0.993 @
        # 16.9 ms — per-tile overhead dominates at deep grids, and the
        # AABB tightening from 256 -> 128 buys only +0.002 recall
        m = 12 if points.shape[-2] <= 24576 else 16
        _, idx, resi = knn_cells(points, points, k, m_chunks=m,
                                 emit_resi=True, tile=256)
        return idx, resi
    _, idx = knn(points, points, k)
    nn_pts = index_points(lax.stop_gradient(points), idx)
    return idx, nn_pts - lax.stop_gradient(points)[:, :, None, :]


def knn_points(query: jax.Array, points: jax.Array, k: int, exact: bool = False):
    """kNN + differentiable gather of neighbor coordinates.

    Mirrors ``pytorch3d.ops.knn_points(..., return_nn=True)``:
    returns ``(sq_dists [B,S,k], idx [B,S,k], nn [B,S,k,C])`` where ``nn``
    backpropagates into ``points``.  ``sq_dists`` inherit :func:`knn`'s
    TPU quantization (~2^-13 relative) — recompute from ``nn`` if exact
    values matter.
    """
    d, idx = knn(query, points, k, exact)
    nn = index_points(points, idx)
    return d, idx, nn
