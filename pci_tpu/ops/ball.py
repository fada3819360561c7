"""Radius (ball) query with a fixed neighbor budget.

Mirrors /root/reference/Utils/Pointnet2Utils.py:88-108 semantics exactly:
for each query point, take the first ``nsample`` in-radius points *in index
order* (not distance order), padding shortfall with the first hit.

The fixed ``nsample`` makes this op static-shape and hence TPU-native: the
"first nsample in index order" selection is a top-k over
``where(in_radius, index, N)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from .distance import square_distance


def _pallas_eligible(xyz, new_xyz, nsamples) -> bool:
    """Route to the streamed kernel when the [S, N] matrix is worth
    skipping (N >= 1024; the kernel pads to its own tile grain)."""
    N = xyz.shape[1]
    return (
        jax.default_backend() == "tpu"
        and N >= 1024
        and max(nsamples) <= 128
    )


def ball_query_multi(radius_list, nsample_list, xyz, new_xyz):
    """Multi-scale ball query: one ``[B, S, K_s]`` per (radius, K).

    On TPU (eligible shapes) all scales share ONE streamed Pallas pass
    over the keys — no ``[S, N]`` matrix (pallas_kernels/ball_tpu.py);
    elsewhere the scales share one precomputed distance matrix.
    """
    if _pallas_eligible(xyz, new_xyz, nsample_list):
        from .pallas_kernels.ball_tpu import ball_query_pallas, finish_ball_idx

        outs = ball_query_pallas(
            lax.stop_gradient(xyz), lax.stop_gradient(new_xyz),
            jnp.asarray(radius_list, jnp.float32), tuple(nsample_list),
        )
        N = xyz.shape[1]
        return [finish_ball_idx(i, N) for i in outs]
    sqrdists = square_distance(
        lax.stop_gradient(new_xyz), lax.stop_gradient(xyz)
    )
    return [
        ball_query(r, k, xyz, new_xyz, sqrdists=sqrdists)
        for r, k in zip(radius_list, nsample_list)
    ]


@functools.partial(jax.jit, static_argnums=(1, 4))
def ball_query(
    radius: float, nsample: int, xyz: jax.Array, new_xyz: jax.Array,
    exact: bool = False, sqrdists: jax.Array | None = None,
) -> jax.Array:
    """Fixed-budget radius search.

    Args:
      radius: local region radius (traced or static scalar).
      nsample: neighbor budget (static).
      xyz: ``[B, N, 3]`` all points.
      new_xyz: ``[B, S, 3]`` query centers.
      sqrdists: optional precomputed ``[B, S, N]`` squared distances —
        multi-scale grouping queries the same (xyz, new_xyz) pair at
        several radii, and the O(S*N) matrix only needs computing once.

    Returns:
      ``[B, S, nsample]`` int32 indices.  Queries with fewer than
      ``nsample`` in-radius points repeat their first hit; queries with no
      in-radius point at all return index 0 (the reference would read
      out-of-bounds there — its call sites guarantee a self-hit).
    """
    from .knn import _select_min_k

    xyz = lax.stop_gradient(xyz)
    new_xyz = lax.stop_gradient(new_xyz)
    N = xyz.shape[1]
    if sqrdists is None and not exact and _pallas_eligible(
        xyz, new_xyz, (nsample,)
    ):
        # streamed TPU kernel — exact semantics, no [S, N] matrix
        from .pallas_kernels.ball_tpu import ball_query_pallas, finish_ball_idx

        (idx,) = ball_query_pallas(
            xyz, new_xyz, jnp.stack([jnp.asarray(radius, jnp.float32)]),
            (nsample,),
        )
        return finish_ball_idx(idx, N)
    if sqrdists is None:
        sqrdists = square_distance(new_xyz, xyz)  # [B, S, N]
    else:
        sqrdists = lax.stop_gradient(sqrdists)
    arange = jnp.arange(N, dtype=jnp.float32)
    # smallest `nsample` candidate indices == first in-radius points.
    # float index values are exact below 2^24 points.
    cand = jnp.where(sqrdists <= radius**2, arange, jnp.float32(N))
    vals, _ = _select_min_k(cand, nsample, exact)
    idx = vals.astype(jnp.int32)
    first = idx[..., :1]
    idx = jnp.where(idx == N, first, idx)
    return jnp.clip(idx, 0, N - 1)
