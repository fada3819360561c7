"""Ring-exchange point-axis parallelism for the O(N^2) global reductions.

The domain analog of ring attention / sequence parallelism (SURVEY.md
section 5): chamfer and kNN are global reductions over the N-point axis,
so clouds too large for one chip's distance tile shard the point axis —
each device keeps a query shard resident and circulates key shards around
the ICI ring with ``lax.ppermute``, maintaining a running min / top-k.

No reference counterpart exists (the reference is single-GPU);
capability-parity target is only that the reduction results match the
single-device ops, which the tests check on a virtual CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.distance import square_distance


def _ring_min_sqdist(a_local, b_local, axis_name):
    """Per-point min squared distance of local queries against the FULL
    (sharded) key cloud, via a ring pass.  Differentiable."""
    nper = lax.psum(1, axis_name)
    perm = [(i, (i + 1) % nper) for i in range(nper)]

    def step(carry, _):
        best, b_blk = carry
        d = jnp.min(square_distance(a_local, b_blk), axis=-1)
        best = jnp.minimum(best, d)
        b_blk = lax.ppermute(b_blk, axis_name, perm)
        return (best, b_blk), None

    # derive the init from a varying input so shard_map's varying-axis
    # tracking matches the carry (fresh constants are "unvarying")
    best0 = jnp.full_like(a_local[..., 0], jnp.inf)
    (best, _), _ = lax.scan(step, (best0, b_local), None, length=nper)
    return best


def chamfer_distance_sharded(
    pc1: jax.Array, pc2: jax.Array, mesh: Mesh, axis: str = "points"
) -> jax.Array:
    """Chamfer distance with the point axis sharded over ``mesh[axis]``.

    Matches ``ops.chamfer_distance`` numerically; each chip holds N/P
    points of each cloud and key blocks ride the ring.  Batch axis may be
    sharded over the mesh's ``data`` axis simultaneously.
    """
    from jax import shard_map

    spec = P("data", axis) if "data" in mesh.axis_names else P(None, axis)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=P(),
    )
    def _chamfer(a, b):
        d12 = _ring_min_sqdist(a, b, axis)
        d21 = _ring_min_sqdist(b, a, axis)
        # global per-direction means over the sharded point axis
        m12 = lax.pmean(jnp.mean(d12, axis=-1), axis)
        m21 = lax.pmean(jnp.mean(d21, axis=-1), axis)
        per_sample = m12 + m21  # [B_local]
        total = jnp.mean(per_sample)
        if "data" in mesh.axis_names:
            total = lax.pmean(total, "data")
        return total

    return _chamfer(pc1, pc2)


def knn_sharded(
    query: jax.Array, points: jax.Array, k: int, mesh: Mesh, axis: str = "points"
):
    """kNN with keys sharded over ``mesh[axis]``: a running top-k merge
    rides the ring.  Queries are sharded too; indices returned are global.

    Returns ``(sq_dists [B, S, k], idx [B, S, k])`` with the same layout
    as the inputs (point axis sharded).  Like ``ops.knn``, the returned
    distances carry NO gradient (indices are integers); differentiable
    consumers gather the points by ``idx`` and recompute (ops.knn_points
    pattern) — gradients then match the single-device path.
    """
    from jax import shard_map

    query = lax.stop_gradient(query)
    points = lax.stop_gradient(points)

    # keep the batch axis on the data mesh axis when it divides (a
    # replicated-batch spec forces SPMD to reshard model-call inputs;
    # a non-divisible batch, e.g. B=1 on a 4x2 mesh, must replicate)
    spec = P(None, axis)
    if "data" in mesh.axis_names and query.shape[0] % mesh.shape["data"] == 0:
        spec = P("data", axis)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec, spec),
        out_specs=(spec, spec),
    )
    def _knn(q_local, p_local):
        nper = lax.psum(1, axis)
        my = lax.axis_index(axis)
        n_block = p_local.shape[1]
        perm = [(i, (i + 1) % nper) for i in range(nper)]

        def step(carry, step_i):
            best_d, best_i, p_blk = carry
            # block currently held originated at device (my - step_i) % P
            src = jnp.mod(my - step_i, nper)
            d = square_distance(q_local, p_blk)  # [B, S_local, n_block]
            td, ti = lax.top_k(-d, min(k, n_block))
            td = -td
            ti = ti.astype(jnp.int32) + src * n_block
            cat_d = jnp.concatenate([best_d, td], axis=-1)
            cat_i = jnp.concatenate([best_i, ti], axis=-1)
            nd, pos = lax.top_k(-cat_d, k)
            ni = jnp.take_along_axis(cat_i, pos, axis=-1)
            p_blk = lax.ppermute(p_blk, axis, perm)
            return (-nd, ni, p_blk), None

        B, s_local, _ = q_local.shape
        proto = jnp.broadcast_to(q_local[..., :1], (B, s_local, k))
        init = (
            jnp.full_like(proto, jnp.inf),
            jnp.zeros_like(proto, dtype=jnp.int32),
            p_local,
        )
        (best_d, best_i, _), _ = lax.scan(
            step, init, jnp.arange(nper, dtype=jnp.int32)
        )
        return best_d, best_i

    return _knn(query, points)
