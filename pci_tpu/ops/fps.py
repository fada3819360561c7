"""Farthest point sampling (FPS).

The #1 hot op of the reference's FlowNet3D encoder
(/root/reference/Utils/Pointnet2Utils.py:64-85): a greedy sequential loop —
each iteration picks the point farthest from the chosen set and relaxes the
per-point distance-to-set.

TPU formulation: a ``lax.fori_loop`` whose body is one fused VPU pass over
``[B, N]`` (distance update + running argmax), vmapped over batch by XLA.
The cloud stays resident on-chip across iterations; there is no per-step
host round trip.  A Pallas VMEM-resident variant lives in
``pci_tpu.ops.pallas_kernels``.

Key property preserved: greedy FPS orderings are *prefix-stable* — the
first ``m`` entries of an ``n``-point ordering (same start) are exactly
``fps(m)``.  The adaptive fusion head exploits this to get data-dependent
sample counts with static shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _auto_parallel(N: int, npoint: int) -> int:
    """Pick the interleaved-chain count: the greedy loop is
    sequential-latency bound (~1.25us/iteration at 16k regardless of
    width), so more chains = proportionally faster; quality needs each
    chain to make >= 32 picks from >= 512 candidates."""
    for P in (8, 4, 2):
        if npoint % P == 0 and npoint // P >= 32 and N // P >= 512:
            return P
    return 1


@functools.partial(jax.jit, static_argnums=(1, 3))
def fps(xyz: jax.Array, npoint: int, start_idx: jax.Array | int = 0,
        exact: bool = True):
    """Greedy farthest point sampling.

    Args:
      xyz: ``[B, N, 3]`` point coordinates.
      npoint: number of points to select (static).
      start_idx: scalar or ``[B]`` starting index.  The reference uses a
        random start (`torch.randint`, Pointnet2Utils.py:76); pass
        ``jax.random.randint(key, (B,), 0, N)`` for that behavior.  The
        default 0 is deterministic, which keeps eval reproducible.
      exact: ``False`` allows the interleaved-parallel TPU kernel (greedy
        chains over strided subsets, ~19x faster at 16k->1024 and
        near-FPS uniformity: max coverage radius 47.5 vs 17.0 exact vs
        329 random on a 16k gaussian cloud).  On CPU always exact.

    Returns:
      ``[B, npoint]`` int32 indices into the N axis (selection order).
    """
    xyz = lax.stop_gradient(xyz)
    B, N, _ = xyz.shape
    if jax.default_backend() == "tpu" and N >= 4096 and xyz.shape[-1] == 3:
        from .pallas_kernels import fps_pallas, fps_pallas_interleaved

        P = 1 if exact else _auto_parallel(N, npoint)
        if P > 1:
            return fps_pallas_interleaved(xyz, npoint, start_idx, P)
        return fps_pallas(xyz, npoint, start_idx)
    start = jnp.broadcast_to(jnp.asarray(start_idx, jnp.int32), (B,))

    def body(i, state):
        dist, farthest, idxs = state
        idxs = idxs.at[:, i].set(farthest)
        centroid = jnp.take_along_axis(xyz, farthest[:, None, None], axis=1)
        d = jnp.sum((xyz - centroid) ** 2, axis=-1)
        dist = jnp.minimum(dist, d)
        farthest = jnp.argmax(dist, axis=-1).astype(jnp.int32)
        return dist, farthest, idxs

    init = (
        jnp.full((B, N), jnp.inf, dtype=jnp.float32),
        start,
        jnp.zeros((B, npoint), dtype=jnp.int32),
    )
    _, _, idxs = lax.fori_loop(0, npoint, body, init)
    return idxs


def fps_points(xyz: jax.Array, npoint: int, start_idx: jax.Array | int = 0,
               exact: bool = True):
    """FPS returning the sampled coordinates ``[B, npoint, 3]``."""
    idx = fps(xyz, npoint, start_idx, exact)
    return jnp.take_along_axis(xyz, idx[..., None], axis=1)
