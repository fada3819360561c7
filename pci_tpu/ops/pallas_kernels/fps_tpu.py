"""Farthest point sampling as a single Pallas kernel.

The XLA ``fori_loop`` formulation pays ~6us of loop machinery per
iteration (measured 6.2ms for 1024 samples from 16k points on v5e); here
the whole greedy loop runs inside one kernel with the cloud resident in
VMEM, so an iteration is just two VPU passes (distance relax over [3, N]
and argmax over [N]) plus a one-hot update of the selection vector.

Layout: the cloud enters transposed ``[3, N]`` (points on lanes) — the
``[N, 3]`` layout would pad 3 lanes to 128 and waste 42x VMEM/DMA.

Argmax/centroid extraction use one-hot compare + reductions: Mosaic has
no dynamic lane indexing, but full-vector passes at N=16k are ~1us.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30


def _fps_kernel(start_ref, xyz_ref, out_ref, *, n, n_real, npoint):
    """Grid: (B,).  xyz_ref [1, 3, N] (VMEM), out_ref [1, 1, npoint] int32."""
    b = pl.program_id(0)
    start = start_ref[b]

    xyz = xyz_ref[0]  # [3, N]
    lane = jax.lax.broadcasted_iota(jnp.int32, (3, n), 1)  # [3, N]
    lane1 = lane[0]  # [N] int32 iota

    out_ref[0, 0, :] = jnp.zeros((npoint,), jnp.int32)

    def body(i, carry):
        dist, farthest = carry
        # centroid = xyz[:, farthest] via one-hot reduction
        centroid = jnp.sum(
            jnp.where(lane == farthest, xyz, 0.0), axis=1
        )  # [3]
        diff = xyz - centroid[:, None]
        d = jnp.sum(diff * diff, axis=0)  # [N]
        dist = jnp.minimum(dist, d)
        m = jnp.max(dist)
        new_far = jnp.min(jnp.where(dist == m, lane1, n))
        # record selection i
        sel = jax.lax.broadcasted_iota(jnp.int32, (npoint,), 0) == i
        out_ref[0, 0, :] = jnp.where(sel, farthest, out_ref[0, 0, :])
        return dist, new_far

    # padded tail positions start at -1 so they can never win the argmax
    dist0 = jnp.where(lane1 < n_real, jnp.float32(_BIG), jnp.float32(-1.0))
    lax.fori_loop(0, npoint, body, (dist0, start))


@functools.partial(jax.jit, static_argnums=(1,))
def fps_pallas(xyz: jax.Array, npoint: int, start_idx: jax.Array | int = 0):
    """Greedy FPS: ``[B, N, 3] -> [B, npoint]`` int32 selection order."""
    xyz = lax.stop_gradient(xyz)
    B, N, C = xyz.shape
    assert C == 3
    n_pad = (-N) % 128
    if n_pad:
        xyz = jnp.pad(xyz, ((0, 0), (0, n_pad), (0, 0)), constant_values=1e15)
    Np = N + n_pad
    xyz_t = jnp.swapaxes(xyz, 1, 2)  # [B, 3, Np]
    start = jnp.broadcast_to(jnp.asarray(start_idx, jnp.int32), (B,))

    kernel = functools.partial(_fps_kernel, n=Np, n_real=N, npoint=npoint)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, 3, Np), lambda b, start: (b, 0, 0))],
        out_specs=pl.BlockSpec((1, 1, npoint), lambda b, start: (b, 0, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 1, npoint), jnp.int32),
    )(start, xyz_t)
    return out[:, 0, :]
