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


def _fps_interleaved_kernel(start_ref, xyz_ref, out_ref, *, nsub, n_sub_len,
                            n_real, n_parallel, npoint_sub):
    """Grid: (B,).  xyz_ref [1, n_parallel, 3, n_sub_len] (strided subsets),
    out_ref [1, n_parallel, npoint_sub] int32 (subset-local indices).

    All ``n_parallel`` greedy chains advance together on the sublane axis,
    cutting the sequential-iteration count (the latency bound: ~2.6us/iter
    at 16k regardless of width) by ``n_parallel``.
    """
    del nsub
    b = pl.program_id(0)
    start = start_ref[b]
    P, L = n_parallel, n_sub_len

    lane = jax.lax.broadcasted_iota(jnp.int32, (P, L), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (P, L), 0)
    # subset s holds global indices s, s+P, s+2P, ...: it has
    # ceil((n_real - s) / P) real points
    n_real_s = (n_real - sub + P - 1) // P  # [P, L]
    out_ref[0] = jnp.zeros((P, npoint_sub), jnp.int32)

    # channel-vectorized view: rows 3p..3p+2 are subset p's x/y/z.  One op
    # over [3P, L] instead of a python loop of three [P, L] ops — the loop
    # body is op-issue-latency bound (~0.15us/op at these sizes), so fewer,
    # wider ops is the whole game.
    X = xyz_ref[0].reshape(3 * P, L)
    lane3 = jax.lax.broadcasted_iota(jnp.int32, (3 * P, L), 1)

    def body(i, carry):
        dist, farthest = carry  # [P, L], [P, 1]
        far3 = jnp.broadcast_to(farthest[:, None, :], (P, 3, 1)).reshape(3 * P, 1)
        cen = jnp.sum(jnp.where(lane3 == far3, X, 0.0), axis=1, keepdims=True)
        diff = X - cen  # [3P, L]
        d = jnp.sum((diff * diff).reshape(P, 3, L), axis=1)  # [P, L]
        dist = jnp.minimum(dist, d)
        m = jnp.max(dist, axis=1, keepdims=True)  # [P, 1]
        new_far = jnp.min(
            jnp.where(dist == m, lane, n_sub_len), axis=1, keepdims=True
        )
        osel = jax.lax.broadcasted_iota(
            jnp.int32, (n_parallel, npoint_sub), 1
        ) == i
        out_ref[0] = jnp.where(osel, farthest, out_ref[0])
        return dist, new_far

    # padded tail (beyond each subset's real length) starts at -1 so it can
    # never win the argmax
    dist0 = jnp.where(lane < n_real_s, jnp.float32(_BIG), jnp.float32(-1.0))
    far0 = jnp.minimum(
        jnp.full((n_parallel, 1), start, jnp.int32),
        jnp.max(jnp.where(lane < n_real_s, lane, 0), axis=1, keepdims=True),
    )
    lax.fori_loop(0, npoint_sub, body, (dist0, far0))


@functools.partial(jax.jit, static_argnums=(1, 3))
def fps_pallas_interleaved(
    xyz: jax.Array, npoint: int, start_idx: jax.Array | int = 0,
    n_parallel: int = 4,
):
    """Approximate FPS via ``n_parallel`` interleaved greedy chains.

    The cloud splits into strided subsets (global index ``s mod P``); each
    subset runs an independent greedy FPS for ``npoint / P`` picks and the
    selections interleave iteration-major, preserving approximate prefix
    semantics (the first m outputs are the union of each chain's first
    m/P picks).  ~P x fewer sequential iterations than exact FPS, which is
    latency-bound, at a small uniformity cost (each chain sees a random
    1/P subset).  `[B, N, 3] -> [B, npoint]` int32.
    """
    xyz = lax.stop_gradient(xyz)
    B, N, C = xyz.shape
    P = n_parallel
    assert C == 3 and npoint % P == 0
    npoint_sub = npoint // P
    # pad N so each subset's length is a lane multiple
    n_pad = (-N) % (128 * P)
    if n_pad:
        xyz = jnp.pad(xyz, ((0, 0), (0, n_pad), (0, 0)), constant_values=1e15)
    Np = N + n_pad
    L = Np // P
    # strided subsets: [B, Np, 3] -> [B, L, P, 3] -> [B, P, 3, L]
    xs = jnp.transpose(xyz.reshape(B, L, P, 3), (0, 2, 3, 1))
    start = jnp.broadcast_to(
        jnp.asarray(start_idx, jnp.int32) // P, (B,)
    )

    kernel = functools.partial(
        _fps_interleaved_kernel, nsub=P, n_sub_len=L, n_real=N,
        n_parallel=P, npoint_sub=npoint_sub,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, P, 3, L), lambda b, start: (b, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, P, npoint_sub), lambda b, start: (b, 0, 0)),
    )
    local = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, P, npoint_sub), jnp.int32),
    )(start, xs)
    # subset-local -> global indices, interleaved iteration-major
    glob = local * P + jnp.arange(P, dtype=jnp.int32)[None, :, None]
    return jnp.transpose(glob, (0, 2, 1)).reshape(B, npoint)


@functools.partial(jax.jit, static_argnums=(1, 3))
def fps_pallas(xyz: jax.Array, npoint: int, start_idx: jax.Array | int = 0,
               interpret=False):
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
        interpret=interpret,
    )(start, xyz_t)
    return out[:, 0, :]
