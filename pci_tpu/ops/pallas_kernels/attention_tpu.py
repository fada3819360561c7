"""Fused point-transformer vector-attention tail (Pallas TPU).

The transformer block's cost after the kNN + K/V gather is a chain of
per-neighbor MLPs over ``[B, N, k, d]`` tensors (reference math:
/root/reference/Utils/Layers.py:405-443):

    pos  = W_d1 @ relu(W_d0 @ delta)        # positional encoding
    attn = W_g1 @ relu(W_g0 @ (q - K + pos))
    res  = sum_k softmax_k(attn / sqrt(d)) * (V + pos)

In XLA every matmul boundary materializes a ``[N, k, d]`` tensor in HBM
(~134 MB each in bf16 at 64k x 16 x 64; the fp32 softmax doubles it) —
measured ~6 ms of tail per layer at 65k points.  The FLOPs are trivial
(~36 GFLOP).  This kernel streams one query tile at a time, computes the
whole tail with intermediates resident in VMEM, and writes only the
``[N, d]`` result: HBM traffic drops to reading q/K/V/delta once.
Measured alone: 0.77 ms @64k.

Layout notes (measured dead ends):
  * inputs stay in the natural n-major ``[B, N, k, .]`` order — a
    k-major relayout needs a [.., k, 3]-style transpose whose tiny minor
    axes are pathological on TPU (~14 ms at 64k, eating the entire win);
  * the k axis merges into the ROW axis of one big matmul per MLP layer
    (static major-axis reshape): a per-slot fori of [TQN, d] matmuls
    was no faster than the XLA chain (31 ms — MXU underutilized).

Softmax runs per (query, channel) over the k axis (the reference's
``dim=-2``) in fp32 (policy contract).  Matmuls accumulate in fp32 —
slightly MORE precise than the XLA bf16 path, which rounds to bf16
between layers.

Eval-path only: the XLA expression remains the training path (this
kernel defines no VJP) and the CPU path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TQN = 512  # queries per grid step


def _attn_kernel(q_ref, g_ref, delta_ref, wd0, bd0, wd1, bd1, wg0, bg0,
                 wg1, bg1, out_ref, *, k, d):
    """Grid: (B, N // TQN).

    q_ref [1, TQN, d] bf16; g_ref [1, TQN, k, 2d] bf16 (K|V);
    delta_ref [1, TQN, k, 3] fp32; weights [*, d] fp32 (+ [1, d]
    biases); out [1, TQN, d] fp32.
    """
    f32 = jnp.float32
    q = q_ref[0].astype(f32)  # [TQN, d]
    tq = q.shape[0]
    rows = tq * k  # row order (query, slot) — major-axis merges only

    def mm(x, w):
        return jax.lax.dot_general(
            x, w[...], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )

    dlt = delta_ref[0].reshape(rows, 3)
    pos = mm(jnp.maximum(mm(dlt, wd0) + bd0[...], 0.0), wd1) + bd1[...]
    row = g_ref[0].reshape(rows, 2 * d).astype(f32)
    kf = row[:, :d]
    vf = row[:, d:]
    qk = jnp.broadcast_to(q[:, None, :], (tq, k, d)).reshape(rows, d)
    h = qk - kf + pos
    a = mm(jnp.maximum(mm(h, wg0) + bg0[...], 0.0), wg1) + bg1[...]

    a3 = a.reshape(tq, k, d)
    vp3 = (vf + pos).reshape(tq, k, d)
    inv_sqrt_d = 1.0 / (d ** 0.5)
    m = jnp.max(a3, axis=1, keepdims=True)
    e = jnp.exp((a3 - m) * inv_sqrt_d)
    out_ref[0] = jnp.sum(e * vp3, axis=1) / jnp.sum(e, axis=1)


@functools.partial(jax.jit, static_argnums=(11,))
def fused_vector_attention(
    q, g, delta, wd0, bd0, wd1, bd1, wg0, bg0, wg1, bg1, interpret=False
):
    """``res [B, N, d]`` of the vector-attention tail (see module doc).

    q ``[B, N, d]``; g ``[B, N, k, 2d]`` gathered ``[K | V]``;
    delta ``[B, N, k, 3]`` neighbor offsets (``query - neighbor``, same
    input the XLA expression feeds fc_delta).
    N is padded to the 512-query grain here (zero rows: the softmax of
    an all-zero tile is uniform — finite — and the rows are sliced off);
    d must be a multiple of 8.
    """
    B, N, d = q.shape
    k = g.shape[2]
    n_pad = (-N) % TQN
    if n_pad:
        q = jnp.pad(q, ((0, 0), (0, n_pad), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, n_pad), (0, 0), (0, 0)))
        delta = jnp.pad(delta, ((0, 0), (0, n_pad), (0, 0), (0, 0)))
        out = fused_vector_attention(
            q, g, delta, wd0, bd0, wd1, bd1, wg0, bg0, wg1, bg1,
            interpret,
        )
        return out[:, :N]
    assert N % TQN == 0, N
    biases = [b.reshape(1, -1).astype(jnp.float32)
              for b in (bd0, bd1, bg0, bg1)]
    ws = [w.astype(jnp.float32) for w in (wd0, wd1, wg0, wg1)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B, N // TQN),
        in_specs=[
            pl.BlockSpec((1, TQN, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, TQN, k, 2 * d), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, TQN, k, 3), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec(ws[0].shape, lambda b, i: (0, 0)),
            pl.BlockSpec(biases[0].shape, lambda b, i: (0, 0)),
            pl.BlockSpec(ws[1].shape, lambda b, i: (0, 0)),
            pl.BlockSpec(biases[1].shape, lambda b, i: (0, 0)),
            pl.BlockSpec(ws[2].shape, lambda b, i: (0, 0)),
            pl.BlockSpec(biases[2].shape, lambda b, i: (0, 0)),
            pl.BlockSpec(ws[3].shape, lambda b, i: (0, 0)),
            pl.BlockSpec(biases[3].shape, lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TQN, d), lambda b, i: (b, i, 0)),
    )
    return pl.pallas_call(
        functools.partial(_attn_kernel, k=k, d=d),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, N, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        q.astype(jnp.bfloat16), g.astype(jnp.bfloat16),
        delta.astype(jnp.float32),
        ws[0], biases[0], ws[1], biases[1],
        ws[2], biases[2], ws[3], biases[3],
    )
