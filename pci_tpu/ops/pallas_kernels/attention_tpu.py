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


# ---------------------------------------------------------------------------
# Training path: fused forward + flash-style recompute backward.
#
# The XLA train tail materializes every [B, N, k, d] intermediate in HBM
# twice (forward store + backward read) — at the ISAPCInet f2 protocol the
# transformer runs on the 2f*N = 64000-point flow cloud, so the tail's
# backward is ~10 HBM passes of ~260 MB each.  This VJP recomputes the
# forward INSIDE the backward kernel per 512-query tile (intermediates
# VMEM-resident, like the eval kernel) and emits dq/dg/ddelta blocks plus
# weight/bias grads accumulated across the grid (constant-index output
# blocks, matmul-k-loop pattern).
#
# Precision: fp32 throughout (no bf16 input cast — gradients follow the
# caller's policy; matmuls accumulate fp32 like the forward kernel).
# ---------------------------------------------------------------------------


def _attn_bwd_kernel(q_ref, g_ref, delta_ref, wd0, bd0, wd1, bd1, wg0,
                     bg0, wg1, bg1, gout_ref,
                     dq_ref, dg_ref, ddelta_ref, dwd0, dbd0, dwd1, dbd1,
                     dwg0, dbg0, dwg1, dbg1, *, k, d):
    """Grid: (B, N // TQN).  Recomputes the tile's forward, then walks
    the chain rule back; weight/bias grads += into constant blocks."""
    f32 = jnp.float32

    def mm(x, w):
        return jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())), preferred_element_type=f32,
        )

    def mmT(x, w):  # x @ w.T
        return jax.lax.dot_general(
            x, w, (((1,), (1,)), ((), ())), preferred_element_type=f32,
        )

    def rTx(a, b):  # a.T @ b  (contract rows)
        return jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())), preferred_element_type=f32,
        )

    q = q_ref[0].astype(f32)  # [TQN, d]
    tq = q.shape[0]
    rows = tq * k

    # ---- forward recompute (mirrors _attn_kernel) -------------------
    dlt = delta_ref[0].astype(f32).reshape(rows, 3)
    pre1 = mm(dlt, wd0[...]) + bd0[...]
    r1 = jnp.maximum(pre1, 0.0)
    pos = mm(r1, wd1[...]) + bd1[...]
    row = g_ref[0].reshape(rows, 2 * d).astype(f32)
    kf = row[:, :d]
    vf = row[:, d:]
    qk = jnp.broadcast_to(q[:, None, :], (tq, k, d)).reshape(rows, d)
    h = qk - kf + pos
    pre2 = mm(h, wg0[...]) + bg0[...]
    r2 = jnp.maximum(pre2, 0.0)
    a = mm(r2, wg1[...]) + bg1[...]

    inv_sqrt_d = 1.0 / (d ** 0.5)
    a3 = a.reshape(tq, k, d)
    m = jnp.max(a3, axis=1, keepdims=True)
    e = jnp.exp((a3 - m) * inv_sqrt_d)
    denom = jnp.sum(e, axis=1, keepdims=True)
    s3 = e / denom  # softmax over k, per channel
    vp3 = (vf + pos).reshape(tq, k, d)

    # ---- backward ----------------------------------------------------
    gout = gout_ref[0].astype(f32)  # [TQN, d]
    g3 = gout[:, None, :]  # broadcast over k
    dvp3 = s3 * g3
    ds3 = vp3 * g3
    dz3 = s3 * (ds3 - jnp.sum(s3 * ds3, axis=1, keepdims=True))
    da = (dz3 * inv_sqrt_d).reshape(rows, d)

    # gamma MLP
    dbg1_v = jnp.sum(da, axis=0, keepdims=True)
    dwg1_v = rTx(r2, da)
    dr2 = mmT(da, wg1[...])
    dpre2 = jnp.where(pre2 > 0.0, dr2, 0.0)
    dbg0_v = jnp.sum(dpre2, axis=0, keepdims=True)
    dwg0_v = rTx(h, dpre2)
    dh = mmT(dpre2, wg0[...])

    dvp = dvp3.reshape(rows, d)
    dq_ref[0] = jnp.sum(dh.reshape(tq, k, d), axis=1)
    dkf = -dh
    dpos = dh + dvp  # pos feeds both h and (V + pos)

    # pos MLP
    dbd1_v = jnp.sum(dpos, axis=0, keepdims=True)
    dwd1_v = rTx(r1, dpos)
    dr1 = mmT(dpos, wd1[...])
    dpre1 = jnp.where(pre1 > 0.0, dr1, 0.0)
    dbd0_v = jnp.sum(dpre1, axis=0, keepdims=True)
    dwd0_v = rTx(dlt, dpre1)
    ddlt = mmT(dpre1, wd0[...])  # [rows, 3]

    dg_ref[0] = jnp.concatenate([dkf, dvp], axis=1).reshape(tq, k, 2 * d)
    ddelta_ref[0] = ddlt.reshape(tq, k, 3)

    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _init():
        dwd0[...] = jnp.zeros_like(dwd0)
        dbd0[...] = jnp.zeros_like(dbd0)
        dwd1[...] = jnp.zeros_like(dwd1)
        dbd1[...] = jnp.zeros_like(dbd1)
        dwg0[...] = jnp.zeros_like(dwg0)
        dbg0[...] = jnp.zeros_like(dbg0)
        dwg1[...] = jnp.zeros_like(dwg1)
        dbg1[...] = jnp.zeros_like(dbg1)

    dwd0[...] += dwd0_v
    dbd0[...] += dbd0_v
    dwd1[...] += dwd1_v
    dbd1[...] += dbd1_v
    dwg0[...] += dwg0_v
    dbg0[...] += dbg0_v
    dwg1[...] += dwg1_v
    dbg1[...] += dbg1_v


def _pack_params(wd0, bd0, wd1, bd1, wg0, bg0, wg1, bg1):
    biases = [b.reshape(1, -1).astype(jnp.float32)
              for b in (bd0, bd1, bg0, bg1)]
    ws = [w.astype(jnp.float32) for w in (wd0, wd1, wg0, wg1)]
    return ws, biases


def _wspecs(ws, biases):
    out = []
    for w, b in zip(ws, biases):
        out.append(pl.BlockSpec(w.shape, lambda b_, i: (0, 0)))
        out.append(pl.BlockSpec(b.shape, lambda b_, i: (0, 0)))
    return out


def _attn_fwd_f32(q, g, delta, ws, biases, k, d, interpret):
    B, N, _ = q.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B, N // TQN),
        in_specs=[
            pl.BlockSpec((1, TQN, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, TQN, k, 2 * d), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, TQN, k, 3), lambda b, i: (b, i, 0, 0)),
        ] + _wspecs(ws, biases),
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
    )(q, g, delta,
      ws[0], biases[0], ws[1], biases[1], ws[2], biases[2], ws[3], biases[3])


@functools.partial(jax.custom_vjp, nondiff_argnums=(11,))
def vector_attention_trainable(
    q, g, delta, wd0, bd0, wd1, bd1, wg0, bg0, wg1, bg1, interpret=False
):
    """Differentiable fused vector-attention tail (fp32; see the
    eval-only :func:`fused_vector_attention` for the bf16 eval path).

    Forward = the eval kernel's math without the bf16 input cast;
    backward = one flash-style kernel that recomputes the tile forward in
    VMEM and emits input grads + accumulated weight/bias grads — no
    [B, N, k, d] intermediate ever reaches HBM in either direction.
    """
    out, _ = _vat_fwd(
        q, g, delta, wd0, bd0, wd1, bd1, wg0, bg0, wg1, bg1, interpret
    )
    return out


def _vat_fwd(q, g, delta, wd0, bd0, wd1, bd1, wg0, bg0, wg1, bg1,
             interpret=False):
    B, N, d = q.shape
    k = g.shape[2]
    n_pad = (-N) % TQN
    qp, gp, dp = q, g, delta
    if n_pad:
        qp = jnp.pad(q, ((0, 0), (0, n_pad), (0, 0)))
        gp = jnp.pad(g, ((0, 0), (0, n_pad), (0, 0), (0, 0)))
        dp = jnp.pad(delta, ((0, 0), (0, n_pad), (0, 0), (0, 0)))
    ws, biases = _pack_params(wd0, bd0, wd1, bd1, wg0, bg0, wg1, bg1)
    qp = qp.astype(jnp.float32)
    gp = gp.astype(jnp.float32)
    dp = dp.astype(jnp.float32)
    out = _attn_fwd_f32(qp, gp, dp, ws, biases, k, d, interpret)
    # dtype carriers: residuals must be jax types, so 0-size arrays
    res = (qp, gp, dp, ws, biases, N,
           jnp.zeros((0,), q.dtype), jnp.zeros((0,), g.dtype),
           jnp.zeros((0,), delta.dtype))
    return out[:, :N], res


def _vat_fwd_rule(q, g, delta, wd0, bd0, wd1, bd1, wg0, bg0, wg1, bg1,
                  interpret):
    out, res = _vat_fwd(
        q, g, delta, wd0, bd0, wd1, bd1, wg0, bg0, wg1, bg1, interpret
    )
    return out, res


def _vat_bwd_rule(interpret, res, gout):
    qp, gp, dp, ws, biases, N, qdt_c, gdt_c, ddt_c = res
    qdt, gdt, ddt = qdt_c.dtype, gdt_c.dtype, ddt_c.dtype
    B, Np, d = qp.shape
    k = gp.shape[2]
    n_pad = Np - N
    gpad = gout.astype(jnp.float32)
    if n_pad:
        gpad = jnp.pad(gpad, ((0, 0), (0, n_pad), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B, Np // TQN),
        in_specs=[
            pl.BlockSpec((1, TQN, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, TQN, k, 2 * d), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, TQN, k, 3), lambda b, i: (b, i, 0, 0)),
        ] + _wspecs(ws, biases) + [
            pl.BlockSpec((1, TQN, d), lambda b, i: (b, i, 0)),
        ],
        out_specs=[
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
    )
    outs = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, k=k, d=d),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, Np, d), jnp.float32),
            jax.ShapeDtypeStruct((B, Np, k, 2 * d), jnp.float32),
            jax.ShapeDtypeStruct((B, Np, k, 3), jnp.float32),
            jax.ShapeDtypeStruct(ws[0].shape, jnp.float32),
            jax.ShapeDtypeStruct(biases[0].shape, jnp.float32),
            jax.ShapeDtypeStruct(ws[1].shape, jnp.float32),
            jax.ShapeDtypeStruct(biases[1].shape, jnp.float32),
            jax.ShapeDtypeStruct(ws[2].shape, jnp.float32),
            jax.ShapeDtypeStruct(biases[2].shape, jnp.float32),
            jax.ShapeDtypeStruct(ws[3].shape, jnp.float32),
            jax.ShapeDtypeStruct(biases[3].shape, jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(qp, gp, dp,
      ws[0], biases[0], ws[1], biases[1], ws[2], biases[2], ws[3],
      biases[3], gpad)
    # cotangent dtypes must match the primals (bf16 policy callers)
    dq = outs[0][:, :N].astype(qdt)
    dg = outs[1][:, :N].astype(gdt)
    ddelta = outs[2][:, :N].astype(ddt)
    dwd0, dbd0, dwd1, dbd1, dwg0, dbg0, dwg1, dbg1 = outs[3:]
    return (dq, dg, ddelta, dwd0, dbd0.reshape(-1), dwd1,
            dbd1.reshape(-1), dwg0, dbg0.reshape(-1), dwg1,
            dbg1.reshape(-1))


vector_attention_trainable.defvjp(_vat_fwd_rule, _vat_bwd_rule)
