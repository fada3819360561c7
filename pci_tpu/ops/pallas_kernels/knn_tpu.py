"""Fused distance + top-k kNN kernel for TPU (Pallas).

One kernel computes squared distances tile-by-tile and keeps a bucketed
candidate set in VMEM, so the ``[S, N]`` distance matrix never
materializes in HBM.  The algorithm is the hardware TopK recipe:

  1. the whole key cloud ([3, N] transposed layout, 200KB at 16k points)
     rides along each query-tile grid step; key tiles loop in-kernel,
  2. ``d = sum_c (p_c - q_c)^2`` elementwise on the VPU after an
     in-kernel [3, TK] -> [TK, 3] transpose.  A matmul formulation is
     output-bound on the MXU at tiny K (128 outputs/cycle -> 34ms floor
     at 64k x 64k regardless of precision, measured); the VPU form is
     ~4x faster and exact fp32 (no bf16 cancellation),
  3. each length-``L`` key bucket reduces to its min (+ local argmin)
     into a VMEM candidate buffer — one reduction via packed sort keys
     (index bits stolen from the fp32 mantissa LSBs),
  4. select the k smallest among the ``N/L`` bucket minima (k packed
     min-extraction passes; ranking quantized to the stolen bits,
     ~2^-13 relative at 16k — can only swap near-exact ties.  Emitted
     distances carry the same quantization; consumers needing exact
     values (chamfer, 3-NN weights) recompute from the indices).

Layout: keys on the major (sublane) axis, queries on lanes — Mosaic can
split a major axis in a reshape but not the 128-lane minor axis, and all
reductions run over key buckets.

Bucketing makes the result approximate exactly like ``lax.approx_min_k``:
two true neighbors sharing a bucket lose one candidate (expected recall
``~1 - (k-1)*L/(2N)``, measured 0.994 at k=4/L=16/N=3k).  The global
nearest neighbor is always exact (the min of its bucket is the min).

Supports per-batch *prefix masking* (``valid_n``): key positions
``>= valid_n`` get a sentinel distance — what adaptive fusion needs
(ops.knn_prefix).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tunables: query tile (lanes), key tile (sublanes), bucket length.
# TQ=512 measured fastest at 16k x 16k (3.6ms vs 4.9ms at TQ=128): wider
# query tiles amortize the lane-padded key-block DMAs.
TQ = 512
TK = 2048
L = 16

_BIG = 1e30  # python float: safe to close over inside the kernel


def _knn_kernel(valid_ref, qt_ref, p_ref, out_d_ref, out_i_ref,
                cand_d, cand_i, *, k, n, l, masked):
    """Grid: (B, S // TQ) — the whole key cloud rides along per step.

    qt_ref: [1, 3, TQ] query tile, transposed (rows = x, y, z).
    p_ref:  [1, 3, N] key cloud, transposed — 200KB of VMEM at 16k
            points, so the whole cloud stays resident and key tiles loop
            INSIDE the kernel.  The [N, 3] layout would pad 3 lanes to
            128 (42x VMEM/DMA waste).
    cand_*: [N // l, TQ] bucket minima scratch.

    Distance: per key tile, transpose [3, TK] -> [TK, 3] (cheap Mosaic
    relayout) and accumulate (p_c - q_c)^2 on the VPU.  Exact fp32; a
    K~8 MXU matmul is output-bound (measured 40ms at 64k x 64k vs ~10ms
    elementwise) and single-pass bf16 would corrupt ranking.
    """
    nb_total = n // l
    nb_tile = TK // l
    b = pl.program_id(0)
    valid_n = valid_ref[b]

    def key_tile(j, _):
        # fori_loop (not an unrolled python loop): Mosaic must reuse the
        # [TK, TQ] buffers across iterations or VMEM blows past 128MB
        p = jnp.transpose(p_ref[0, :, pl.ds(j * TK, TK)])  # [TK, 3]
        d = jnp.zeros((TK, TQ), jnp.float32)
        for c in range(3):
            diff = p[:, c][:, None] - qt_ref[0, c, :][None, :]
            d = d + diff * diff

        if masked:
            # prefix mask: global key index >= valid_n -> sentinel.
            # Statically skipped for unmasked callers (transformer, plain
            # kNN, chamfer); padding is excluded by far-away coords.
            gidx = jax.lax.broadcasted_iota(jnp.int32, (TK, TQ), 0) + j * TK
            d = jnp.where(gidx < valid_n, d, _BIG)

        # bucket reduce over keys via PACKED SORT KEYS: non-negative fp32
        # bitcast to int32 is order-preserved, so stealing the log2(l)
        # mantissa LSBs for the in-bucket index folds min and argmin into
        # ONE reduction (the unpacked form needed two more [TK, TQ]
        # passes: an equality compare and a masked iota-min).
        bits = jax.lax.bitcast_convert_type(d, jnp.int32)
        loc = jax.lax.broadcasted_iota(jnp.int32, (nb_tile, l, TQ), 1)
        keys = (bits.reshape(nb_tile, l, TQ) & ~(l - 1)) | loc
        bmin = jnp.min(keys, axis=1)  # [nb_tile, TQ]: dist + local argmin
        base = jax.lax.broadcasted_iota(jnp.int32, (nb_tile, TQ), 0) * l + j * TK
        cand_d[pl.ds(j * nb_tile, nb_tile), :] = bmin
        cand_i[pl.ds(j * nb_tile, nb_tile), :] = base + (bmin & (l - 1))
        return 0

    lax.fori_loop(0, n // TK, key_tile, 0)

    # top-k extraction over candidate buckets, candidate ROW packed into
    # the low key bits (the local-argmin bits are spent — cand_i holds the
    # global index), so each round's winner is unique and found with one
    # min + one compare instead of min + compare + masked argmin.
    # Emitted distances are quantized to ~2^-(23 - log2(nb_total))
    # relative (masked LSBs); every consumer that needs exact distances
    # (chamfer loss, 3-NN weights) recomputes them from idx.
    row = jax.lax.broadcasted_iota(jnp.int32, (nb_total, TQ), 0)
    rbits = max((nb_total - 1).bit_length(), (l - 1).bit_length())
    ck = (cand_d[...] & ~((1 << rbits) - 1)) | row
    ci = cand_i[...]
    for jj in range(k):
        m = jnp.min(ck, axis=0)  # [TQ] unique winner (row in LSBs)
        sel = ck == m[None, :]
        out_d_ref[0, :, jj] = jax.lax.bitcast_convert_type(
            m & ~((1 << rbits) - 1), jnp.float32
        )
        out_i_ref[0, :, jj] = jnp.sum(jnp.where(sel, ci, 0), axis=0)
        ck = jnp.where(sel, jnp.iinfo(jnp.int32).max, ck)


@functools.partial(jax.jit, static_argnums=(2, 4, 5))
def knn_pallas(
    query: jax.Array, points: jax.Array, k: int,
    valid_n: jax.Array | None = None, bucket: int = L,
    interpret=False,
):
    """Batched fused kNN.

    Args:
      query: ``[B, S, 3]`` (S padded to a multiple of 128 internally).
      points: ``[B, N, 3]`` (N padded to a multiple of 2048 internally).
      k: neighbor count (static, <= 128).
      valid_n: optional ``[B]`` int32 — only key positions < valid_n are
        eligible (prefix masking for adaptive fusion).
      bucket: bucket length (static); 16 gives ~0.985 recall at k=32.

    Returns:
      ``(sq_dists [B, S, k], idx [B, S, k])`` ascending.
    """
    query = lax.stop_gradient(query)
    points = lax.stop_gradient(points)
    B, S, C = query.shape
    _, N, _ = points.shape
    assert C == 3, "xyz clouds only"

    s_pad = (-S) % TQ
    n_pad = (-N) % TK
    if s_pad:
        query = jnp.pad(query, ((0, 0), (0, s_pad), (0, 0)))
    if n_pad:
        # pad keys far away; also excluded via valid_n masking below
        points = jnp.pad(points, ((0, 0), (0, n_pad), (0, 0)), constant_values=1e15)
    Np = N + n_pad

    # transposed layouts (see kernel docstring)
    q_t = jnp.swapaxes(query, 1, 2)  # [B, 3, S+pad]
    p_t = jnp.swapaxes(points, 1, 2)  # [B, 3, Np]

    if valid_n is None:
        valid = jnp.full((B,), N, jnp.int32)
    else:
        valid = jnp.minimum(valid_n.astype(jnp.int32), N).reshape(B)

    kernel = functools.partial(
        _knn_kernel, k=k, n=Np, l=bucket, masked=valid_n is not None
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, (S + s_pad) // TQ),
        in_specs=[
            pl.BlockSpec((1, 3, TQ), lambda b, i, valid: (b, 0, i)),
            pl.BlockSpec((1, 3, Np), lambda b, i, valid: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, TQ, k), lambda b, i, valid: (b, i, 0)),
            pl.BlockSpec((1, TQ, k), lambda b, i, valid: (b, i, 0)),
        ],
        scratch_shapes=[
            # packed int32 sort keys (bitcast fp32 distances + index bits)
            pltpu.VMEM((Np // bucket, TQ), jnp.int32),
            pltpu.VMEM((Np // bucket, TQ), jnp.int32),
        ],
    )
    out_d, out_i = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, S + s_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((B, S + s_pad, k), jnp.int32),
        ],
        # candidate scratch + packed extraction temporaries overflow the
        # default 16MB scoped-VMEM budget at 16k+ keys
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(valid, q_t, p_t)
    return out_d[:, :S], out_i[:, :S]
