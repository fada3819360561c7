"""Cell-pruned kNN for large clouds (Pallas TPU).

The flat kernel (knn_tpu.py) computes every query-tile x key-tile distance
block: O(S*N) VPU work — 19.5 ms for 64k x 64k (the dominant block of
ISAPCInet field=2, whose transformer runs self-kNN on the concatenated
2f*N = 65,536-point flow cloud).  Almost all of that work ranks keys that
are nowhere near the query.  This kernel prunes it IVF-style, with the
TPU twist that the "inverted lists" are static-shape contiguous slices:

  1. XLA side: Morton-sort the cloud (10 bits/axis z-order) so spatially
     close points sit in nearby rows; split sorted keys into contiguous
     chunks of ``C``; per-chunk AABBs by reshape-reduce.
  2. XLA side: for every TQ-row tile of sorted queries, rank chunks by
     tile-AABB -> chunk-AABB squared lower-bound distance and keep the
     ``M`` nearest chunk ids (a [S/TQ, n_chunks] top-k — trivially small).
  3. Kernel: per query tile, loop its M chunk ids (scalar-prefetched),
     dynamic-slice each chunk off the resident [3, N] sorted cloud,
     VPU distance tiles, packed-sort-key bucket minima (knn_tpu.py
     recipe), then k min-extraction rounds over the M*C/l candidates.

Original-index bookkeeping rides THROUGH the kernel: the sort permutation
is passed as a per-key payload channel and the bucket phase tracks the
argmin's payload exactly like the fusion kernel tracks coordinates, so
emitted indices are already in original key order (no 1M-element host
remap).  Only the output rows need un-permuting (one [N, k] row gather).

Approximation: on top of the bucket grain (same as knn_tpu.py), a true
neighbor in a chunk whose BOX lower bound ranks > M is lost.  With morton
chunks of 256 and M covering ~10% of the cloud, measured recall on
LiDAR-like data is >= 0.97 (tests/test_pallas_tpu.py pins it); the
nearest neighbor is exact whenever its chunk is selected — its lower
bound is <= its true distance, so it can only be pruned if M-1 other
chunks BOX-dominate it.

Prefix restriction (the adaptive-fusion case) is supported via the
``key_valid`` mask: validity rides the sort as a payload channel, chunk
AABBs cover valid keys only, and the kernel pushes invalid keys to the
sentinel before the bucket minima.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TQ = 128  # default query tile; see ``tile`` arg of :func:`knn_cells`
_BIG = 1e30
_IMAX = jnp.iinfo(jnp.int32).max


def _spread3(v):
    """Spread 10 bits of v to bit positions 0, 3, 6, ... 27 (int32)."""
    v = v & 0x3FF
    v = (v | (v << 16)) & 0x30000FF
    v = (v | (v << 8)) & 0x300F00F
    v = (v | (v << 4)) & 0x30C30C3
    v = (v | (v << 2)) & 0x9249249
    return v


def morton_codes(points: jax.Array) -> jax.Array:
    """[B, N, 3] -> [B, N] int32 z-order codes on a per-batch 1024^3 grid."""
    lo = jnp.min(points, axis=1, keepdims=True)
    hi = jnp.max(points, axis=1, keepdims=True)
    scale = 1024.0 / jnp.maximum(hi - lo, 1e-6)
    q = jnp.clip((points - lo) * scale, 0.0, 1023.0).astype(jnp.int32)
    return (
        _spread3(q[..., 0])
        | (_spread3(q[..., 1]) << 1)
        | (_spread3(q[..., 2]) << 2)
    )


def _sort_by_morton(points, n_pad):
    """Returns (sorted+padded points [B, Np, 3], perm [B, Np] int32).

    Padding rows get far-away coords (+1e15) and perm id N (clipped by
    callers); they sort to the tail and their chunks are never selected.
    """
    B, N, _ = points.shape
    perm = jnp.argsort(morton_codes(points), axis=-1).astype(jnp.int32)
    pts = jnp.take_along_axis(points, perm[..., None], axis=1)
    if n_pad:
        pts = jnp.pad(
            pts, ((0, 0), (0, n_pad), (0, 0)), constant_values=1e15
        )
        perm = jnp.pad(perm, ((0, 0), (0, n_pad)), constant_values=N)
    return pts, perm


def _chunk_boxes(pts, C, valid=None):
    """[B, Np, 3] -> ([B, nc, 3] lo, [B, nc, 3] hi) per length-C chunk.

    ``valid`` [B, Np] bool masks pad rows out of the boxes: a pad row's
    +1e15 coords would otherwise inflate the tail chunk's AABB to cover
    all space (lower bound 0 to every tile — measured on real LiDAR it
    burns a selection slot on garbage every tile).  An all-pad chunk gets
    an inverted (+BIG, -BIG) box whose lower bound is ~BIG^2 — never
    selected.
    """
    B, Np, _ = pts.shape
    r = pts.reshape(B, Np // C, C, 3)
    if valid is None:
        return jnp.min(r, axis=2), jnp.max(r, axis=2)
    v = valid.reshape(B, Np // C, C, 1)
    lo = jnp.min(jnp.where(v, r, _BIG), axis=2)
    hi = jnp.max(jnp.where(v, r, -_BIG), axis=2)
    return lo, hi


def _box_lb(qlo, qhi, klo, khi):
    """Squared AABB-AABB lower-bound distance.

    qlo/qhi: [B, T, 3]; klo/khi: [B, nc, 3] -> [B, T, nc].
    """
    gap = jnp.maximum(
        0.0,
        jnp.maximum(
            qlo[:, :, None, :] - khi[:, None, :, :],
            klo[:, None, :, :] - qhi[:, :, None, :],
        ),
    )
    return jnp.sum(gap * gap, axis=-1)


def _cells_kernel(chunks_ref, qt_ref, p_ref, ids_ref, *refs,
                  k, l, C, M, tq, emit_resi, winners, masked=False):
    """Grid: (B, S // TQ).

    chunks_ref: scalar-prefetch [B * S_tiles * M] int32 chunk ids.
    qt_ref [1, 3, tq] sorted-query tile; p_ref [1, 3, Np] sorted keys;
    ids_ref [1, 1|2, Np] original key indices (the sort permutation);
    when ``masked``, row 1 carries per-key validity (0/1) and invalid
    keys are pushed to ``_BIG`` before the bucket minima (the
    segment-restricted fusion kNN — see ``key_valid`` of knn_cells).
    outs: d [1, tq, k], idx [1, tq, k], [resi [1, 3, tq, k]].
    scratch: cand_k / cand_i [winners * M * C // l, tq]
    (+ cand_x/y/z if emit_resi).
    """
    n_out = 2 + int(emit_resi)
    outs, rest = refs[:n_out], refs[n_out:]
    if emit_resi:
        cand_k, cand_i, cand_x, cand_y, cand_z = rest
    else:
        cand_k, cand_i = rest

    nb_chunk = C // l
    b = pl.program_id(0)
    it = pl.program_id(1)
    s_tiles = pl.num_programs(1)
    base = (b * s_tiles + it) * M

    def chunk_step(m, _):
        start = chunks_ref[base + m] * C
        p = jnp.transpose(p_ref[0, :, pl.ds(start, C)])  # [C, 3]
        d = jnp.zeros((C, tq), jnp.float32)
        for c in range(3):
            diff = p[:, c][:, None] - qt_ref[0, c, :][None, :]
            d = d + diff * diff
        if masked:
            val = jnp.transpose(ids_ref[0, 1:2, pl.ds(start, C)])  # [C, 1]
            d = jnp.where(val > 0, d, _BIG)

        # packed bucket argmin (knn_tpu.py recipe): fp32 bitcast int32 is
        # order-preserving for d >= 0; steal log2(l) LSBs for the local id.
        # STRIDED bucket membership (row a*nb_chunk + b -> bucket b): the
        # keys are Morton-SORTED, so the true top-k form consecutive runs —
        # consecutive grouping would collapse a whole run into one bucket
        # winner (measured recall 0.32); striding spreads a run of up to
        # nb_chunk consecutive rows across distinct buckets.
        bits = lax.bitcast_convert_type(d, jnp.int32)
        loc = lax.broadcasted_iota(jnp.int32, (l, nb_chunk, tq), 0)
        keys = (bits.reshape(l, nb_chunk, tq) & ~(l - 1)) | loc
        # original-id payload tracking (beats a 1M-row host-side remap).
        # transpose [1, C] -> [C, 1] first: C arrives on the 128-lane
        # minor axis and Mosaic reshapes may only split MAJOR axes.
        idv = jnp.transpose(ids_ref[0, 0:1, pl.ds(start, C)])  # [C, 1]
        id3 = idv.reshape(l, nb_chunk, 1)
        p3 = p.reshape(l, nb_chunk, 3) if emit_resi else None
        for w in range(winners):
            bmin = jnp.min(keys, axis=0)  # [nb_chunk, TQ]
            local = bmin & (l - 1)
            oh = loc == local[None, :, :]  # exact one-hot (index tie-break)
            isel = jnp.sum(jnp.where(oh, id3, 0), axis=0)
            sl = pl.ds((m * winners + w) * nb_chunk, nb_chunk)
            cand_k[sl, :] = bmin
            cand_i[sl, :] = isel
            if emit_resi:
                cand_x[sl, :] = jnp.sum(jnp.where(oh, p3[:, :, 0][..., None], 0.0), axis=0)
                cand_y[sl, :] = jnp.sum(jnp.where(oh, p3[:, :, 1][..., None], 0.0), axis=0)
                cand_z[sl, :] = jnp.sum(jnp.where(oh, p3[:, :, 2][..., None], 0.0), axis=0)
            if w + 1 < winners:
                # mask the winner lane; every packed key is unique (loc in
                # the LSBs), so exactly one lane per bucket is removed
                keys = jnp.where(oh, _IMAX, keys)
        return 0

    lax.fori_loop(0, M, chunk_step, 0)

    # k extraction rounds with the candidate row packed into the low bits
    nb_total = M * nb_chunk * winners
    row = lax.broadcasted_iota(jnp.int32, (nb_total, tq), 0)
    rbits = max((nb_total - 1).bit_length(), (l - 1).bit_length())
    ck = (cand_k[...] & ~((1 << rbits) - 1)) | row
    ci = cand_i[...]
    if emit_resi:
        cx, cy, cz = cand_x[...], cand_y[...], cand_z[...]
        qx, qy, qz = qt_ref[0, 0, :], qt_ref[0, 1, :], qt_ref[0, 2, :]
        rx = jnp.zeros((tq, k), jnp.float32)
        ry = jnp.zeros((tq, k), jnp.float32)
        rz = jnp.zeros((tq, k), jnp.float32)
    kiota = lax.broadcasted_iota(jnp.int32, (tq, k), 1)
    od = jnp.zeros((tq, k), jnp.float32)
    oi = jnp.zeros((tq, k), jnp.int32)
    for jj in range(k):
        m = jnp.min(ck, axis=0)
        sel = ck == m[None, :]
        upd = kiota == jj
        dv = lax.bitcast_convert_type(m & ~((1 << rbits) - 1), jnp.float32)
        od = jnp.where(upd, dv[:, None], od)
        iv = jnp.sum(jnp.where(sel, ci, 0), axis=0)
        oi = jnp.where(upd, iv[:, None], oi)
        if emit_resi:
            rx = jnp.where(upd, (jnp.sum(jnp.where(sel, cx, 0.0), axis=0) - qx)[:, None], rx)
            ry = jnp.where(upd, (jnp.sum(jnp.where(sel, cy, 0.0), axis=0) - qy)[:, None], ry)
            rz = jnp.where(upd, (jnp.sum(jnp.where(sel, cz, 0.0), axis=0) - qz)[:, None], rz)
        ck = jnp.where(sel, _IMAX, ck)

    outs[0][0] = od
    outs[1][0] = oi
    if emit_resi:
        outs[2][0, 0] = rx
        outs[2][0, 1] = ry
        outs[2][0, 2] = rz


def knn_cells(
    query: jax.Array, points: jax.Array, k: int,
    chunk: int = 512, m_chunks: int = 12, bucket: int = 16,
    emit_resi: bool = False, winners: int = 2, tile: int = TQ,
    key_valid: jax.Array | None = None, interpret=False,
):
    """Cell-pruned kNN of ``query`` into ``points``.

    Args:
      query: ``[B, S, 3]``; points: ``[B, N, 3]`` (shared sort when the
        same array object is passed for both — the self-kNN case).
      k: neighbor count (static).
      chunk: contiguous sorted-key chunk length (static, multiple of 128).
      m_chunks: chunks scanned per query tile (static); work scales with
        ``m_chunks * chunk`` instead of N.
      bucket: in-chunk bucket length (power of two).
      emit_resi: also return exact fp32 ``neighbor - query`` residuals
        ``[B, S, k, 3]`` (skips the caller's xyz gather).
      winners: bucket candidates kept per min-phase (1 or 2).  Buckets
        stride the sorted chunk, but Morton-sorting still concentrates a
        query's true top-k; with 2 winners a neighbor is lost only when
        THREE true neighbors collide in one bucket (measured: 1 winner
        caps recall at ~0.91 on clustered 16k clouds regardless of M,
        2 winners clears 0.97).
      tile: query rows ranked + processed together (static, multiple of
        128, <= chunk).  Smaller tiles give TIGHTER query AABBs and
        per-tile chunk lists, which is where the recall lives on real
        LiDAR (measured 64k prune-recall at the same 6144-key budget:
        tile 512 -> 0.96, tile 128 -> 0.99); per-query distance work is
        tile-invariant, only the grid gets deeper.
      key_valid: optional ``[B, N]`` bool — restrict neighbors to keys
        where True (the segment-restricted fusion kNN: the adaptive
        fusion head queries the combined cloud against each PREFIX
        segment; a prefix in original order is not contiguous in sorted
        order, so validity rides the sort as a per-key payload).  Chunk
        AABBs cover only valid keys, so chunk ranking spends its ``M``
        budget on chunks that actually hold segment keys.  When a query
        tile finds fewer than k valid candidates, surplus slots emit
        sentinel distances ``>= 1e29`` (callers replace them — see
        nn/fusion.py's self-neighbor convention).
      interpret: run under the TPU-faithful Pallas interpreter (CPU
        tests); pass ``pltpu.InterpretParams()`` for strict mode.

    Returns:
      ``(sq_dists [B, S, k], idx [B, S, k][, resi])`` ascending by
      (quantized) distance; idx in ORIGINAL key order.  Distances carry
      the packed-key quantization (consumers recompute exact values from
      idx — ops/knn.py contract).
    """
    # self-ness MUST be resolved before the jit boundary: inside a jitted
    # function each parameter binds a fresh tracer, so ``query is points``
    # is always False there (measured on real LiDAR: the self-chunk
    # guarantee silently never applied; 256/16000 queries lost their own
    # point).  Detected here (works both at top level and when called
    # from an enclosing jit, where the caller passes the same tracer) and
    # passed down as a static flag.
    return _knn_cells_impl(
        query, points, k, chunk, m_chunks, bucket, emit_resi, winners,
        tile, query is points, key_valid, interpret,
    )


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7, 8, 9, 11))
def _knn_cells_impl(
    query, points, k, chunk, m_chunks, bucket, emit_resi, winners, tile,
    self_knn, key_valid=None, interpret=False,
):
    query = lax.stop_gradient(query)
    points = lax.stop_gradient(points)
    B, S, _ = query.shape
    _, N, _ = points.shape
    l, C, M, tq = bucket, chunk, m_chunks, tile
    assert l & (l - 1) == 0 and C % l == 0 and C % 128 == 0
    assert winners in (1, 2)
    assert tq % 128 == 0 and C % tq == 0, (tq, C)

    n_pad = (-N) % C
    p_sorted, perm = _sort_by_morton(points, n_pad)
    nc = (N + n_pad) // C
    M = min(M, nc)

    # self case shares the key sort (Np is a multiple of C, hence of tq)
    if self_knn:
        q_sorted, qperm, s_pad = p_sorted, perm, n_pad
    else:
        s_pad = (-S) % tq
        q_sorted, qperm = _sort_by_morton(query, s_pad)
    Sp = S + s_pad

    # per-tile chunk ranking (tile AABB -> chunk AABB lower bounds),
    # pad rows masked out of every box (see _chunk_boxes)
    kv = perm < N
    if key_valid is not None:
        vs = jnp.take_along_axis(
            key_valid.astype(jnp.int32), jnp.minimum(perm, N - 1), axis=1
        )
        kv = kv & (vs > 0)
    klo, khi = _chunk_boxes(p_sorted, C, kv)
    qlo, qhi = _chunk_boxes(q_sorted, tq, qperm < N if self_knn else
                            (qperm < S))
    lb = _box_lb(qlo, qhi, klo, khi)  # [B, Sp//tq, nc]
    if self_knn:
        # guarantee each tile's own covering chunk is selected: on dense
        # real LiDAR ~10 chunks/tile tie at lower bound 0 and top_k can
        # tie the self chunk OUT (measured: self-point match drops to
        # 0.91).  Rank it at -1, ahead of every non-negative bound.
        n_tiles = Sp // tq
        cover = (jnp.arange(n_tiles, dtype=jnp.int32) * tq) // C
        lb = lb.at[:, jnp.arange(n_tiles), cover].set(-1.0)
    _, chunk_ids = lax.top_k(-lb, M)
    chunk_ids = chunk_ids.astype(jnp.int32).reshape(-1)

    q_t = jnp.swapaxes(q_sorted, 1, 2)  # [B, 3, Sp]
    p_t = jnp.swapaxes(p_sorted, 1, 2)  # [B, 3, Np]
    masked = key_valid is not None
    ids = jnp.minimum(perm, N - 1)[:, None, :]  # [B, 1, Np]
    if masked:  # row 1: per-key validity payload (kv already folds pads)
        ids = jnp.concatenate([ids, kv.astype(jnp.int32)[:, None, :]], axis=1)
    id_rows = ids.shape[1]

    out_specs = [
        pl.BlockSpec((1, tq, k), lambda b, i, s: (b, i, 0)),
        pl.BlockSpec((1, tq, k), lambda b, i, s: (b, i, 0)),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((B, Sp, k), jnp.float32),
        jax.ShapeDtypeStruct((B, Sp, k), jnp.int32),
    ]
    n_cand = winners * M * C // l
    scratch = [pltpu.VMEM((n_cand, tq), jnp.int32)] * 2
    if emit_resi:
        out_specs.append(pl.BlockSpec((1, 3, tq, k), lambda b, i, s: (b, 0, i, 0)))
        out_shapes.append(jax.ShapeDtypeStruct((B, 3, Sp, k), jnp.float32))
        scratch += [pltpu.VMEM((n_cand, tq), jnp.float32)] * 3

    kernel = functools.partial(
        _cells_kernel, k=k, l=l, C=C, M=M, tq=tq, emit_resi=emit_resi,
        winners=winners, masked=masked,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Sp // tq),
        in_specs=[
            pl.BlockSpec((1, 3, tq), lambda b, i, s: (b, 0, i)),
            pl.BlockSpec((1, 3, p_t.shape[-1]), lambda b, i, s: (b, 0, 0)),
            pl.BlockSpec(
                (1, id_rows, p_t.shape[-1]), lambda b, i, s: (b, 0, 0)
            ),
        ],
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    outs = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(chunk_ids, q_t, p_t, ids)

    # un-permute output rows to original query order
    inv = jnp.argsort(qperm[:, :S], axis=-1).astype(jnp.int32)
    d = jnp.take_along_axis(outs[0][:, :S], inv[..., None], axis=1)
    idx = jnp.take_along_axis(outs[1][:, :S], inv[..., None], axis=1)
    if emit_resi:
        r = jnp.transpose(outs[2][:, :, :S], (0, 2, 3, 1))  # [B, Sp->S, k, 3]
        r = jnp.take_along_axis(r, inv[..., None, None], axis=1)
        return d, idx, r
    return d, idx
