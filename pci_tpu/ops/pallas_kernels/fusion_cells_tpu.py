"""Single-pass cell-pruned adaptive fusion kNN (Pallas TPU).

The fusion head's segment-restricted self-kNN at 64k+ points
(/root/reference/Utils/Layers.py:246-271 adaptive kNN; paper Table 6's
65,536-pt protocol row).  The 2-pass route (nn/fusion.py
``_cells_fusion_knn``: one ``key_valid``-masked knn_cells pass per
segment + budget compaction) pays the distance tiles TWICE and runs
``k`` extraction rounds PER SEGMENT (2k total for k1+k2=k outputs).
This kernel does the whole job in ONE pass:

  * Morton sort of the combined cloud (shared by queries and keys —
    self-kNN), per-chunk AABBs computed separately over each SEGMENT's
    keys (segment membership = original index < split, a per-key
    attribute that rides the sort as a payload class channel);
  * per-tile chunk ranking by the UNION lower bound min(lbA, lbB), with
    three force-included chunks — the tile's own covering chunk (the
    self-neighbor guarantee) and each segment's best chunk (so an
    extreme-t segment whose few points live far away is never pruned
    out) — made duplicate-free by masking each forced chunk out of the
    pool before the next argmin/top-k (duplicated chunks would emit the
    same neighbor twice);
  * ONE distance evaluation per scanned chunk, bucketed per segment:
    strided packed-key minima keep ``winners`` candidates per bucket
    PER SEGMENT (a shared winner list would let one segment's dense
    neighbors evict the other's);
  * budgeted extraction: k1 rounds over segment-A candidate rows then
    k - k1 over segment-B rows (dynamic trip counts, exactly k rounds
    total), emitting residuals (+ optional original-index ids) directly
    in output slots [0, k1) / [k1, k) — the pre-merged block, no
    compaction pass outside.

Starved budgets (a segment holds fewer candidates than its budget) emit
zero-residual self-neighbors, matching the flat fused kernel
(fusion_knn_tpu.py) convention.  Ranking is packed-key quantized like
every kernel in this family; emitted residuals are exact fp32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .knn_cells_tpu import _box_lb, _chunk_boxes, _sort_by_morton

_BIG = 1e30
_IMAX = jnp.iinfo(jnp.int32).max


def _fusion_cells_kernel(scal_ref, chunks_ref, qt_ref, p_ref, ids_ref,
                         *refs, k, l, C, M, tq, winners, emit_idx,
                         n_tail=0, n_pay=0):
    """Grid: (B, Sp // tq).

    scal_ref: per batch ``[k1, k2]`` budgets (scalar prefetch).
    chunks_ref: ``[B * S_tiles * M]`` scanned chunk ids (scalar prefetch).
    qt_ref ``[1, 3, tq]`` sorted-query tile; p_ref ``[1, 3, Np]`` sorted
    keys; ids_ref ``[1, 2, Np]``: row 0 original ids, row 1 segment
    class (0 = segment A, 1 = segment B, 2 = pad).
    outs: ([oi [1, tq, k]]?, orr [1, 3, tq, k]).
    scratch: cand_k, cand_i, cand_x/y/z — [2 * winners * M * C // l, tq];
    candidate rows for chunk-scan m are laid out
    ``[((m * 2 + seg) * winners + w) * nb_chunk + bucket]``.

    ``n_tail`` > 0 = ONE-SHOT attention-fusion mode (the flat kernel's
    fusion_knn_tpu recipe): inputs gain [pay [1, n_pay, Np] sorted
    payload rows]? + 2*n_tail folded score-MLP (WT, b) refs, the only
    output is fused [1, 3 + n_pay, tq] (in SORTED order — the wrapper
    un-permutes [B, N, 3+n_pay] instead of a [B, N, k, 3] block), and
    extraction feeds an online softmax.
    """
    pay_ref = None
    i0 = 0
    if n_pay:
        pay_ref = refs[0]
        i0 = 1
    if n_tail:
        wtail = refs[i0: i0 + 2 * n_tail]
        outs = refs[i0 + 2 * n_tail: i0 + 2 * n_tail + 1]
        rest = refs[i0 + 2 * n_tail + 1:]
    else:
        assert not n_pay
        n_out = 1 + int(emit_idx)
        outs, rest = refs[:n_out], refs[n_out:]
    cand_p = None
    if n_pay:
        rest, cand_p = rest[:-1], rest[-1]
    cand_k, cand_i, cand_x, cand_y, cand_z = rest

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
        idv = jnp.transpose(ids_ref[0, 0:1, pl.ds(start, C)])  # [C, 1]
        cls = jnp.transpose(ids_ref[0, 1:2, pl.ds(start, C)])  # [C, 1]

        loc = lax.broadcasted_iota(jnp.int32, (l, nb_chunk, tq), 0)
        id3 = idv.reshape(l, nb_chunk, 1)
        p3 = p.reshape(l, nb_chunk, 3)
        bits_all = lax.bitcast_convert_type(d, jnp.int32)
        cls3 = cls.reshape(l, nb_chunk, 1)
        for seg in range(2):
            # strided buckets (Morton-sorted keys: consecutive grouping
            # collapses a query's neighbor run into one winner).
            # Out-of-segment lanes become EXACT _IMAX sentinels (a _BIG
            # distance would rank as a real far candidate and a starved
            # budget would emit garbage instead of self-neighbors).
            packed = (bits_all.reshape(l, nb_chunk, tq) & ~(l - 1)) | loc
            keys = jnp.where(cls3 == seg, packed, _IMAX)
            for w in range(winners):
                bmin = jnp.min(keys, axis=0)  # [nb_chunk, tq]
                local = bmin & (l - 1)
                oh = loc == local[None, :, :]
                isel = jnp.sum(jnp.where(oh, id3, 0), axis=0)
                sl = pl.ds(
                    (((m * 2 + seg) * winners) + w) * nb_chunk, nb_chunk
                )
                cand_k[sl, :] = bmin
                cand_i[sl, :] = isel
                cand_x[sl, :] = jnp.sum(
                    jnp.where(oh, p3[:, :, 0][..., None], 0.0), axis=0)
                cand_y[sl, :] = jnp.sum(
                    jnp.where(oh, p3[:, :, 1][..., None], 0.0), axis=0)
                cand_z[sl, :] = jnp.sum(
                    jnp.where(oh, p3[:, :, 2][..., None], 0.0), axis=0)
                if n_pay:
                    pt = jnp.transpose(
                        pay_ref[0, :, pl.ds(start, C)]
                    ).reshape(l, nb_chunk, n_pay)
                    nb_all = 2 * winners * M * nb_chunk
                    for ch in range(n_pay):
                        cp = jnp.sum(jnp.where(
                            oh, pt[:, :, ch][..., None], 0.0), axis=0)
                        cand_p[pl.ds(
                            ch * nb_all
                            + (((m * 2 + seg) * winners) + w) * nb_chunk,
                            nb_chunk), :] = cp
                if w + 1 < winners:
                    keys = jnp.where(oh, _IMAX, keys)
        return 0

    lax.fori_loop(0, M, chunk_step, 0)

    # ---- budgeted extraction over the per-segment candidate rows ----
    nb_rows = 2 * winners * M * nb_chunk
    row = lax.broadcasted_iota(jnp.int32, (nb_rows, tq), 0)
    rbits = max((nb_rows - 1).bit_length(), (l - 1).bit_length())
    ckv = cand_k[...]
    # preserve exhausted-bucket sentinels through the row-id packing
    ck = jnp.where(ckv == _IMAX, _IMAX, (ckv & ~((1 << rbits) - 1)) | row)
    # row -> segment: r = ((m*2 + seg)*W + w)*nb_chunk + b
    wnb_log = (winners * nb_chunk - 1).bit_length()
    seg_row = (row >> wnb_log) & 1
    ci = cand_i[...]
    cx, cy, cz = cand_x[...], cand_y[...], cand_z[...]
    qx, qy, qz = qt_ref[0, 0, :], qt_ref[0, 1, :], qt_ref[0, 2, :]
    # original id of each query row (queries share the key sort)
    qoid = jnp.transpose(ids_ref[0, 0:1, pl.ds(it * tq, tq)])[:, 0]  # [tq]

    kiota = lax.broadcasted_iota(jnp.int32, (tq, k), 1)
    zf = jnp.zeros((tq, k), jnp.float32)
    zi = jnp.zeros((tq, k), jnp.int32)

    def _winner_resi(keys):
        m = jnp.min(keys, axis=0)  # [tq]
        valid = m != _IMAX
        sel = keys == m[None, :]
        x = jnp.sum(jnp.where(sel, cx, 0.0), axis=0)
        y = jnp.sum(jnp.where(sel, cy, 0.0), axis=0)
        z = jnp.sum(jnp.where(sel, cz, 0.0), axis=0)
        rx = jnp.where(valid, x - qx, 0.0)
        ry = jnp.where(valid, y - qy, 0.0)
        rz = jnp.where(valid, z - qz, 0.0)
        return jnp.where(sel, _IMAX, keys), valid, sel, rx, ry, rz

    def extract(jj, carry):
        keys, oi_a, rx_a, ry_a, rz_a = carry
        keys, valid, sel, rx, ry, rz = _winner_resi(keys)
        i = jnp.sum(jnp.where(sel, ci, 0), axis=0)
        i = jnp.where(valid, i, qoid)
        upd = kiota == jj
        oi_a = jnp.where(upd, i[:, None], oi_a)
        rx_a = jnp.where(upd, rx[:, None], rx_a)
        ry_a = jnp.where(upd, ry[:, None], ry_a)
        rz_a = jnp.where(upd, rz[:, None], rz_a)
        return keys, oi_a, rx_a, ry_a, rz_a

    def extract_fused(jj, carry):
        """One-shot mode (fusion_knn_tpu.online_softmax_step); exhausted
        rounds contribute zero residual + the query's OWN payload
        (self-neighbor convention — queries share the key sort, so the
        query tile's payload IS a pay_ref slice)."""
        from .fusion_knn_tpu import online_softmax_step

        keys, sm, sw, ax, ay, az, *ap = carry
        keys, valid, sel, rx, ry, rz = _winner_resi(keys)
        pay_vals = []
        for ch in range(n_pay):
            pv = jnp.sum(jnp.where(
                sel, cand_p[pl.ds(ch * nb_rows, nb_rows), :], 0.0), axis=0)
            pay_vals.append(jnp.where(
                valid, pv, pay_ref[0, ch, pl.ds(it * tq, tq)]))
        sm, sw, ax, ay, az, ap = online_softmax_step(
            wtail, n_tail, rx, ry, rz, sm, sw, ax, ay, az, ap, pay_vals)
        return (keys, sm, sw, ax, ay, az, *ap)

    k1 = scal_ref[b * 2]
    if n_tail:
        zq = jnp.zeros((tq,), jnp.float32)
        carry = (jnp.full((tq,), -jnp.inf, jnp.float32), zq, zq, zq, zq,
                 *([zq] * n_pay))
        body = extract_fused
    else:
        carry = (zi, zf, zf, zf)
        body = extract
    keys_a = jnp.where(seg_row == 0, ck, _IMAX)
    _, *carry = lax.fori_loop(0, k1, body, (keys_a, *carry))
    keys_b = jnp.where(seg_row == 1, ck, _IMAX)
    _, *carry = lax.fori_loop(k1, k, body, (keys_b, *carry))

    if n_tail:
        _, sw, ax, ay, az, *ap = carry
        out = outs[0]
        out[0, 0] = qx + ax / sw
        out[0, 1] = qy + ay / sw
        out[0, 2] = qz + az / sw
        for ch in range(n_pay):
            out[0, 3 + ch] = ap[ch] / sw
        return
    oi_a, rx_a, ry_a, rz_a = carry

    itr = iter(outs)
    if emit_idx:
        next(itr)[0] = oi_a
    orr = next(itr)
    orr[0, 0] = rx_a
    orr[0, 1] = ry_a
    orr[0, 2] = rz_a


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9, 10))
def knn_fusion_cells(
    combined: jax.Array, split: jax.Array, k1: jax.Array, k: int,
    chunk: int = 512, m_chunks: int = 16, bucket: int = 16,
    winners: int = 2, tile: int = 256, emit_idx: bool = False,
    interpret=False, tail_layers=None, payload=None,
):
    """Two-segment budgeted self-kNN of ``combined`` in ONE cell-pruned
    pass (see module docstring).

    Args:
      combined: ``[B, N, 3]`` (segment A = rows [0, split), B = rest).
      split: ``[B]`` int32 per-batch segment boundary.
      k1: ``[B]`` int32 segment-A budget (segment B gets ``k - k1``).
      k: total neighbors (static).
      chunk / m_chunks / bucket / winners / tile: knn_cells params.
      emit_idx: also return global indices into ``combined``.
      tail_layers: folded score-MLP ``(WT, b, ...)`` — switches to
        ONE-SHOT attention-fusion output (the fusion_knn_tpu online-
        softmax recipe): returns fused ``[B, N, 3 + Cp]`` directly, and
        the [B, N, k, 3] residual block (25 MB @64k) plus its
        un-permute gather never exist.
      payload: ``[B, N, Cp]`` rows reduced with the attention weights
        (one-shot mode only; rides the Morton sort).

    Returns:
      one-shot mode: fused ``[B, N, 3 + Cp]`` fp32.  Otherwise
      ``([idx [B,N,k]]?, resi [B,N,k,3])`` — slots [0,k1) from segment
      A then [k1,k) from B, residual ``neighbor - query`` exact fp32;
      starved slots are zero-residual self-neighbors.  No gradients
      (stop_gradient; the eval fusion path re-derives everything from
      resi).
    """
    combined = lax.stop_gradient(combined)
    B, N, _ = combined.shape
    l, C, M, W, tq = bucket, chunk, m_chunks, winners, tile
    assert l & (l - 1) == 0 and C % l == 0 and C % 128 == 0
    assert W in (1, 2) and tq % 128 == 0 and C % tq == 0

    n_pad = (-N) % C
    p_sorted, perm = _sort_by_morton(combined, n_pad)
    Np = N + n_pad
    nc = Np // C
    # at least the 3 forced chunks (cover + per-segment best) must fit;
    # when nc <= 2 the truncated forced list already covers every chunk
    M = min(max(M, 3), nc)

    split32 = split.astype(jnp.int32)
    k1c = jnp.clip(k1.astype(jnp.int32), 0, k)
    # segment class per sorted key: 0 = A, 1 = B, 2 = pad
    in_range = perm < N
    is_a = (perm < split32[:, None]) & in_range
    cls = jnp.where(is_a, 0, jnp.where(in_range, 1, 2)).astype(jnp.int32)

    kvA = is_a
    kvB = (~is_a) & in_range
    loA, hiA = _chunk_boxes(p_sorted, C, kvA)
    loB, hiB = _chunk_boxes(p_sorted, C, kvB)
    qlo, qhi = _chunk_boxes(p_sorted, tq, in_range)
    lbA = _box_lb(qlo, qhi, loA, hiA)  # [B, S_tiles, nc]
    lbB = _box_lb(qlo, qhi, loB, hiB)

    n_tiles = Np // tq
    tiles = jnp.arange(n_tiles, dtype=jnp.int32)

    # covering chunk first (self-neighbor guarantee), then each
    # segment's best — all excluded from the union pool.  The scanned
    # chunk list must be DUPLICATE-FREE (a chunk scanned twice emits the
    # same neighbor twice), so the picker scores already-taken chunks
    # strictly worse (1e35) than inf-bound ones (1e33): argmin's
    # first-min rule then yields deterministic DISTINCT picks even for
    # an all-inf pool (an EMPTY segment — t at an extreme).
    def pick(pool, taken):
        score = jnp.where(jnp.isinf(pool), 1e33, pool)
        score = jnp.where(taken, 1e35, score)
        fid = jnp.argmin(score, axis=-1).astype(jnp.int32)  # [B, T]
        return fid, taken | jax.nn.one_hot(fid, nc, dtype=jnp.bool_)

    cover = jnp.broadcast_to((tiles * tq) // C, (B, n_tiles))
    taken = jax.nn.one_hot(cover, nc, dtype=jnp.bool_)
    fA, taken = pick(lbA, taken)
    fB, taken = pick(lbB, taken)
    union = jnp.where(taken, jnp.inf, jnp.minimum(lbA, lbB))
    n_top = max(M - 3, 0)
    if n_top:
        _, rest_ids = lax.top_k(-union, n_top)
        chunk_ids = jnp.concatenate(
            [cover[..., None], fA[..., None], fB[..., None],
             rest_ids.astype(jnp.int32)], axis=-1)
    else:
        chunk_ids = jnp.stack([cover, fA, fB], axis=-1)[..., :M]
    chunk_ids = chunk_ids.reshape(-1)

    scal = jnp.stack([k1c, k - k1c], axis=1).reshape(-1)  # [B * 2]

    p_t = jnp.swapaxes(p_sorted, 1, 2)  # [B, 3, Np]
    ids = jnp.concatenate(
        [jnp.minimum(perm, N - 1)[:, None, :], cls[:, None, :]], axis=1
    )  # [B, 2, Np]

    n_tail = len(tail_layers) // 2 if tail_layers else 0
    n_pay = payload.shape[-1] if payload is not None else 0

    n_cand = 2 * W * M * C // l
    scratch = [pltpu.VMEM((n_cand, tq), jnp.int32)] * 2
    scratch += [pltpu.VMEM((n_cand, tq), jnp.float32)] * 3
    if n_pay:
        scratch.append(pltpu.VMEM((n_pay * n_cand, tq), jnp.float32))

    ins = [scal, chunk_ids, p_t, p_t, ids]
    in_specs = [
        pl.BlockSpec((1, 3, tq), lambda b, i, s1, s2: (b, 0, i)),
        pl.BlockSpec((1, 3, Np), lambda b, i, s1, s2: (b, 0, 0)),
        pl.BlockSpec((1, 2, Np), lambda b, i, s1, s2: (b, 0, 0)),
    ]
    if n_pay:
        assert n_tail, "payload reduce requires one-shot tail mode"
        pay = jnp.pad(
            payload.astype(jnp.float32), ((0, 0), (0, n_pad), (0, 0)))
        pay_sorted = jnp.take_along_axis(pay, perm[..., None], axis=1)
        ins.append(jnp.swapaxes(pay_sorted, 1, 2))
        in_specs.append(
            pl.BlockSpec((1, n_pay, Np), lambda b, i, s1, s2: (b, 0, 0)))
    if n_tail:
        for j, w in enumerate(tail_layers):
            w = (w if j % 2 == 0 else w.reshape(-1, 1)).astype(jnp.float32)
            ins.append(w)
            in_specs.append(
                pl.BlockSpec(w.shape, lambda b, i, s1, s2: (0, 0)))
        out_specs = [
            pl.BlockSpec((1, 3 + n_pay, tq), lambda b, i, s1, s2: (b, 0, i)),
        ]
        out_shapes = [
            jax.ShapeDtypeStruct((B, 3 + n_pay, Np), jnp.float32),
        ]
    else:
        out_specs = [
            pl.BlockSpec((1, tq, k), lambda b, i, s1, s2: (b, i, 0)),
            pl.BlockSpec((1, 3, tq, k), lambda b, i, s1, s2: (b, 0, i, 0)),
        ]
        out_shapes = [
            jax.ShapeDtypeStruct((B, Np, k), jnp.int32),
            jax.ShapeDtypeStruct((B, 3, Np, k), jnp.float32),
        ]

    kernel = functools.partial(
        _fusion_cells_kernel, k=k, l=l, C=C, M=M, tq=tq, winners=W,
        emit_idx=True,  # cand_i always tracked (far-slot self ids)
        n_tail=n_tail, n_pay=n_pay,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, n_tiles),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    outs = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*ins)

    inv = jnp.argsort(perm[:, :N], axis=-1).astype(jnp.int32)
    if n_tail:
        fused = jnp.swapaxes(outs[0], 1, 2)[:, :N]  # sorted order
        return jnp.take_along_axis(fused, inv[..., None], axis=1)
    idx = jnp.take_along_axis(outs[0][:, :N], inv[..., None], axis=1)
    r = jnp.transpose(outs[1][:, :, :N], (0, 2, 3, 1))
    resi = jnp.take_along_axis(r, inv[..., None, None], axis=1)
    if emit_idx:
        return idx, resi
    return resi


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def knn_fusion_cells_grad(combined, split, k1, k, chunk=512, m_chunks=16,
                          bucket=16, winners=2, tile=256, interpret=False):
    """:func:`knn_fusion_cells` with the flat kernel's FIXED-NEIGHBOR
    backward (fusion_knn_tpu._fusion_core_bwd semantics): gradients
    through the residuals flow into ``combined`` as if the neighbor
    selection were constant — one-hot at idx minus one-hot at the query —
    so the cells route is usable in TRAINING at 32k+ too.

    Returns ``(idx, resi)`` (always emits idx: the backward needs it).
    """
    return knn_fusion_cells(
        combined, split, k1, k, chunk, m_chunks, bucket, winners, tile,
        True, interpret,
    )


def _kfc_fwd(combined, split, k1, k, chunk, m_chunks, bucket, winners,
             tile, interpret=False):
    idx, resi = knn_fusion_cells(
        combined, split, k1, k, chunk, m_chunks, bucket, winners, tile,
        True, interpret,
    )
    return (idx, resi), (idx, split, k1)


def _kfc_bwd(k, chunk, m_chunks, bucket, winners, tile, interpret, res, g):
    import numpy as np

    from pci_tpu.ops.gather import scatter_add_rows

    idx, split, k1 = res
    g_resi = g[1]  # idx cotangent is float0
    B, N, k_, _ = g_resi.shape
    g_nb = scatter_add_rows(
        idx.reshape(B, N * k_), g_resi.reshape(B, N * k_, 3), N
    )
    g_comb = g_nb - jnp.sum(g_resi, axis=2)
    zint = lambda a: np.zeros(a.shape, jax.dtypes.float0)  # noqa: E731
    return g_comb, zint(split), zint(k1)


knn_fusion_cells_grad.defvjp(_kfc_fwd, _kfc_bwd)
