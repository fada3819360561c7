"""Fused adaptive two-segment self-kNN for the fusion head (Pallas TPU).

The fusion head (reference /root/reference/Utils/Layers.py:246-271) queries
the combined cloud against the two sampled subsets — which are exactly the
two PREFIX SEGMENTS of the combined cloud itself (`new_points` is
``cat(new_points1, new_points2)``) — takes k1 neighbors from subset 1 and
``k2 = k - k1`` from subset 2, and concatenates the blocks along the
neighbor axis.  This kernel produces that CONCATENATED block directly:

  * each [TK, TQ] distance tile is computed ONCE for both segments;
  * extraction runs k1 rounds on segment A's candidates, then k-k1 rounds
    on segment B's, writing into output slots [0,k1) and [k1,k) — exactly
    k rounds total (dynamic per-batch trip counts), not k per segment, and
    no neighbor-merge pass is needed outside the kernel.

Tricks over the generic kNN kernel (knn_tpu.py):

* **Packed sort keys.**  Non-negative fp32 distances bitcast to int32 are
  order-preserved, so stealing mantissa LSBs for an index gives argmin for
  free: one ``min`` returns winner distance AND position, with exact
  first-match tie-breaking (duplicate points tie-break by index instead of
  corrupting a one-hot sum).  The bucket phase steals ``log2(l)`` bits for
  the in-bucket argmin; extraction steals ``log2(nb)`` bits for the
  candidate row.  Ranking is quantized to ~2^-13 relative (the masked
  LSBs), which can only reorder neighbors whose distances differ by
  <0.02%; output residuals/distances are exact fp32.

* **In-kernel neighbor coordinates.**  The bucket phase tracks the
  argmin's xyz alongside its packed key, and extraction emits per-neighbor
  RESIDUALS (neighbor - query) directly — a [B,N,k]<-[B,N,3] row gather
  outside the kernel costs ~1.3 ms at 16k (measured).

Outputs are opt-in (``emit_d``/``emit_idx``): the attention-fusion path
only consumes residuals (it recomputes |resi| with a safe norm and forms
the fused cloud as ``combined + sum(w * resi)``).

Constraints: ``split`` must be a multiple of the bucket length ``l`` so no
bucket straddles the segments (the fusion head aligns N2 to l; a <=l/2
perturbation of a random split).  N padded to TK, queries padded to TQ.

``knn_fusion_multi`` generalizes to F prefix segments with per-segment
neighbor budgets — the multi-cloud fusion head (PointsFusion2,
/root/reference/Utils/Layers.py:286-381): extraction runs F phases with
dynamic trip counts, still exactly k rounds total, emitting the
budget-compacted neighbor block in segment order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TQ = 512
TK = 2048

_BIG = 1e30
_IMAX = jnp.iinfo(jnp.int32).max


def online_softmax_step(wtail, n_tail, rx, ry, rz, sm, sw, ax, ay, az,
                        ap, pay_vals):
    """One flash-softmax fusion round, shared by the flat and cells
    one-shot kernels: score = channel-max of the folded MLP over
    ``[resi | safe-norm]`` (reference tail math, Utils/Layers.py:264-283),
    then rescale the running (max, weight-sum, weighted-resi, weighted-
    payload) accumulators.  ``pay_vals``: this round's per-channel
    payload values — the CALLER applies the exhausted-round
    self-neighbor fallback (query's own payload)."""
    f32 = jnp.float32
    nrm = jnp.sqrt(rx * rx + ry * ry + rz * rz + 1e-12)  # _safe_norm
    h = jnp.concatenate(
        [rx[None, :], ry[None, :], rz[None, :], nrm[None, :]], axis=0
    )  # [4, TQ]
    for t_ in range(n_tail):
        h = lax.dot_general(
            wtail[2 * t_][...], h, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) + wtail[2 * t_ + 1][...]
        h = jnp.maximum(h, 0.0)
    s = jnp.max(h, axis=0)  # slot score (channel max-pool)
    m2 = jnp.maximum(sm, s)
    f = jnp.exp(sm - m2)
    w = jnp.exp(s - m2)
    return (m2, sw * f + w, ax * f + w * rx, ay * f + w * ry,
            az * f + w * rz, [a * f + w * p for a, p in zip(ap, pay_vals)])


def _fusion_knn_kernel(scal_ref, q_ref, p_ref, *refs, k, n, l, nseg, emit_d,
                       emit_idx, winners=1, n_tail=0, n_pay=0):
    """Grid: (B, S // TQ).

    q_ref [1, 3, TQ] query tile; p_ref [1, 3, N] whole combined cloud.
    scal_ref: per batch ``2 * nseg`` scalars — segment END offsets
    (cumulative, multiples of l; last == n_real) then per-segment
    budgets (sum == k).
    refs: ([od [1,TQ,k]]? [oi [1,TQ,k]]? orr [1,3,TQ,k]), then scratch:
    cand_k packed keys, [cand_i]? global indices, cand_{x,y,z} argmin
    coords — all [winners * N // l, TQ].

    ``n_tail`` > 0 switches to ONE-SHOT attention-fusion mode: refs start
    with ``2 * n_tail`` folded score-MLP (WT, b) pairs, the only output
    is the fused rows [1, 3, TQ], and each extraction round feeds its
    residual straight into an ONLINE softmax (flash recipe: running max,
    rescaled weight sum and weighted-residual accumulators) — the
    [B, N, k, 3] residual block never exists and the separate tail
    kernel (fusion_tail_tpu) is not launched.  Same math as
    nn.fusion._apply_fusion_tail: scores = max_c MLP([resi | safe-norm]),
    fused = query + sum_k softmax(scores) * resi.

    ``winners``: bucket candidates kept per min phase (knn_cells_tpu
    recipe).  The extraction loop's per-round cost scales with the
    candidate row count ``winners * N / l``, so (l=2L, W=2) halves
    nothing but (l=4L, W=2) halves extraction at better recall than
    (l=2L, W=1) — losing a true neighbor needs 3+ collisions in one
    bucket instead of 2.  Candidate rows for tile j are laid out
    [j * W * nb_tile + w * nb_tile + b_local] so the bucket id of any
    candidate row is recoverable for segment masking.
    """
    pay_ref = qpay_ref = None
    i0 = 0
    if n_pay:  # payload rows ride the one-shot reduce (n_tail mode only)
        pay_ref, qpay_ref = refs[0], refs[1]
        i0 = 2
    if n_tail:
        assert not (emit_d or emit_idx)
        wtail = refs[i0: i0 + 2 * n_tail]
        outs = refs[i0 + 2 * n_tail: i0 + 2 * n_tail + 1]
        rest = refs[i0 + 2 * n_tail + 1:]
    else:
        assert not n_pay
        n_out = 1 + int(emit_d) + int(emit_idx)
        outs, rest = refs[:n_out], refs[n_out:]
    cand_p = None
    if n_pay:
        rest, cand_p = rest[:-1], rest[-1]
    if emit_idx:
        cand_k, cand_i, cand_x, cand_y, cand_z = rest
    else:
        cand_k, cand_x, cand_y, cand_z = rest
        cand_i = None

    nb_total = n // l
    nb_tile = TK // l
    b = pl.program_id(0)
    base_s = b * 2 * nseg
    n_real = scal_ref[base_s + nseg - 1]  # last segment end

    def key_tile(j, _):
        # fori_loop (not unrolled): Mosaic must reuse the [TK, TQ] buffers
        p = jnp.transpose(p_ref[0, :, pl.ds(j * TK, TK)])  # [TK, 3]
        d = jnp.zeros((TK, TQ), jnp.float32)
        for c in range(3):
            diff = p[:, c][:, None] - q_ref[0, c, :][None, :]
            d = d + diff * diff
        # mask the padded tail (>= n_real); segment masking happens at
        # extraction (bucket rows never straddle: split % l == 0)
        gidx = jax.lax.broadcasted_iota(jnp.int32, (TK, TQ), 0) + j * TK
        d = jnp.where(gidx < n_real, d, _BIG)

        # packed bucket argmin: steal log2(l) LSBs for the local index
        bits = jax.lax.bitcast_convert_type(d, jnp.int32)  # d >= 0
        loc = jax.lax.broadcasted_iota(jnp.int32, (nb_tile, l, TQ), 1)
        keys = (bits.reshape(nb_tile, l, TQ) & ~(l - 1)) | loc
        p3 = p.reshape(nb_tile, l, 3)
        for w in range(winners):
            bmin = jnp.min(keys, axis=1)  # [nb_tile, TQ]: dist + argmin
            local = bmin & (l - 1)
            oh = loc == local[:, None, :]  # exact one-hot (index tie-break)
            cx = jnp.sum(jnp.where(oh, p3[:, :, 0][..., None], 0.0), axis=1)
            cy = jnp.sum(jnp.where(oh, p3[:, :, 1][..., None], 0.0), axis=1)
            cz = jnp.sum(jnp.where(oh, p3[:, :, 2][..., None], 0.0), axis=1)
            sl = pl.ds((j * winners + w) * nb_tile, nb_tile)
            cand_k[sl, :] = bmin
            if emit_idx:
                base = (
                    jax.lax.broadcasted_iota(jnp.int32, (nb_tile, TQ), 0) * l
                    + j * TK
                )
                cand_i[sl, :] = base + local
            cand_x[sl, :] = cx
            cand_y[sl, :] = cy
            cand_z[sl, :] = cz
            if n_pay:
                pt = jnp.transpose(
                    pay_ref[0, :, pl.ds(j * TK, TK)]
                ).reshape(nb_tile, l, n_pay)
                for ch in range(n_pay):
                    cp = jnp.sum(
                        jnp.where(oh, pt[:, :, ch][..., None], 0.0), axis=1
                    )
                    cand_p[pl.ds(
                        ch * (winners * nb_total)
                        + (j * winners + w) * nb_tile, nb_tile), :] = cp
            if w + 1 < winners:
                # every packed key is unique (loc LSBs): exactly one lane
                # per bucket clears
                keys = jnp.where(oh, _IMAX, keys)
        return 0

    lax.fori_loop(0, n // TK, key_tile, 0)

    # extraction: pack the candidate-row id into the low bits.  The floor
    # of (l-1).bit_length() clears the stale local-argmin bits even when
    # the row count < l (cand_i already holds the global index)
    nb_rows = winners * nb_total
    row = jax.lax.broadcasted_iota(jnp.int32, (nb_rows, TQ), 0)
    rbits = max((nb_rows - 1).bit_length(), (l - 1).bit_length())
    ck = (cand_k[...] & ~((1 << rbits) - 1)) | row
    if winners == 1:
        bucket_id = row
    else:
        # tile-major winner layout: row = j*W*nb_tile + w*nb_tile + b_loc
        nbw_log = (winners * nb_tile - 1).bit_length()
        nbt_log = (nb_tile - 1).bit_length()
        bucket_id = ((row >> nbw_log) << nbt_log) | (row & (nb_tile - 1))
    cx = cand_x[...]
    cy = cand_y[...]
    cz = cand_z[...]
    qx = q_ref[0, 0, :]
    qy = q_ref[0, 1, :]
    qz = q_ref[0, 2, :]

    kiota = jax.lax.broadcasted_iota(jnp.int32, (TQ, k), 1)
    zf = jnp.zeros((TQ, k), jnp.float32)
    zi = jnp.zeros((TQ, k), jnp.int32)

    qpos = (
        jax.lax.broadcasted_iota(jnp.int32, (TQ,), 0)
        + pl.program_id(1) * TQ
    )

    def _winner_resi(keys):
        """(advanced keys, valid, sel, rx, ry, rz): one packed-key min
        round.  A segment with fewer bucket candidates than its budget
        exhausts mid-phase: every key is the sentinel, sel matches ALL
        rows and the coordinate sums would be garbage — emit a zero
        residual (a self-neighbor, the benign analog of the reference's
        duplicated neighbors at tiny pools)."""
        m = jnp.min(keys, axis=0)  # [TQ] winner (unique: row in LSBs)
        valid = m != _IMAX  # [TQ]
        sel = keys == m[None, :]
        x = jnp.sum(jnp.where(sel, cx, 0.0), axis=0)
        y = jnp.sum(jnp.where(sel, cy, 0.0), axis=0)
        z = jnp.sum(jnp.where(sel, cz, 0.0), axis=0)
        rx = jnp.where(valid, x - qx, 0.0)
        ry = jnp.where(valid, y - qy, 0.0)
        rz = jnp.where(valid, z - qz, 0.0)
        return jnp.where(sel, _IMAX, keys), valid, sel, rx, ry, rz

    def extract(jj, carry):
        keys, od_a, oi_a, rx_a, ry_a, rz_a = carry
        keys, valid, sel, rx, ry, rz = _winner_resi(keys)
        upd = kiota == jj  # [TQ, k] slot-jj mask
        if emit_d:
            od_a = jnp.where(upd, (rx * rx + ry * ry + rz * rz)[:, None], od_a)
        if emit_idx:
            i = jnp.sum(jnp.where(sel, cand_i[...], 0), axis=0)
            i = jnp.where(valid, i, qpos)
            oi_a = jnp.where(upd, i[:, None], oi_a)
        rx_a = jnp.where(upd, rx[:, None], rx_a)
        ry_a = jnp.where(upd, ry[:, None], ry_a)
        rz_a = jnp.where(upd, rz[:, None], rz_a)
        return keys, od_a, oi_a, rx_a, ry_a, rz_a

    def extract_fused(jj, carry):
        """One-shot mode (online_softmax_step).  An exhausted round
        contributes the query's OWN payload (the self-neighbor
        convention — XLA gathers idx=qpos there)."""
        keys, sm, sw, ax, ay, az, *ap = carry
        keys, valid, sel, rx, ry, rz = _winner_resi(keys)
        pay_vals = []
        for ch in range(n_pay):
            pv = jnp.sum(jnp.where(
                sel, cand_p[pl.ds(ch * nb_rows, nb_rows), :], 0.0), axis=0)
            pay_vals.append(jnp.where(valid, pv, qpay_ref[0, ch, :]))
        sm, sw, ax, ay, az, ap = online_softmax_step(
            wtail, n_tail, rx, ry, rz, sm, sw, ax, ay, az, ap, pay_vals)
        return (keys, sm, sw, ax, ay, az, *ap)

    # F extraction phases: segment j gets budget_j rounds on its own row
    # range, writing output slots [kcum_j, kcum_{j+1}) — dynamic trip
    # counts, exactly k rounds TOTAL across all phases, block pre-merged
    if n_tail:
        zq = jnp.zeros((TQ,), jnp.float32)
        carry = (jnp.full((TQ,), -jnp.inf, jnp.float32), zq, zq, zq, zq,
                 *([zq] * n_pay))
        body = extract_fused
    else:
        carry = (zf, zi, zf, zf, zf)
        body = extract
    row_lo = jnp.int32(0)
    kcum = jnp.int32(0)
    for j in range(nseg):
        row_hi = scal_ref[base_s + j] // l
        budget = scal_ref[base_s + nseg + j]
        keys_j = jnp.where(
            (bucket_id >= row_lo) & (bucket_id < row_hi), ck, _IMAX
        )
        _, *carry = lax.fori_loop(
            kcum, kcum + budget, body, (keys_j, *carry)
        )
        row_lo = row_hi
        kcum = kcum + budget

    if n_tail:
        _, sw, ax, ay, az, *ap = carry
        out = outs[0]
        out[0, 0] = qx + ax / sw
        out[0, 1] = qy + ay / sw
        out[0, 2] = qz + az / sw
        for ch in range(n_pay):
            out[0, 3 + ch] = ap[ch] / sw
        return
    od_a, oi_a, rx_a, ry_a, rz_a = carry

    it = iter(outs)
    if emit_d:
        next(it)[0] = od_a
    if emit_idx:
        next(it)[0] = oi_a
    orr = next(it)
    orr[0, 0] = rx_a
    orr[0, 1] = ry_a
    orr[0, 2] = rz_a


def _fusion_impl(combined, seg_ends, budgets, k, bucket, emit_d, emit_idx,
                 winners=1, interpret=False, tail_layers=None,
                 payload=None):
    combined = lax.stop_gradient(combined)
    B, N, C = combined.shape
    F = seg_ends.shape[1]
    assert C == 3
    l = bucket
    assert l & (l - 1) == 0, "bucket must be a power of two"
    assert winners in (1, 2)

    s_pad = (-N) % TQ
    n_pad = (-N) % TK
    pts = combined
    if n_pad:
        pts = jnp.pad(pts, ((0, 0), (0, n_pad), (0, 0)), constant_values=1e15)
    Np = N + n_pad
    q = combined
    if s_pad:
        q = jnp.pad(q, ((0, 0), (0, s_pad), (0, 0)))
    Sp = N + s_pad

    p_t = jnp.swapaxes(pts, 1, 2)  # [B, 3, Np]
    q_t = jnp.swapaxes(q, 1, 2)  # [B, 3, Sp]

    scal = jnp.concatenate(
        [seg_ends.astype(jnp.int32), budgets.astype(jnp.int32)], axis=1
    ).reshape(-1)  # [B * 2F]: F ends then F budgets per batch

    n_tail = len(tail_layers) // 2 if tail_layers else 0
    n_pay = payload.shape[-1] if payload is not None else 0
    ins = [scal, q_t, p_t]
    in_specs = [
        pl.BlockSpec((1, 3, TQ), lambda b, i, s: (b, 0, i)),
        pl.BlockSpec((1, 3, Np), lambda b, i, s: (b, 0, 0)),
    ]
    if n_pay:
        assert n_tail, "payload reduce requires one-shot tail mode"
        pay = payload.astype(jnp.float32)
        pay_k = jnp.pad(pay, ((0, 0), (0, n_pad), (0, 0)))
        pay_q = jnp.pad(pay, ((0, 0), (0, s_pad), (0, 0)))
        ins.append(jnp.swapaxes(pay_k, 1, 2))
        in_specs.append(
            pl.BlockSpec((1, n_pay, Np), lambda b, i, s: (b, 0, 0)))
        ins.append(jnp.swapaxes(pay_q, 1, 2))
        in_specs.append(
            pl.BlockSpec((1, n_pay, TQ), lambda b, i, s: (b, 0, i)))
    if n_tail:
        assert not (emit_d or emit_idx)
        for j, w in enumerate(tail_layers):
            w = (w if j % 2 == 0 else w.reshape(-1, 1)).astype(jnp.float32)
            ins.append(w)
            in_specs.append(pl.BlockSpec(w.shape, lambda b, i, s: (0, 0)))

    out_specs, out_shapes = [], []
    if n_tail:
        out_specs.append(
            pl.BlockSpec((1, 3 + n_pay, TQ), lambda b, i, s: (b, 0, i)))
        out_shapes.append(
            jax.ShapeDtypeStruct((B, 3 + n_pay, Sp), jnp.float32))
    else:
        if emit_d:
            out_specs.append(
                pl.BlockSpec((1, TQ, k), lambda b, i, s: (b, i, 0)))
            out_shapes.append(jax.ShapeDtypeStruct((B, Sp, k), jnp.float32))
        if emit_idx:
            out_specs.append(
                pl.BlockSpec((1, TQ, k), lambda b, i, s: (b, i, 0)))
            out_shapes.append(jax.ShapeDtypeStruct((B, Sp, k), jnp.int32))
        out_specs.append(
            pl.BlockSpec((1, 3, TQ, k), lambda b, i, s: (b, 0, i, 0)))
        out_shapes.append(jax.ShapeDtypeStruct((B, 3, Sp, k), jnp.float32))

    nrows = winners * Np // l
    scratch = [pltpu.VMEM((nrows, TQ), jnp.int32)]
    if emit_idx:
        scratch.append(pltpu.VMEM((nrows, TQ), jnp.int32))
    scratch += [pltpu.VMEM((nrows, TQ), jnp.float32)] * 3
    if n_pay:
        scratch.append(pltpu.VMEM((n_pay * nrows, TQ), jnp.float32))

    kernel = functools.partial(
        _fusion_knn_kernel, k=k, n=Np, l=l, nseg=F, emit_d=emit_d,
        emit_idx=emit_idx, winners=winners, n_tail=n_tail, n_pay=n_pay,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Sp // TQ),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    outs = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shapes,
        # default scoped-VMEM budget is 16MB; candidate scratch + the
        # [TK, TQ] distance tiles need ~2x that at 16k points
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*ins)

    if n_tail:
        return jnp.swapaxes(outs[0][:, :, :N], 1, 2)  # [B, N, 3]
    result = []
    it = iter(outs)
    if emit_d:
        result.append(next(it)[:, :N])
    if emit_idx:
        result.append(next(it)[:, :N])
    r = next(it)
    result.append(jnp.transpose(r[:, :, :N], (0, 2, 3, 1)))  # [B, N, k, 3]
    return tuple(result) if len(result) > 1 else result[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _fusion_core(combined, seg_ends, budgets, k, bucket, winners, interpret):
    """(idx, resi) with a FIXED-neighbor backward: gradients through the
    residuals flow into ``combined`` exactly like the jnp fallback's
    differentiable gather (d resi[b,n,j] / d combined = one-hot at
    idx[b,n,j] minus one-hot at n), so TPU and CPU training see the same
    gradients."""
    return _fusion_impl(
        combined, seg_ends, budgets, k, bucket, False, True, winners,
        interpret,
    )


def _fusion_core_fwd(combined, seg_ends, budgets, k, bucket, winners,
                     interpret):
    idx, resi = _fusion_impl(
        combined, seg_ends, budgets, k, bucket, False, True, winners,
        interpret,
    )
    return (idx, resi), (idx, seg_ends, budgets)


def _fusion_core_bwd(k, bucket, winners, interpret, res, g):
    import numpy as np

    from pci_tpu.ops.gather import scatter_add_rows

    idx, seg_ends, budgets = res
    g_resi = g[1]  # [B, N, k, 3]; idx cotangent is float0
    B, N, k_, _ = g_resi.shape
    g_nb = scatter_add_rows(
        idx.reshape(B, N * k_), g_resi.reshape(B, N * k_, 3), N
    )
    g_comb = g_nb - jnp.sum(g_resi, axis=2)
    zint = lambda a: np.zeros(a.shape, jax.dtypes.float0)  # noqa: E731
    return g_comb, zint(seg_ends), zint(budgets)


_fusion_core.defvjp(_fusion_core_fwd, _fusion_core_bwd)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8))
def knn_fusion_multi(combined: jax.Array, seg_ends: jax.Array,
                     budgets: jax.Array, k: int, bucket: int = 16,
                     emit_d: bool = False, emit_idx: bool = False,
                     winners: int = 1, interpret=False):
    """Budgeted self-kNN of ``combined`` into its F prefix segments.

    For each query point, returns its ``budgets[j]`` nearest neighbors
    among rows [seg_ends[j-1], seg_ends[j]) for every segment j, blocks
    concatenated in segment order — the multi-cloud fusion head's
    budget-compacted kNN block (/root/reference/Utils/Layers.py:286-381)
    in the reference's order, with no compaction pass needed outside.

    Differentiable in ``combined`` with fixed-neighbor semantics (the
    same subgradient the jnp fallback's gather produces); ``d`` is
    derived as ``sum(resi**2)`` so it backpropagates too.

    Args:
      combined: ``[B, N, 3]``.
      seg_ends: ``[B, F]`` int32 cumulative segment ends, each a multiple
        of ``bucket``, last column == N.
      budgets: ``[B, F]`` int32 per-segment neighbor budgets, rows
        summing to ``k``.
      k: total neighbor count (static).
      bucket: power-of-two bucket length (approximation grain, like
        ``lax.approx_min_k``; per-segment recall
        ~``1 - (k_seg - 1) * l / (2 * N_seg)``; nearest-in-segment exact).
      emit_d / emit_idx: also emit sq-dists / global indices into
        ``combined``.

    Returns:
      ``([d [B,N,k]]? [idx [B,N,k]]? resi [B,N,k,3])`` — residual
      ``neighbor - query`` exact fp32.  If a segment holds fewer bucket
      candidates than its budget, its surplus slots emit a ZERO residual
      at the query's own index (a self-neighbor — the benign analog of
      the reference's duplicated neighbors at tiny pools).
    """
    idx, resi = _fusion_core(
        combined, seg_ends, budgets, k, bucket, winners, interpret
    )
    result = []
    if emit_d:
        result.append(jnp.sum(resi * resi, axis=-1))
    if emit_idx:
        result.append(idx)
    result.append(resi)
    return tuple(result) if len(result) > 1 else result[0]


def knn_fusion_adaptive(combined: jax.Array, split: jax.Array,
                        k1: jax.Array, k: int, bucket: int = 16,
                        emit_d: bool = False, emit_idx: bool = False,
                        winners: int = 1, interpret=False):
    """Two-segment special case: ``k1`` neighbors from rows [0, split)
    then ``k - k1`` from [split, N) (the PointsFusion adaptive head,
    /root/reference/Utils/Layers.py:260-270).  See knn_fusion_multi."""
    B, N, _ = combined.shape
    k1 = jnp.clip(k1.astype(jnp.int32), 0, k)
    seg_ends = jnp.stack(
        [split.astype(jnp.int32), jnp.full_like(split, N)], axis=1
    )
    budgets = jnp.stack([k1, k - k1], axis=1)
    return knn_fusion_multi(combined, seg_ends, budgets, k, bucket,
                            emit_d, emit_idx, winners, interpret)


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7))
def knn_fusion_attention(combined, seg_ends, budgets, tail_layers, k: int,
                         bucket: int = 16, winners: int = 1,
                         interpret=False, payload=None):
    """ONE-SHOT fusion head: budgeted multi-segment self-kNN AND the
    attention tail (score MLP + channel max + softmax over k + weighted
    residual reduce, reference Utils/Layers.py:264-283) in a single
    kernel — each extraction round's residual feeds an online softmax,
    so neither the [B, N, k, 3] residual block nor the separate tail
    launch exists.  Eval-only (no VJP; training keeps the resi-emitting
    kernel + XLA tail, which define gradients).

    Args:
      combined: ``[B, N, 3]`` fp32 combined cloud (queries == keys).
      seg_ends / budgets: ``[B, F]`` prefix-segment ends (multiples of
        ``bucket``; last == N) and per-segment neighbor budgets
        (sum == k).
      tail_layers: flat folded ``(WT, b, ...)`` score-MLP tuple
        (fold_bn_layers); layer 0 takes the 4 channels
        ``[resi | safe-norm]``.
      k: static total neighbor count.
      payload: ``[B, N, Cp]`` per-combined-row features (intensity) to
        reduce with the same attention weights (the
        PointsFusionWithFeatures variant) — candidate payload rows ride
        the bucket phase as extra winner planes; exhausted rounds
        contribute the query's own payload (self-neighbor convention).

    Returns:
      fused ``[B, N, 3 + Cp]`` fp32 (= combined + attention-weighted
      residual sum, then the weighted payload reduce).
    """
    return _fusion_impl(
        combined, seg_ends, budgets, k, bucket, False, False, winners,
        interpret, tuple(tail_layers), payload,
    )
