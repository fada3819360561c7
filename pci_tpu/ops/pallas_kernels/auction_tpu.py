"""Blocked Gauss-Seidel auction for exact EMD assignment (Pallas TPU).

The reference's EMD is an approximate CUDA auction over the dense cost
matrix (/root/reference/Utils/Utils.py:51-118: eps 1e-3, 10k iterations,
uncertified).  A faithful XLA port (ops/emd.py `_auction_sweep`) is a
*Jacobi* auction: every sweep reads the materialized ``[n, m]`` matrix
from HBM (1 GB at 16k fp32) and performs ONE price-update round — on
real LiDAR, where ~10% of points are exact duplicates, price wars
serialize (one winner per column per sweep) and 8k sweeps ≈ 94 s still
don't finish annealing.

This kernel restructures the auction around the TPU's strengths:

  1. **No cost matrix.**  Distances are recomputed on the VPU from the
     resident ``[3, m]`` key cloud every time they're needed (the knn
     kernel recipe) — a bidding pass over 16k x 16k touches ~200 KB of
     HBM instead of 1 GB.
  2. **Gauss-Seidel across query tiles.**  The TPU grid executes
     sequentially, so prices/owners live in VMEM outputs that persist
     across grid steps (constant index maps, the accumulator pattern):
     each 256-row query tile bids against prices that already include
     every previous tile's updates.  One kernel pass = ``n/256``
     price-update rounds, vs ONE for a Jacobi sweep.
  3. **Lazy eviction.**  Only ``owner`` (column -> row) is
     authoritative; a row discovers it was outbid by checking
     ``owner[assign[row]]`` when its tile comes around.  No cross-tile
     scatter is needed.
  4. **CS-violation rebidding instead of phase reopens.**  Classic
     eps-scaling reopens the whole matching at each anneal; measured on
     a 512-pt pair the warm-price reopen took 860 passes vs 53 from
     cold — warm prices plus a global reopen is pathological.  Instead
     every pass re-opens exactly the rows whose assigned value violates
     CURRENT-eps complementary slackness (``v_assigned > v1 + eps``,
     checked in-kernel against the same resident vectors).  Annealing
     then just lowers eps and lets the violators re-bid: phases cost
     only their actual repair work.  On a no-bid complete pass, global
     eps-CS holds (later price rises on other columns only raise a
     row's alternatives; a rise on its own column means eviction, which
     re-opens it), so the certificate is the standard auction one:
     total cost <= optimal + n * eps * d_scale.

Bidding follows Bertsekas' forward auction for minimization: each
bidding row bids ``v2 - v1 + eps`` on its best column; the highest bid
per column wins (ties -> lowest row).  Costs are pre-normalized so
``eps`` is scale-relative.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TQ = 256  # query rows per grid step (lanes)
TK = 2048  # key tile length looped in-kernel (sublanes)
_BIG = 1e30
_IMAX = jnp.iinfo(jnp.int32).max


def _pass_kernel(
    eps_ref, qt_ref, keys_ref, price_in, assign_in, owner_in,
    price_out, assign_out, owner_out, nbid_out, *, n_q, n_k, tq, tk,
):
    """Grid: (n_q_padded // tq,).  One full bidding pass.

    eps_ref  [1]          scalar-prefetch epsilon.
    qt_ref   [1, 3, tq]   query tile (transposed; queries on lanes).
    keys_ref [1, 3, m]    whole key cloud, resident.
    price/owner: [1, m] fp32/int32 — constant index maps; the output
    blocks stay in VMEM across the sequential grid, so tile t+1 sees
    tile t's price updates.
    assign:  [1, tq] per-tile slice (only this tile's rows are written).
    nbid_out [1, 1] per-tile count of bidding rows (no-progress check).
    """
    it = pl.program_id(0)
    n_tk = n_k // tk

    @pl.when(it == 0)
    def _init():
        price_out[...] = price_in[...]
        owner_out[...] = owner_in[...]
        nbid_out[...] = jnp.zeros_like(nbid_out)

    eps = eps_ref[0]
    row0 = it * tq
    lane = lax.broadcasted_iota(jnp.int32, (1, tq), 1)
    row_ids = row0 + lane  # [1, tq] global row ids
    assign = assign_in[...].reshape(1, tq)

    # ---- A. one resident-vector scan: per-row best / second-best plus
    # the assigned column's owner and current value -------------------
    qx = qt_ref[0, 0, :][None, :]
    qy = qt_ref[0, 1, :][None, :]
    qz = qt_ref[0, 2, :][None, :]

    def key_tile(j, carry):
        v1, i1, v2, own_a, v_a = carry
        sl = pl.ds(j * tk, tk)
        kt = jnp.transpose(keys_ref[0, :, sl])  # [tk, 3]
        d = (kt[:, 0][:, None] - qx) ** 2
        d = d + (kt[:, 1][:, None] - qy) ** 2
        d = d + (kt[:, 2][:, None] - qz) ** 2
        ptile = jnp.transpose(price_out[:, sl])  # [tk, 1]
        V = d + ptile  # [tk, tq], >= 0
        # local argmin via packed sort key (mantissa-LSB steal: RANKING
        # only — emitted values come from the exact fp32 reductions)
        loc = lax.broadcasted_iota(jnp.int32, (tk, tq), 0)
        packed = (lax.bitcast_convert_type(V, jnp.int32) & ~(tk - 1)) | loc
        pm = jnp.min(packed, axis=0, keepdims=True)  # [1, tq]
        targ = (pm & (tk - 1)) + j * tk
        t1 = jnp.min(V, axis=0, keepdims=True)
        oh = loc == (pm & (tk - 1))
        t2 = jnp.min(jnp.where(oh, _BIG, V), axis=0, keepdims=True)
        # merge (v1, i1, v2) <- (t1, targ, t2)
        better = t1 < v1
        v2 = jnp.where(better, jnp.minimum(v1, t2), jnp.minimum(v2, t1))
        i1 = jnp.where(better, targ, i1)
        v1 = jnp.minimum(v1, t1)
        # assigned-column lookups (one-hot; no hardware gather on TPU)
        sub = loc + j * tk
        oh_a = sub == assign  # [tk, tq]
        ocol = jnp.transpose(owner_out[:, sl])  # [tk, 1]
        own_a = own_a + jnp.sum(
            jnp.where(oh_a, ocol, 0), axis=0, keepdims=True
        )
        v_a = v_a + jnp.sum(
            jnp.where(oh_a, V, 0.0), axis=0, keepdims=True
        )
        return v1, i1, v2, own_a, v_a

    v1 = jnp.full((1, tq), _BIG, jnp.float32)
    i1 = jnp.zeros((1, tq), jnp.int32)
    v2 = jnp.full((1, tq), _BIG, jnp.float32)
    own_a = jnp.zeros((1, tq), jnp.int32)
    v_a = jnp.zeros((1, tq), jnp.float32)
    v1, i1, v2, own_a, v_a = lax.fori_loop(
        0, n_tk, key_tile, (v1, i1, v2, own_a, v_a)
    )

    # ---- B. bidding mask: unassigned, silently evicted, or violating
    # CURRENT-eps complementary slackness (re-opened in place — this is
    # what replaces the pathological full phase reopen) ----------------
    assigned = assign >= 0
    valid_row = row_ids < n_q
    evicted = assigned & (own_a != row_ids)
    # slack guards the fp borderline: a winning bid lands exactly at
    # v_a == v1 + eps, and the pass/chase kernels compute V with
    # different op orderings (few-ulp differences on ~1-scale normalized
    # values), so strict > would rebid forever.  1e-5 absolute is far
    # below the 1e-3 target eps and only widens the certificate to
    # ~1.01 * n * eps.
    csviol = assigned & ~evicted & (v_a > v1 + 1.0001 * eps + 1e-5)
    bidding = (~assigned | evicted | csviol) & valid_row
    assign = jnp.where(bidding, -1, assign)
    # [1, 128] accumulator (TPU blocks need 128 lanes); lane-replicated
    # count summed across tiles, caller reads lane 0
    nbid_out[...] = nbid_out[...] + jnp.sum(bidding.astype(jnp.int32))

    # ---- C. bid resolution, tile by tile over columns ----------------
    incr = jnp.minimum(v2 - v1, _BIG) + eps  # > 0 (v2 >= v1)
    # pack bid value with inverted lane id: max-reduce -> highest bid,
    # ties -> lowest row.  incr > 0 so the bitcast is order-preserving.
    pbits = (lax.bitcast_convert_type(incr, jnp.int32) & ~(tq - 1)) | (
        (tq - 1) - lane
    )

    def bid_tile(j, won):
        sub = lax.broadcasted_iota(jnp.int32, (tk, tq), 0) + j * tk
        oh = (sub == i1) & bidding  # [tk, tq]
        pb = jnp.where(oh, pbits, -1)
        pmax = jnp.max(pb, axis=1, keepdims=True)  # [tk, 1] (lane red.)
        has = pmax >= 0
        win_row = (tq - 1) - (pmax & (tq - 1))  # winner's local lane id
        # decode on the lane side from ONE int32 transpose (Mosaic can't
        # transpose bool vectors)
        pm_l = jnp.transpose(pmax)  # [1, tk]
        has_l = pm_l >= 0
        incr_l = lax.bitcast_convert_type(pm_l & ~(tq - 1), jnp.float32)
        row_l = (tq - 1) - (pm_l & (tq - 1))
        sl = pl.ds(j * tk, tk)
        price_out[:, sl] = jnp.where(
            has_l, price_out[:, sl] + incr_l, price_out[:, sl]
        )
        owner_out[:, sl] = jnp.where(
            has_l, row0 + row_l, owner_out[:, sl]
        )
        # my rows that won this tile's columns (int32 carry: Mosaic
        # cannot legalize bool vectors through loop carries)
        w = oh & has & (win_row == lane)
        return won | jnp.any(w, axis=0, keepdims=True).astype(jnp.int32)

    won = lax.fori_loop(0, n_tk, bid_tile, jnp.zeros((1, tq), jnp.int32))
    assign_out[...] = jnp.where(won > 0, i1, assign)


@functools.partial(jax.jit, static_argnums=(4, 7))
def _auction_pass(price, assign_pad, owner, eps, n_q, q_t, k_t,
                  interpret=False):
    """One kernel pass over every query tile (price GS-updated NqP/TQ
    times).  Returns (price, assign, owner, n_bidding)."""
    NqP = q_t.shape[-1]
    m = k_t.shape[-1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NqP // TQ,),
        in_specs=[
            pl.BlockSpec((1, 3, TQ), lambda i, *_: (0, 0, i)),
            pl.BlockSpec((1, 3, m), lambda i, *_: (0, 0, 0)),
            pl.BlockSpec((1, m), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, TQ), lambda i, *_: (0, i)),
            pl.BlockSpec((1, m), lambda i, *_: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, m), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, TQ), lambda i, *_: (0, i)),
            pl.BlockSpec((1, m), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, 128), lambda i, *_: (0, 0)),
        ],
    )
    kernel = functools.partial(
        _pass_kernel, n_q=n_q, n_k=m, tq=TQ, tk=TK
    )
    price2, assign2, owner2, nbid = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, m), jnp.float32),
            jax.ShapeDtypeStruct((1, NqP), jnp.int32),
            jax.ShapeDtypeStruct((1, m), jnp.int32),
            jax.ShapeDtypeStruct((1, 128), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        eps.reshape(1).astype(jnp.float32), q_t, k_t, price[None],
        assign_pad[None], owner[None],
    )
    return price2[0], assign2[0], owner2[0], nbid[0, 0]


def _chase_kernel(
    eps_ref, q_all_ref, keys_ref, price_io, assign_io, owner_io, unas_io,
    price_out, assign_out, owner_out, unas_out, *, n_q, n_k, n_qp, hops,
):
    """Serial chain-chasing auction: grid (1,), whole state resident.

    The bulk pass leaves a DISPLACEMENT CHAIN tail: one unassigned token
    hops row -> evicted row -> ... and lazy eviction costs a full
    O(n*m) pass per hop (measured: a single token churned through ~500
    rows at 512 pts, one pass each).  Here each hop is a handful of
    ``[1, m]`` vector ops — the whole chain resolves inside one kernel
    invocation at VMEM speed.

    Per hop: pick the lowest-index unassigned row, recompute its exact
    value row ``V = d + price`` (keys in [3, m] lane layout — scalar
    query broadcast, no transpose), bid on the argmin column, bump the
    price, evict the previous owner (flagged unassigned for a later
    hop), assign the row.  Terminates early when no row is flagged.
    """
    price_out[...] = price_io[...]
    assign_out[...] = assign_io[...]
    owner_out[...] = owner_io[...]
    unas_out[...] = unas_io[...]

    eps = eps_ref[0]
    iota_m = lax.broadcasted_iota(jnp.int32, (1, n_k), 1)
    iota_n = lax.broadcasted_iota(jnp.int32, (1, n_qp), 1)
    kx = keys_ref[0, 0, :][None, :]
    ky = keys_ref[0, 1, :][None, :]
    kz = keys_ref[0, 2, :][None, :]

    def hop(_, carry):
        done = carry
        flags = unas_out[...]  # [1, n_qp] int32, 1 = needs assignment
        cand = jnp.where(flags > 0, iota_n, _IMAX)
        r = jnp.min(cand)  # lowest-index unassigned row
        now_done = r == _IMAX

        @pl.when(jnp.logical_not(now_done | done))
        def _body():
            oh_r = iota_n == r  # [1, n_qp]
            qx = jnp.sum(jnp.where(oh_r, q_all_ref[0, 0, :][None, :], 0.0))
            qy = jnp.sum(jnp.where(oh_r, q_all_ref[0, 1, :][None, :], 0.0))
            qz = jnp.sum(jnp.where(oh_r, q_all_ref[0, 2, :][None, :], 0.0))
            V = (
                (kx - qx) ** 2 + (ky - qy) ** 2 + (kz - qz) ** 2
                + price_out[...]
            )
            v1 = jnp.min(V)
            ohm = V == v1
            j1 = jnp.min(jnp.where(ohm, iota_m, _IMAX))
            oh_j = iota_m == j1
            v2 = jnp.min(jnp.where(oh_j, _BIG, V))
            incr = jnp.minimum(v2 - v1, _BIG) + eps
            price_out[...] = jnp.where(oh_j, price_out[...] + incr,
                                       price_out[...])
            o_old = jnp.max(jnp.where(oh_j, owner_out[...], -1))
            owner_out[...] = jnp.where(oh_j, r, owner_out[...])
            assign_out[...] = jnp.where(oh_r, j1, assign_out[...])
            # evicted row re-enters the queue ONLY if it is actually
            # assigned to j1 — stale owner entries (left by pass-side
            # rebids) must not re-open a legitimately assigned row
            # (measured: without the check the phase-2 chase spun, re-
            # opening rows as fast as it assigned them).  r itself is
            # protected by the final oh_r zeroing.
            evict = (iota_n == o_old) & (assign_out[...] == j1)
            flags2 = jnp.where(evict, 1, unas_out[...])
            unas_out[...] = jnp.where(oh_r, 0, flags2)

        return done | now_done

    lax.fori_loop(0, hops, hop, jnp.bool_(False))


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def _auction_chase(price, assign_pad, owner, eps, n_q, hops, interpret,
                   q_t, k_t):
    """Resolve up to ``hops`` displacement-chain steps serially."""
    NqP = q_t.shape[-1]
    m = k_t.shape[-1]
    rows_p = jnp.arange(NqP, dtype=jnp.int32)
    a_safe = jnp.clip(assign_pad, 0, m - 1)
    valid = (assign_pad >= 0) & (owner[a_safe] == rows_p)
    unas = ((~valid) & (rows_p < n_q)).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, 3, NqP), lambda i, *_: (0, 0, 0)),
            pl.BlockSpec((1, 3, m), lambda i, *_: (0, 0, 0)),
            pl.BlockSpec((1, m), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, NqP), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, m), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, NqP), lambda i, *_: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, m), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, NqP), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, m), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, NqP), lambda i, *_: (0, 0)),
        ],
    )
    kernel = functools.partial(
        _chase_kernel, n_q=n_q, n_k=m, n_qp=NqP, hops=hops
    )
    price2, assign2, owner2, _ = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, m), jnp.float32),
            jax.ShapeDtypeStruct((1, NqP), jnp.int32),
            jax.ShapeDtypeStruct((1, m), jnp.int32),
            jax.ShapeDtypeStruct((1, NqP), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        eps.reshape(1).astype(jnp.float32), q_t, k_t, price[None],
        assign_pad[None], owner[None], unas[None],
    )
    return price2[0], assign2[0], owner2[0]


def emd_auction_tpu(
    xyz1: jax.Array, xyz2: jax.Array, eps: float = 1e-3,
    max_passes: int = 512,
):
    """Annealed Gauss-Seidel auction assignment on TPU.

    Same contract as ``ops.emd.emd_assignment_dist`` (per-point squared
    distances to the assigned partner, assignment, ``converged``), same
    normalization (costs scaled so ``eps`` is relative; certificate on
    ``converged=True``: total cost <= optimal + n * eps * d_scale).
    ``max_passes`` counts FULL bidding passes; each pass performs
    ``n/256`` Gauss-Seidel price rounds.

    Annealing: eps starts at 0.25 and quarters every time a pass ends
    complete with zero bidders, WITHOUT reopening the matching — the
    kernel's CS-violation check re-opens exactly the rows the new eps
    invalidates (see module docstring).  If the budget dies mid-phase
    the best complete snapshot is returned with ``converged=False``.
    """
    n, m = xyz1.shape[0], xyz2.shape[0]
    if n != m:
        raise ValueError(f"auction needs equal cardinality, got {n} vs {m}")
    interpret = jax.default_backend() != "tpu"
    return _auction_impl(xyz1, xyz2, float(eps), int(max_passes), interpret)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _auction_impl(xyz1, xyz2, eps, max_passes, interpret=False):
    n = xyz1.shape[0]
    m = xyz2.shape[0]
    xyz1 = lax.stop_gradient(xyz1)
    xyz2 = lax.stop_gradient(xyz2)

    # scale-relative eps: normalize by an O(n)-cheap upper bound on the
    # max pairwise squared distance (no [n, m] matrix materialized)
    r1 = jnp.max(jnp.sum(xyz1 * xyz1, axis=-1))
    r2 = jnp.max(jnp.sum(xyz2 * xyz2, axis=-1))
    d_scale = jnp.maximum(2.0 * (r1 + r2), 1e-12)
    inv_s = lax.rsqrt(d_scale)  # scale coords so sq-distances are <= 1
    q = xyz1 * inv_s
    k = xyz2 * inv_s

    n_pad = (-n) % TQ
    m_pad = (-m) % TK
    q_t = jnp.swapaxes(
        jnp.pad(q, ((0, n_pad), (0, 0)), constant_values=1e6), 0, 1
    )[None]
    k_t = jnp.swapaxes(
        jnp.pad(k, ((0, m_pad), (0, 0)), constant_values=1e6), 0, 1
    )[None]
    mp = m + m_pad
    n_qp = n + n_pad

    eps_t = jnp.float32(eps)
    state0 = (
        jnp.zeros((mp,), jnp.float32),            # price
        jnp.full((n_qp,), _IMAX, jnp.int32).at[:n].set(-1),  # assign
        jnp.full((mp,), -1, jnp.int32),           # owner
        jnp.float32(0.25),                        # eps_cur
        jnp.int32(0),                             # passes
        jnp.full((n,), -1, jnp.int32),            # best complete snapshot
        jnp.bool_(False),                         # finished at eps_t
    )
    rows = jnp.arange(n, dtype=jnp.int32)

    def complete_of(assign, owner):
        a = assign[:n]
        ok = (a >= 0) & (owner[jnp.clip(a, 0, mp - 1)] == rows)
        return jnp.all(ok)

    def cond(st):
        _, _, _, _, passes, _, done = st
        return (passes < max_passes) & ~done

    def body(st):
        price, assign, owner, eps_cur, passes, snap, done = st
        price, assign, owner, nbid = _auction_pass(
            price, assign, owner, eps_cur, n, q_t, k_t, interpret
        )
        # serial chain chase: the bulk pass converges the many-bidder
        # regime; the tail is a displacement chain that would cost one
        # full O(n*m) pass PER HOP (measured) — the chase kernel
        # resolves thousands of hops in one invocation
        price, assign, owner = _auction_chase(
            price, assign, owner, eps_cur, n,
            512 if interpret else 4096, interpret, q_t, k_t
        )
        complete = complete_of(assign, owner)
        settled = complete & (nbid == 0)  # global eps_cur-CS held at
        # the START of this round AND nothing was left to chase
        at_target = eps_cur <= eps_t
        snap = jnp.where(complete, assign[:n], snap)
        done = settled & at_target
        anneal = settled & ~at_target
        eps_cur = jnp.where(
            anneal, jnp.maximum(eps_cur * 0.25, eps_t), eps_cur
        )
        return price, assign, owner, eps_cur, passes + 1, snap, done

    price, assign, owner, eps_cur, passes, snap, done = lax.while_loop(
        cond, body, state0
    )
    final = jnp.where(done, assign[:n], snap)
    safe = jnp.clip(final, 0, m - 1)
    dist = jnp.sum((xyz1 - xyz2[safe]) ** 2, axis=-1)
    converged = done & jnp.all(final >= 0)
    return dist, safe, converged
