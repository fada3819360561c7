"""Earth Mover's Distance via a TPU-native auction algorithm.

Replaces the reference's external PyTorchEMD CUDA extension (Bertsekas
auction, /root/reference/Utils/Utils.py:51-118).  The reference runs the
auction with ``eps=0.001`` for 10000 cheap sparse iterations on GPU; here
we run a *dense Jacobi auction with epsilon scaling* — every sweep is a
fully vectorized pass over the ``[N, M]`` value matrix (VPU-friendly,
static shapes), and scaling cuts the sweep count by orders of magnitude.

Semantics mirrored:
  * returns per-point squared distances under the (near-)optimal 1-1
    assignment, like ``emd.forward`` (Utils/Utils.py:77),
  * the eval metric applies the reference's ``mean * 36`` scale
    (Utils/Utils.py:118),
  * backward pass treats the assignment as fixed:
    ``d/dx1 = 2 * (x1 - x2[assignment])`` and zero into ``x2``
    (Utils/Utils.py:84-92).

Epsilon-scaled auction is near-optimal: total cost is within ``n * eps_min``
of the true optimum (Bertsekas 1988); tests check against
``scipy.optimize.linear_sum_assignment`` on small instances.

Known limitation: clouds with massive exact-duplicate structure (e.g. a
cloud matched against itself) are the worst case for auction tie-breaking
and may exhaust the sweep budget at a coarse epsilon; the op then returns
the best *complete* matching found (graceful degradation).  Matching two
distinct scans — the actual eval workload — converges quickly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from .distance import square_distance


def _auction_sweep(D, price, assign, owner, eps):
    """One dense Jacobi auction sweep: every unassigned row bids for its
    best column; each contested column takes the highest bid."""
    n, m = D.shape
    rows = jnp.arange(n, dtype=jnp.int32)
    cols = jnp.arange(m, dtype=jnp.int32)

    bidding = assign < 0  # [n]
    V = D + price[None, :]  # [n, m]
    # top-2 minima via two min-reductions (cheaper than lax.top_k)
    v1 = jnp.min(V, axis=-1)
    j1 = jnp.argmin(V, axis=-1).astype(jnp.int32)
    V2 = jnp.where(cols[None, :] == j1[:, None], jnp.inf, V)
    v2 = jnp.min(V2, axis=-1)
    incr = v2 - v1 + eps  # bid increment, >= eps

    bid = jnp.where(bidding, incr, -jnp.inf)
    # column-wise max bid
    col_max = jnp.full((m,), -jnp.inf, dtype=D.dtype).at[j1].max(bid)
    # winner row per column (lowest row index among max bidders)
    is_winner_bid = bidding & (bid == col_max[j1]) & jnp.isfinite(bid)
    col_winner = (
        jnp.full((m,), n, dtype=jnp.int32)
        .at[j1]
        .min(jnp.where(is_winner_bid, rows, n))
    )
    has_winner = col_winner < n  # [m]

    # raise prices on contested columns
    price = jnp.where(has_winner, price + col_max, price)

    # evict previous owners of contested columns
    evicted = has_winner[assign.clip(0)] & (assign >= 0)
    assign = jnp.where(evicted, -1, assign)

    # winners take their columns.  A row bids for exactly one column so
    # it can win at most one; uncontested columns have col_winner == n,
    # which the 'drop' scatter mode discards.
    won_col = (
        jnp.full((n,), -1, dtype=jnp.int32)
        .at[col_winner]
        .set(jnp.arange(m, dtype=jnp.int32), mode="drop")
    )
    assign = jnp.where(won_col >= 0, won_col, assign)
    owner = jnp.where(has_winner, col_winner, owner)
    return price, assign, owner


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def emd_assignment_dist(
    xyz1: jax.Array, xyz2: jax.Array, eps: float = 0.001, iters: int = 2048
):
    """Per-point squared distance under an auction-computed assignment.

    Args:
      xyz1: ``[N, 3]``.
      xyz2: ``[N, 3]`` (same cardinality).
      eps: final auction epsilon, RELATIVE to the largest pairwise
        squared distance (optimality gap ~= N * eps * max(D)).
      iters: total sweep budget, split across the scaling phases.

    Returns:
      ``(dist [N], assignment [N], converged [])`` — squared distance from
      each point of ``xyz1`` to its assigned partner in ``xyz2``, and a
      scalar bool: True iff the auction reached a complete matching at the
      target epsilon (False = the value is the best complete matching seen
      at a coarser epsilon, or an incomplete fallback — see module notes
      on duplicate-heavy clouds).
    """
    return _emd_forward_impl(xyz1, xyz2, eps, iters)


def _emd_forward_impl(xyz1, xyz2, eps, iters):
    n = xyz1.shape[0]
    m = xyz2.shape[0]

    # On TPU at scale, route to the blocked Gauss-Seidel auction kernel
    # (pallas_kernels/auction_tpu.py): no [n, m] matrix in HBM, n/256
    # price rounds per pass, serial chain-chasing for the displacement
    # tail.  Measured @16k real LiDAR: complete annealed matching in
    # ~2.2 s vs 94 s NOT-converged for the Jacobi sweeps below.  The
    # XLA path remains the reference implementation (and the CPU path —
    # the kernel's interpret mode is too slow at scale).
    if n == m and n >= 1024 and jax.default_backend() == "tpu":
        from .pallas_kernels.auction_tpu import emd_auction_tpu

        return emd_auction_tpu(
            xyz1, xyz2, eps, max_passes=min(max(iters // 8, 64), 1024)
        )

    D = square_distance(xyz1[None], xyz2[None])[0]  # [n, m]

    # Costs are NORMALIZED by their max so ``eps`` is scale-relative
    # (certificate: total cost within n * eps * d_scale of optimal).
    # With absolute eps, real LiDAR (squared distances up to ~4e4 m^2)
    # needed ~12 annealing phases to cross 7 decades and the sweep budget
    # died in duplicate-heavy price wars (measured: 4096 pts never
    # completed in 32k sweeps); normalized, the anneal path is fixed at
    # 4 phases for any input scale.
    d_scale = jnp.maximum(jnp.max(D), 1e-12)
    D = D / d_scale
    eps0 = jnp.asarray(0.25, D.dtype)
    eps_t = jnp.asarray(eps, D.dtype)

    def cond(state):
        sweep, eps_cur, price, assign, owner, best, has_best = state
        done = jnp.logical_and(eps_cur <= eps_t, jnp.all(assign >= 0))
        return jnp.logical_and(sweep < iters, jnp.logical_not(done))

    def body(state):
        sweep, eps_cur, price, assign, owner, best, has_best = state
        complete = jnp.all(assign >= 0)
        # snapshot complete matchings (monotone improvement: later = finer eps)
        best = jnp.where(complete, assign, best)
        has_best = jnp.logical_or(has_best, complete)
        # anneal and re-open when complete but not yet at target eps
        anneal = jnp.logical_and(complete, eps_cur > eps_t)
        eps_cur = jnp.where(anneal, jnp.maximum(eps_cur * 0.25, eps_t), eps_cur)
        assign = jnp.where(anneal, -1, assign)
        owner = jnp.where(anneal, -1, owner)
        price, assign, owner = _auction_sweep(D, price, assign, owner, eps_cur)
        return sweep + 1, eps_cur, price, assign, owner, best, has_best

    init = (
        jnp.int32(0),
        eps0,
        jnp.zeros((m,), dtype=D.dtype),
        jnp.full((n,), -1, dtype=jnp.int32),
        jnp.full((m,), -1, dtype=jnp.int32),
        jnp.full((n,), -1, dtype=jnp.int32),
        jnp.asarray(False),
    )
    _, eps_end, _, assign, _, best, has_best = lax.while_loop(cond, body, init)

    complete = jnp.all(assign >= 0)
    converged = jnp.logical_and(complete, eps_end <= eps_t)
    final = jnp.where(complete, assign, jnp.where(has_best, best, assign))
    safe_assign = final.clip(0, m - 1)
    nn = xyz2[safe_assign]
    dist = jnp.sum((xyz1 - nn) ** 2, axis=-1)
    return dist, safe_assign, converged


def _emd_fwd(xyz1, xyz2, eps, iters):
    dist, assign, converged = _emd_forward_impl(xyz1, xyz2, eps, iters)
    return (dist, assign, converged), (xyz1, xyz2, assign)


def _emd_bwd(eps, iters, res, g):
    xyz1, xyz2, assign = res
    g_dist = g[0]
    grad1 = 2.0 * (xyz1 - xyz2[assign]) * g_dist[:, None]
    return grad1, jnp.zeros_like(xyz2)


emd_assignment_dist.defvjp(_emd_fwd, _emd_bwd)


def _sparse_sweep(Dc, cidx, price, assign, owner, eps):
    """One Jacobi auction sweep restricted to per-row candidate columns.

    Dc ``[n,k]`` exact squared distances to the candidate columns
    ``cidx [n,k]``; otherwise identical semantics to :func:`_auction_sweep`
    (price scatter-max, lowest-row tie-break, single-bid-per-row), at
    ``O(n*k)`` instead of ``O(n*m)`` per sweep.
    """
    n, k = Dc.shape
    m = price.shape[0]
    rows = jnp.arange(n, dtype=jnp.int32)

    bidding = assign < 0
    V = Dc + price[cidx]  # [n, k]
    loc1 = jnp.argmin(V, axis=-1).astype(jnp.int32)
    v1 = jnp.take_along_axis(V, loc1[:, None], axis=-1)[:, 0]
    j1 = jnp.take_along_axis(cidx, loc1[:, None], axis=-1)[:, 0]
    V2 = jnp.where(
        jnp.arange(k, dtype=jnp.int32)[None, :] == loc1[:, None], jnp.inf, V
    )
    v2 = jnp.min(V2, axis=-1)
    incr = v2 - v1 + eps

    bid = jnp.where(bidding, incr, -jnp.inf)
    col_max = jnp.full((m,), -jnp.inf, dtype=Dc.dtype).at[j1].max(bid)
    is_winner_bid = bidding & (bid == col_max[j1]) & jnp.isfinite(bid)
    col_winner = (
        jnp.full((m,), n, dtype=jnp.int32)
        .at[j1]
        .min(jnp.where(is_winner_bid, rows, n))
    )
    has_winner = col_winner < n

    price = jnp.where(has_winner, price + col_max, price)
    evicted = has_winner[assign.clip(0)] & (assign >= 0)
    assign = jnp.where(evicted, -1, assign)
    won_col = (
        jnp.full((n,), -1, dtype=jnp.int32)
        .at[col_winner]
        .set(jnp.arange(m, dtype=jnp.int32), mode="drop")
    )
    assign = jnp.where(won_col >= 0, won_col, assign)
    owner = jnp.where(has_winner, col_winner, owner)
    return price, assign, owner


def _emd_sparse_impl(xyz1, xyz2, eps, iters, k, rounds, gap_tol=None):
    """kNN-restricted auction + global eps-CS validation rounds.

    Phase structure (all static shapes, one jitted while_loop per phase):
      1. candidates = kNN(k) of xyz1 into xyz2 (exact distances recomputed
         from indices — the kernel's packed-key quantization contract);
      2. epsilon-scaled Jacobi auction over the [n, k] candidate matrix —
         each sweep is O(n*k) instead of O(n*m);
      3. validation: ONE dense [n, m] pass computes every row's true
         global best value at the current prices; rows whose assigned
         value violates eps-complementary-slackness get their global
         argmin column spliced into their candidate set (replacing their
         worst candidate), are re-opened, and the auction resumes.
    No violations => the matching satisfies GLOBAL eps-CS — the same
    optimality certificate the dense auction gives (cost within n*eps of
    optimal, Bertsekas 1988) at a fraction of the sweep cost.  The dense
    matrix is touched ~``rounds`` times total instead of every sweep.
    """
    from .knn import knn

    n = xyz1.shape[0]
    m = xyz2.shape[0]
    _, cidx0 = knn(xyz1[None], xyz2[None], k)
    cidx0 = cidx0[0]  # [n, k]
    diff = xyz1[:, None, :] - xyz2[cidx0]  # exact recompute from idx
    Dc0 = jnp.sum(diff * diff, axis=-1)

    # normalized costs: eps is relative to the max GLOBAL cost (same
    # normalization as _emd_forward_impl; certificate n * eps * d_scale).
    # The global max (not the candidate max) also bounds every value the
    # validation pass can splice in, keeping normalized costs <= 1.
    d2max = jnp.max(jnp.sum(xyz1 * xyz1, axis=-1)) + jnp.max(
        jnp.sum(xyz2 * xyz2, axis=-1)
    )
    d_scale = jnp.maximum(2.0 * d2max, 1e-12)
    Dc0 = Dc0 / d_scale
    eps_t = jnp.asarray(eps, Dc0.dtype)
    sweeps_per = jnp.int32(max(iters // max(rounds, 1), 1))

    def auction_phase(carry):
        """Run restricted sweeps (with eps annealing) until complete at
        eps_t or the phase budget runs out."""
        Dc, cidx, price, assign, owner, eps_cur, budget = carry

        def cond(st):
            s, eps_c, price, assign, owner = st
            done = jnp.logical_and(eps_c <= eps_t, jnp.all(assign >= 0))
            return jnp.logical_and(s < budget, jnp.logical_not(done))

        def body(st):
            s, eps_c, price, assign, owner = st
            complete = jnp.all(assign >= 0)
            anneal = jnp.logical_and(complete, eps_c > eps_t)
            eps_c = jnp.where(anneal, jnp.maximum(eps_c * 0.25, eps_t), eps_c)
            assign = jnp.where(anneal, -1, assign)
            owner = jnp.where(anneal, -1, owner)
            price, assign, owner = _sparse_sweep(
                Dc, cidx, price, assign, owner, eps_c
            )
            return s + 1, eps_c, price, assign, owner

        st = (jnp.int32(0), eps_cur, price, assign, owner)
        _, eps_cur, price, assign, owner = lax.while_loop(cond, body, st)
        return Dc, cidx, price, assign, owner, eps_cur

    def round_body(state):
        rnd, Dc, cidx, price, assign, owner, eps_cur, n_viol = state
        Dc, cidx, price, assign, owner, eps_cur = auction_phase(
            (Dc, cidx, price, assign, owner, eps_cur, sweeps_per)
        )
        # dense validation at current prices (the only [n, m] pass)
        V = (
            square_distance(xyz1[None], xyz2[None])[0] / d_scale
            + price[None, :]
        )
        gmin = jnp.min(V, axis=-1)
        garg = jnp.argmin(V, axis=-1).astype(jnp.int32)
        a_safe = assign.clip(0, m - 1)
        vassigned = (
            jnp.sum((xyz1 - xyz2[a_safe]) ** 2, axis=-1) / d_scale
            + price[a_safe]
        )
        tol = eps_cur * (1.0 + 1e-4) + 1e-6
        viol = (assign < 0) | (vassigned > gmin + tol)
        n_viol = jnp.sum(viol)
        # splice the global argmin column over the row's worst candidate
        Vc = Dc + price[cidx]
        worst = jnp.argmax(Vc, axis=-1).astype(jnp.int32)
        k_iota = jnp.arange(k, dtype=jnp.int32)[None, :]
        put = viol[:, None] & (k_iota == worst[:, None])
        cidx = jnp.where(put, garg[:, None], cidx)
        dnew = jnp.sum((xyz1 - xyz2[garg]) ** 2, axis=-1) / d_scale
        Dc = jnp.where(put, dnew[:, None], Dc)
        # re-open violating rows (and free their columns)
        freed = jnp.full((m,), False).at[a_safe].max(viol & (assign >= 0))
        owner = jnp.where(freed, -1, owner)
        assign = jnp.where(viol, -1, assign)
        return rnd + 1, Dc, cidx, price, assign, owner, eps_cur, n_viol

    def round_cond(state):
        rnd, _, _, _, assign, _, eps_cur, n_viol = state
        unresolved = (n_viol > 0) | jnp.any(assign < 0) | (eps_cur > eps_t)
        return (rnd < rounds) & unresolved

    init = (
        jnp.int32(0), Dc0, cidx0,
        jnp.zeros((m,), Dc0.dtype),
        jnp.full((n,), -1, jnp.int32),
        jnp.full((m,), -1, jnp.int32),
        jnp.asarray(0.25, Dc0.dtype),
        jnp.int32(1),
    )
    _, Dc, cidx, price, assign, owner, eps_end, n_viol = lax.while_loop(
        round_cond, round_body, init
    )

    # ---- dense finishing phase -------------------------------------
    # Real LiDAR pairs have strong density mismatch: ~2-3% of the
    # optimal edges are long-range (measured: p99 edge cost 300x p50)
    # and NO kNN candidate set contains them — the restricted graph has
    # no perfect matching and the sparse phase alone cannot complete.
    # The sparse phase is a cheap warm start (prices + most assignments);
    # the dense annealed auction finishes the stragglers on the full
    # [n, m] matrix in a few dozen sweeps instead of running dense from
    # scratch.
    Dn = square_distance(xyz1[None], xyz2[None])[0] / d_scale
    dense_budget = jnp.int32(max(iters // 4, 256))

    def dcond(st):
        sweeps, eps_c, price, assign, owner = st
        done = jnp.logical_and(eps_c <= eps_t, jnp.all(assign >= 0))
        return jnp.logical_and(sweeps < dense_budget, ~done)

    def dbody(st):
        sweeps, eps_c, price, assign, owner = st
        complete = jnp.all(assign >= 0)
        anneal = jnp.logical_and(complete, eps_c > eps_t)
        eps_c = jnp.where(anneal, jnp.maximum(eps_c * 0.25, eps_t), eps_c)
        assign = jnp.where(anneal, -1, assign)
        owner = jnp.where(anneal, -1, owner)
        price, assign, owner = _auction_sweep(Dn, price, assign, owner, eps_c)
        return sweeps + 1, eps_c, price, assign, owner

    _, eps_end, price, assign, owner = lax.while_loop(
        dcond, dbody, (jnp.int32(0), eps_end, price, assign, owner)
    )

    # ---- duality-gap certificate (one dense pass) ------------------
    # For the assignment LP (min sum c_ij x_ij): with v_j = -p_j and
    # u_i = min_j (c_ij + p_j), (u, v) is dual-feasible, so
    #   LB = sum_i min_j (c_ij + p_j) - sum_j p_j
    # lower-bounds the optimum.  The measured primal-dual gap certifies
    # THIS run on THIS input — far stronger than the worst-case n*eps
    # bound (which for eps=1e-3 at n=4096 is ~40% of a typical real-pair
    # cost and useless).
    safe_assign = assign.clip(0, m - 1)
    dist = jnp.sum((xyz1 - xyz2[safe_assign]) ** 2, axis=-1)
    converged = jnp.all(assign >= 0)
    if gap_tol is not None:
        # Optional MEASURED primal-dual gap gate.  The auction's own
        # eps-CS bound (cost <= opt + n * eps * d_scale) already holds
        # whenever the matching is complete — every phase re-opens all
        # rows, so the final phase certifies every row at eps_t, and
        # later price rises on non-assigned columns only raise the row's
        # global min.  The measured gap is strictly tighter ONLY when the
        # dual prices are strong; on heavy-tailed real LiDAR costs the
        # dual stays weak (measured LB/opt 0.37 at 1024 pts, and
        # c-transform coordinate ascent is a fixed point after one step —
        # it cannot be tightened post-hoc), so this gate is opt-in.
        primal_n = jnp.sum(dist) / d_scale
        lb_n = (
            jnp.sum(jnp.min(Dn + price[None, :], axis=-1)) - jnp.sum(price)
        )
        gap_rel = (primal_n - lb_n) / jnp.maximum(primal_n, 1e-12)
        converged = converged & (gap_rel <= gap_tol)
    return dist, safe_assign, converged


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def emd_assignment_sparse(
    xyz1: jax.Array, xyz2: jax.Array, eps: float = 0.001,
    iters: int = 8192, k: int = 48, rounds: int = 8,
    gap_tol=None,
):
    """kNN-restricted auction EMD with a global eps-CS certificate.

    Same contract as :func:`emd_assignment_dist` (per-point squared
    distances, assignment, converged flag; fixed-assignment VJP matching
    /root/reference/Utils/Utils.py:84-92) but each sweep costs ``O(n*k)``
    instead of ``O(n*m)`` and the dense matrix is touched only ~``rounds``
    times for validation.  A dense annealed finishing phase completes the
    stragglers whose optimal partner no kNN candidate set contains
    (real LiDAR density mismatch makes the restricted graph infeasible —
    measured ~2-3%% of optimal edges are long-range).

    ``converged=True`` == complete matching under GLOBAL eps-CS, i.e.
    cost <= optimal + n * eps * max(D) — the same certificate the dense
    auction gives.  Pass ``gap_tol`` to additionally require a MEASURED
    relative primal-dual gap below it (only achievable on well-matched
    pairs; see the in-line note in ``_emd_sparse_impl``).

    Opt-in: NOT routed from :func:`emd`.  On severely density-mismatched
    real LiDAR pairs the restricted auction may fail to complete within
    the sweep budget (Jacobi price wars among ~10%% duplicate points
    serialize one winner per column per sweep) — check ``converged``.
    """
    return _emd_sparse_impl(xyz1, xyz2, eps, iters, k, rounds, gap_tol)


def _emd_sparse_fwd(xyz1, xyz2, eps, iters, k, rounds, gap_tol):
    out = _emd_sparse_impl(xyz1, xyz2, eps, iters, k, rounds, gap_tol)
    return out, (xyz1, xyz2, out[1])


def _emd_sparse_bwd(eps, iters, k, rounds, gap_tol, res, g):
    xyz1, xyz2, assign = res
    grad1 = 2.0 * (xyz1 - xyz2[assign]) * g[0][:, None]
    return grad1, jnp.zeros_like(xyz2)


emd_assignment_sparse.defvjp(_emd_sparse_fwd, _emd_sparse_bwd)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def sinkhorn_emd(pc1: jax.Array, pc2: jax.Array, reg: float = 0.05,
                 iters: int = 500, return_bounds: bool = False):
    """Entropic-OT (Sinkhorn) approximation of the EMD metric — ~10x
    faster than the auction at 16k points (all dense VPU passes, fixed
    iteration count, fully jittable).

    Eval-grade recipe (VERDICT round-1 item 6):

    * log-domain Sinkhorn with uniform marginals and **epsilon
      annealing**: geometric decay over the first half of the iterations
      from 0.1x the mean pairwise distance down to ``reg`` x the mean
      NEAREST-NEIGHBOR distance (the scale the matching cost actually
      lives at — near-identical eval pairs have matching cost orders of
      magnitude below the mean pairwise distance), then fixed;
    * **primal upper bound**: the plan rounded onto the transport
      polytope (Altschuler et al. 2017 — row-scale, column-scale, rank-1
      deficit correction), so a non-converged plan can never
      under-report;
    * **dual lower bound**: the c-transform ``g_c = min_i(D_ij - f_i)``
      makes ``(f, g_c)`` LP-dual-feasible, so ``mean(f) + mean(g_c)``
      certifies from below;
    * returned value = midpoint; true error <= half the bracket width.

    Measured against ``scipy.optimize.linear_sum_assignment`` on 256 and
    1024-pt pairs (drifted and independent clouds): within 2.5% at the
    defaults, <=0.2% on the realistic drifted-pair eval workload
    (tests/test_ops.py::TestSinkhornEmd).  A 16,384-pt pair takes ~3.3 s
    on one v5e chip (vs 14.6 s for the auction); the per-iteration cost
    is two HBM passes over the [N, N] fp32 cost matrix, so time scales
    linearly with ``iters`` if a looser bracket is acceptable.  Use
    ``emd`` (auction) when exactness matters more than throughput.

    Returns the batch-mean cost scaled by the reference's x36 convention
    (Utils/Utils.py:118); with ``return_bounds=True``, also the batch-mean
    (lower, upper) certificates at the same scale.
    """
    anneal = max(int(iters * 0.5), 1)

    def one(pair):
        a, b = pair
        D = square_distance(a[None], b[None])[0]  # [n, m]
        n, m = D.shape
        scale = jnp.maximum(jnp.mean(jnp.min(D, axis=1)), 1e-12)
        eps_f = reg * scale
        eps_0 = 0.1 * jnp.maximum(jnp.mean(D), 1e-12)
        decay = (eps_f / eps_0) ** (1.0 / anneal)
        log_mu = -jnp.log(n)
        log_nu = -jnp.log(m)
        f = jnp.zeros((n,), D.dtype)
        g = jnp.zeros((m,), D.dtype)

        def body(i, fg):
            f, g = fg
            eps = jnp.maximum(eps_0 * decay ** i, eps_f)
            # f_i = eps * (log mu_i - LSE_j((g_j - D_ij)/eps))
            f = eps * (
                log_mu - jax.nn.logsumexp((g[None, :] - D) / eps, axis=1)
            )
            g = eps * (
                log_nu - jax.nn.logsumexp((f[:, None] - D) / eps, axis=0)
            )
            return f, g

        f, g = lax.fori_loop(0, iters, body, (f, g))
        P = jnp.exp((f[:, None] + g[None, :] - D) / eps_f)
        # primal: round to the transport polytope
        r = jnp.minimum(1.0, (1.0 / n) / jnp.maximum(P.sum(1), 1e-30))
        P = P * r[:, None]
        c = jnp.minimum(1.0, (1.0 / m) / jnp.maximum(P.sum(0), 1e-30))
        P = P * c[None, :]
        err_r = 1.0 / n - P.sum(1)  # >= 0
        err_c = 1.0 / m - P.sum(0)
        s = jnp.maximum(err_r.sum(), 1e-30)
        ub = jnp.sum(P * D) + jnp.dot(err_r, jnp.dot(D, err_c)) / s
        # dual: c-transform of f is LP-feasible
        g_c = jnp.min(D - f[:, None], axis=0)
        lb = jnp.mean(f) + jnp.mean(g_c)
        return lb, ub

    lbs, ubs = lax.map(one, (pc1, pc2))
    lb = 36.0 * jnp.mean(lbs)
    ub = 36.0 * jnp.mean(ubs)
    mid = 0.5 * (lb + ub)
    if return_bounds:
        return mid, (lb, ub)
    return mid


def emd(pc1: jax.Array, pc2: jax.Array, eps: float = 0.001, iters: int = 2048):
    """Batched EMD metric matching the reference's ``EMD`` helper.

    Args:
      pc1, pc2: ``[B, N, 3]`` point clouds (channels-last).

    Returns:
      scalar — mean per-point assigned squared distance * 36
      (the reference's scale, Utils/Utils.py:118).

    Always routes through the dense annealed auction: the kNN-restricted
    auction (:func:`emd_assignment_sparse`) is ~10x cheaper per sweep but
    measured NON-CONVERGENT on real LiDAR pairs (density mismatch makes
    the restricted graph infeasible; uniq 3320/4096 after 32k sweeps) —
    callers that can check its ``converged`` flag may opt in explicitly.
    """

    def one(pair):
        a, b = pair
        dist, _, _ = emd_assignment_dist(a, b, eps, iters)
        return jnp.mean(dist)

    dists = lax.map(one, (pc1, pc2))
    return 36.0 * jnp.mean(dists)
