"""Adaptive attentive points fusion — PointINet's core novelty, vmapped.

The reference implements the t-adaptive sample/kNN split with a python
loop over the batch and dynamic tensor sizes
(/root/reference/Utils/Layers.py:195-381, PointINet20230424/models/layers.py:335-430).
Here the same math runs with static shapes:

  * adaptive sampling (N1 = N - floor(N*t) points from warped cloud 1,
    N2 = floor(N*t) from cloud 2): shuffle each cloud once, then build the
    combined cloud by *prefix selection* — slot j takes cloud1[perm1[j]]
    for j < N1 else cloud2[perm2[j - N1]];
  * adaptive kNN (k1 = k - floor(k*t) neighbors from cloud 1, k2 from
    cloud 2): query k neighbors from each cloud's valid prefix
    (ops.knn_prefix), then *compact* the per-sample k1+k2=k winning slots
    into a dense [B, N, k] block with one gather.

Because the compacted block holds exactly the neighbors the reference
would have produced, the MLP, BatchNorm statistics and attention softmax
all see identical data — no mask algebra leaks into the numerics.

Sampling flavors (constructor arg):
  * "random" — shuffle with an RNG (the published PointINet behavior,
    PointINet20230424/models/layers.py:402-404);
  * "fps"    — farthest-point ordering (the ISAPCI Sample behavior,
    Utils/Layers.py:246-262), using FPS's prefix-stability; costs a full
    N-iteration FPS ordering per cloud.
"""

from __future__ import annotations

import os
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .. import ops
from . import policy
from .mlp import PointMLP


def _safe_norm(x, axis=-1, keepdims=True, eps=1e-12):
    """Norm with a well-defined gradient at 0 (a combined point's nearest
    neighbor is itself, so zero offsets are the common case, and
    d|x|/dx at 0 would be NaN)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims) + eps)


def _prefix_merge(a, b, split, axis):
    """Merge two equal-shape arrays along `axis`: first `split` (per-batch)
    slots from `a`, the rest from the front of `b`.  Static shapes.

    Small merge axes (the k-neighbor axis) go through a one-hot matmul —
    a take_along_axis over a 32-wide axis of a [B,N,32,4] tensor costs
    ~46ms at 16k points on v5e (elementwise gather), the einsum <1ms.
    """
    size = a.shape[axis]
    if axis == a.ndim - 2 and size <= 256:
        s = jnp.arange(size, dtype=jnp.int32)
        # target index into concat([a, b], axis): s if s < split else
        # size + (s - split)
        tgt = jnp.where(
            s[None, :] < split[:, None],
            s[None, :],
            size + s[None, :] - split[:, None],
        )  # [B, size]
        onehot = (
            tgt[:, :, None] == jnp.arange(2 * size, dtype=jnp.int32)[None, None, :]
        ).astype(a.dtype)  # [B, size, 2*size]
        cat = jnp.concatenate([a, b], axis=axis)
        # [B, ..., 2*size, C] x [B, size, 2*size] -> [B, ..., size, C]
        bshape = (onehot.shape[0],) + (1,) * (a.ndim - 3) + onehot.shape[1:]
        oh = onehot.reshape(bshape)
        return jnp.einsum(
            "...jc,...sj->...sc", cat, oh, preferred_element_type=a.dtype
        )
    # (a dynamic_slice-of-padded-concat variant for the big axis was
    # measured slower than the gather on v5e; the gather stays)
    pos = jnp.arange(size, dtype=jnp.int32)
    pos_b = pos.reshape([1] * axis + [size] + [1] * (a.ndim - axis - 1))
    bshape = [1] * a.ndim
    bshape[0] = split.shape[0]
    split_b = split.reshape(bshape)
    take_a = pos_b < split_b
    idx_b = jnp.clip(pos_b - split_b, 0, size - 1)
    b_shifted = jnp.take_along_axis(
        b, jnp.broadcast_to(idx_b, a.shape), axis=axis
    )
    return jnp.where(jnp.broadcast_to(take_a, a.shape), a, b_shifted)


# Adaptive-split alignment grain: N2 rounds to a multiple of _ALIGN so no
# candidate bucket of the fused TPU kernel straddles the two segments.  A
# <= _ALIGN/2-point shift of a RANDOM split (the reference samples the
# subsets randomly anyway); applied on every backend so CPU tests see the
# TPU semantics.  32 = the fused kernel's bucket length (A/B on v5e @16k:
# bucket 16 -> 5.1 ms at 0.986 recall, 32 -> 3.6 ms at 0.973, 64 -> 2.9 ms
# at 0.945; 32 is the speed/recall knee, and 0.97 matches the approx-kNN
# recall already accepted throughout the flow layers).
_ALIGN = int(os.environ.get("PCI_TPU_FUSION_BUCKET", "32"))
# Bucket candidates kept per min phase of the flat fused kernel
# (fusion_knn_tpu winners): (l=64, W=2) keeps the extraction row count of
# (l=32, W=1) at better collision tolerance; (l=128, W=2) halves it.
# Env-tunable so the on-chip sweep can A/B end-to-end without edits.
_FUSION_WINNERS = int(os.environ.get("PCI_TPU_FUSION_WINNERS", "1"))


def _random_perms(key, B, N):
    """Per-batch random permutations ``[B, N]`` for the fusion shuffle.

    Default = ``jax.random.permutation`` (a key sort — exact uniform
    shuffle, the reference's ``torch.randperm`` analog).  Env
    ``PCI_TPU_FUSION_PERM=hash`` + power-of-two N switches to a SORT-
    FREE bijective hash (odd-multiply mod 2^b, xor-rshift, add — each
    step is a bijection on [0, 2^b)): the subset selection only needs a
    well-spread random bijection, not an exactly uniform shuffle, and
    the two 16k key sorts per fusion call are pure elementwise math
    here.  The bench accuracy gate guards the CD impact."""
    if (os.environ.get("PCI_TPU_FUSION_PERM") == "hash"
            and N & (N - 1) == 0 and N >= 4):
        bits = N.bit_length() - 1
        c = jax.random.randint(
            key, (B, 6), 0, jnp.int32(2**31 - 1), dtype=jnp.int32)
        x = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
        mask = N - 1
        for j in range(3):
            mult = (c[:, 2 * j] | 1)[:, None]  # odd => bijective mod 2^b
            x = (x * mult) & mask
            x = x ^ (x >> max(bits // 2, 1))
            x = (x + c[:, 2 * j + 1][:, None]) & mask
        return x
    return jax.vmap(lambda kk: jax.random.permutation(kk, N))(
        jax.random.split(key, B)
    )


def _adaptive_budgets(N, k, t):
    """(N1, N2, k1, k2) with N2 aligned; guarantees N_i >= _ALIGN whenever
    k_i > 0 so budgeted slots always hold real neighbors."""
    k2 = jnp.floor(k * t).astype(jnp.int32)
    k1 = k - k2
    N2 = (jnp.floor(N * t / _ALIGN + 0.5) * _ALIGN).astype(jnp.int32)
    N2 = jnp.maximum(N2, _ALIGN * (k2 > 0))
    N2 = jnp.minimum(N2, N - _ALIGN * (k1 > 0))
    return N - N2, N2, k1, k2


def _fused_kernel_ok(points, k):
    return (
        jax.default_backend() == "tpu"
        and points.shape[-1] == 3
        and points.shape[-2] >= 4096
        and points.shape[-2] % _ALIGN == 0
        and k <= 128
    )


# Above this combined-cloud size the flat fusion kernel's O(N^2/l) bucket
# phase loses to the cell-pruned route — the paper's 65,536-pt protocol
# row (Table 6) runs here.  The 2-segment single-pass kernel carries the
# flat kernel's fixed-neighbor VJP (knn_fusion_cells_grad), so training
# routes here too; the F>2 2-pass route stays eval-only (no VJP).
_CELLS_FUSION_N = 32768


def _cells_route_ok(points, k, train, n_seg=2):
    return (
        (n_seg == 2 or not train)
        and jax.default_backend() == "tpu"
        and points.shape[-2] >= _CELLS_FUSION_N
        and k <= 64
    )


def _cells_fusion_knn(combined, seg_ends, budgets, k, emit_idx=False, *,
                      chunk=512, m_chunks=16, bucket=16, winners=2,
                      tile=256, interpret=False, single_pass=None):
    """Segment-restricted self-kNN at large N: one ``key_valid``-masked
    cell-pruned pass per segment (ops/pallas_kernels/knn_cells_tpu.py),
    then budget compaction — the XLA fallback's own two-phase structure
    with ``knn_prefix`` swapped for ``knn_cells``.  Surplus budget slots
    (segment held fewer candidates than its budget) become zero-residual
    self-neighbors, matching the flat fused kernel's convention."""
    from ..ops.pallas_kernels.knn_cells_tpu import knn_cells

    B, N, _ = combined.shape
    F = seg_ends.shape[1]
    if single_pass is None:
        single_pass = F == 2
    if single_pass:
        assert F == 2, "single-pass kernel is two-segment only"
        # single-pass kernel: one distance evaluation per scanned chunk
        # (shared by both segments' bucket minima) and exactly k
        # extraction rounds total — the 2-pass route below pays both
        # twice (ops/pallas_kernels/fusion_cells_tpu.py).  The grad
        # wrapper carries the fixed-neighbor VJP (training at 32k+).
        from ..ops.pallas_kernels.fusion_cells_tpu import (
            knn_fusion_cells_grad,
        )

        idx, resi = knn_fusion_cells_grad(
            combined, seg_ends[:, 0], budgets[:, 0], k, chunk,
            m_chunks, bucket, winners, tile, interpret,
        )
        if emit_idx:
            return idx, resi
        return resi
    pos = jnp.arange(N, dtype=jnp.int32)[None, :]
    qpos = jnp.broadcast_to(pos[:, :, None], (B, N, k))
    start = jnp.zeros((B, 1), jnp.int32)
    parts_r, parts_i = [], []
    for j in range(F):
        end = seg_ends[:, j : j + 1]
        valid = (pos >= start) & (pos < end)
        d, i, r = knn_cells(
            combined, combined, k, chunk=chunk, m_chunks=m_chunks,
            bucket=bucket, winners=winners, tile=tile,
            emit_resi=True, key_valid=valid, interpret=interpret,
        )
        far = d > 1e29
        parts_i.append(jnp.where(far, qpos, i))
        parts_r.append(jnp.where(far[..., None], 0.0, r))
        start = end
    resi = _budget_compact(parts_r, budgets, k)
    if emit_idx:
        # compact indices through the same one-hot matmul in fp32 (idx
        # < 2^24 is exact; a 32-wide int gather is pathological on TPU)
        fi = _budget_compact(
            [p[..., None].astype(jnp.float32) for p in parts_i], budgets, k
        )
        return jnp.round(fi[..., 0]).astype(jnp.int32), resi
    return resi


def _fusion_tail_ok(train: bool) -> bool:
    """Route the attention head (score MLP + softmax + weighted reduce)
    to the fused eval kernel (ops/pallas_kernels/fusion_tail_tpu.py).
    Module-level so TPU tests can monkeypatch it off."""
    return jax.default_backend() == "tpu" and not train


def _fold_fusion_mlp(module, mlp):
    """Materialized + folded score-MLP layers for a fused tail route.

    The dummy PointMLP call keeps the param tree identical to the XLA
    route (same "PointMLP_0" name) regardless of which branch runs."""
    from .layers import _fold_pointmlp

    dummy = jnp.zeros((1, 4), policy.compute_dtype())
    _ = PointMLP(mlp, norm="batch")(dummy, train=False)
    return _fold_pointmlp(module, "PointMLP_0", len(mlp))


def _fusion_oneshot_ok(train: bool) -> bool:
    """Route kNN + attention head to the ONE-SHOT kernel
    (fusion_knn_tpu.knn_fusion_attention: online softmax inside the
    extraction loop — no [B,N,k,3] residual block, no tail launch).
    Eval-only; PCI_TPU_FUSION_ONESHOT=0 restores the two-kernel route
    for A/B."""
    return (
        _fusion_tail_ok(train)
        and os.environ.get("PCI_TPU_FUSION_ONESHOT", "1") == "1"
    )


def _apply_fusion_tail(module, mlp, combined, resi, extra, train,
                       momentum):
    """Shared routed/XLA attention head for both fusion variants.

    Returns ``[B, N, 3 + Ce]`` fused rows (Ce = extra channels or 0)."""
    if _fusion_tail_ok(train) and not ops.has_tangents(
        combined, resi, extra, module.variables.get("params", {})
    ):  # no-VJP kernel: XLA fallback when a tangent could flow
        from ..ops.pallas_kernels.fusion_tail_tpu import (
            fusion_attention_tail,
        )

        return fusion_attention_tail(
            combined, resi, extra, _fold_fusion_mlp(module, mlp), len(mlp)
        )
    feats = jnp.concatenate([resi, _safe_norm(resi)], axis=-1)
    h = PointMLP(mlp, norm="batch")(feats, train=train, momentum=momentum)
    scores = jnp.max(h, axis=-1)  # channel max-pool -> [B,N,k]
    weights = jax.nn.softmax(policy.f32(scores), axis=-1)[..., None]
    # sum(w * nn) = combined + sum(w * resi): softmax weights sum to 1
    fused = combined + jnp.sum(weights * resi, axis=2)
    if extra is not None:
        fused = jnp.concatenate(
            [fused, jnp.sum(weights * extra, axis=2)], axis=-1
        )
    return fused


def _multi_budgets(N, k, w_head):
    """Per-cloud sample/neighbor budgets for F clouds (w_head ``[B,F-1]``,
    the last cloud absorbs remainders): ``(n_all [B,F], k_all [B,F])``
    with every n aligned to ``_ALIGN`` and the last cloud guaranteed
    >= ``_ALIGN`` points.  A <= _ALIGN/2-point perturbation per cloud of
    the reference's ``floor(N * w)`` budgets (Utils/Layers.py:309-318)."""
    k_budget = jnp.floor(k * w_head).astype(jnp.int32)
    n_b = (jnp.floor(N * w_head / _ALIGN + 0.5) * _ALIGN).astype(jnp.int32)
    n_b = jnp.maximum(n_b, _ALIGN * (k_budget > 0))
    cum = jnp.minimum(jnp.cumsum(n_b, axis=1), N - _ALIGN)
    n_b = jnp.diff(cum, axis=1, prepend=jnp.zeros_like(cum[:, :1]))
    n_all = jnp.concatenate([n_b, N - cum[:, -1:]], axis=1)
    # the cumsum clamp can clip a middle cloud to n==0 while its k budget
    # is positive; a zero-point cloud must get zero neighbor slots (the
    # freed budget goes to the last cloud, which always has >= _ALIGN
    # points) — otherwise the TPU kernel emits self-neighbors but the CPU
    # fallback emits out-of-cloud duplicates and backends diverge
    k_budget = jnp.where(n_b > 0, k_budget, 0)
    k_last = k - jnp.sum(k_budget, axis=1, keepdims=True)
    k_all = jnp.concatenate([k_budget, k_last], axis=1)
    return n_all, k_all


def _composed_shuffle_merge(points_list, perms, n_all):
    """Combined cloud = concat of each shuffled cloud's ``n_all[:, j]``
    prefix, via ONE gather from the concatenation (no per-cloud
    materialized shuffles + insert passes).

    Returns ``(combined [B,N,3], gidx [B,N])`` — gidx indexes the
    ``concat(points_list, axis=1)`` row space (owner * N + source row),
    reusable to carry per-point features through the same merge."""
    B, N, _ = points_list[0].shape
    F = len(points_list)
    pos = jnp.arange(N, dtype=jnp.int32)[None, :]
    cum = jnp.cumsum(n_all, axis=1)  # [B, F], last col == N
    owner = jnp.sum(
        (pos[:, :, None] >= cum[:, None, :-1]).astype(jnp.int32), axis=-1
    )  # [B, N] in [0, F)
    start = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), cum[:, :-1]], axis=1)
    local = pos - jnp.take_along_axis(start, owner, axis=1)
    perm_flat = jnp.stack(perms, axis=1).reshape(B, F * N)  # [B, F*N]
    src = jnp.take_along_axis(
        perm_flat, owner * N + jnp.clip(local, 0, N - 1), axis=1
    )
    gidx = owner * N + src
    combined = jnp.take_along_axis(
        jnp.concatenate(points_list, axis=1), gidx[..., None], axis=1
    )
    return combined, gidx


class PointsFusion(nn.Module):
    """Fuse two warped clouds into one, weighting 2*k adaptive neighbors
    with learned attention (Utils/Layers.py:195-283)."""

    mlp: Sequence[int] = (64, 64, 128)
    sampling: str = "random"  # "random" | "fps"

    def _orders(self, points1, points2, train=False):
        """Per-cloud sampling orders ``[B, N]`` (random or FPS)."""
        B, N, _ = points1.shape
        if self.sampling == "random":
            key = self.make_rng("sample")
            k_1, k_2 = jax.random.split(key)
            return _random_perms(k_1, B, N), _random_perms(k_2, B, N)
        if self.sampling == "fps":
            from .layers import fps_start

            return (
                ops.fps(points1, N, fps_start(self, points1, train)),
                ops.fps(points2, N, fps_start(self, points2, train)),
            )
        raise ValueError(f"unknown sampling {self.sampling!r}")

    @nn.compact
    def __call__(self, points1, points2, k: int, t, *, train=False, momentum=0.1):
        """points1/points2 ``[B,N,3]`` warped clouds, t ``[B]`` in (0,1).

        Returns fused cloud ``[B,N,3]``.
        """
        B, N, _ = points1.shape
        t = t.astype(jnp.float32)
        N1, N2, k1, k2 = _adaptive_budgets(N, k, t)
        perm1, perm2 = self._orders(points1, points2, train)

        # combined cloud = N1-prefix of shuffled cloud1 then N2-prefix of
        # shuffled cloud2, via ONE composed gather from the concatenation
        combined, _ = _composed_shuffle_merge(
            [points1, points2], [perm1, perm2],
            jnp.stack([N1, N2], axis=1),
        )

        if _cells_route_ok(points1, k, train):
            if _fusion_oneshot_ok(train) and not ops.has_tangents(
                combined, self.variables.get("params", {})
            ):  # no-VJP one-shot kernel
                from ..ops.pallas_kernels import knn_fusion_cells

                return knn_fusion_cells(
                    combined, N1, k1, k,
                    interpret=jax.default_backend() != "tpu",
                    tail_layers=_fold_fusion_mlp(self, self.mlp),
                )
            resi = _cells_fusion_knn(
                combined,
                jnp.stack([N1, jnp.full_like(N1, N)], axis=1),
                jnp.stack([k1, k2], axis=1), k,
            )
        elif _fused_kernel_ok(points1, k):
            from ..ops.pallas_kernels import (
                knn_fusion_adaptive,
                knn_fusion_attention,
            )

            if _fusion_oneshot_ok(train) and not ops.has_tangents(
                combined, self.variables.get("params", {})
            ):  # no-VJP one-shot kernel
                # kNN + attention head in ONE kernel (online softmax)
                seg_ends = jnp.stack(
                    [N1, jnp.full_like(N1, N)], axis=1)
                budgets = jnp.stack([k1, k2], axis=1)
                return knn_fusion_attention(
                    combined, seg_ends, budgets,
                    _fold_fusion_mlp(self, self.mlp), k, _ALIGN,
                    _FUSION_WINNERS,
                    interpret=jax.default_backend() != "tpu",
                )
            # two kernels: shared distance tiles, k1/k2-adaptive
            # extraction, pre-merged residual block (see fusion_knn_tpu)
            resi = knn_fusion_adaptive(combined, N1, k1, k, _ALIGN,
                                       winners=_FUSION_WINNERS)
        else:
            c1 = jnp.take_along_axis(points1, perm1[..., None], axis=1)
            c2 = jnp.take_along_axis(points2, perm2[..., None], axis=1)

            def neighbors(cloud, valid):
                _, idx = ops.knn_prefix(combined, cloud, k, valid)
                return ops.index_points(cloud, idx)

            nn1 = neighbors(c1, jnp.maximum(N1, 1))
            nn2 = neighbors(c2, jnp.maximum(N2, 1))
            nns = _prefix_merge(nn1, nn2, k1, axis=2)  # [B,N,k,3]
            resi = nns - combined[:, :, None, :]

        return _apply_fusion_tail(
            self, self.mlp, combined, resi, None, train, momentum
        )


class PointsFusionWithFeatures(nn.Module):
    """PointINet-original fusion that also carries a feature channel
    (intensity) through the attention weights
    (PointINet20230424/models/layers.py:335-430)."""

    mlp: Sequence[int] = (64, 64, 128)

    @nn.compact
    def __call__(
        self, points1, points2, feats1, feats2, k: int, t, *, train=False, momentum=0.1
    ):
        """points ``[B,N,3]``, feats ``[B,N,C]``, t ``[B]`` ->
        fused ``[B,N,3+C]``."""
        B, N, _ = points1.shape
        t = t.astype(jnp.float32)
        N1, N2, k1, k2 = _adaptive_budgets(N, k, t)

        key = self.make_rng("sample")
        k_1, k_2 = jax.random.split(key)
        perm1 = _random_perms(k_1, B, N)
        perm2 = _random_perms(k_2, B, N)
        combined, gidx = _composed_shuffle_merge(
            [points1, points2], [perm1, perm2], jnp.stack([N1, N2], axis=1)
        )
        combined_feats = jnp.take_along_axis(
            jnp.concatenate([feats1, feats2], axis=1), gidx[..., None], axis=1
        )

        if _cells_route_ok(points1, k, train):
            if _fusion_oneshot_ok(train) and not ops.has_tangents(
                combined, combined_feats,
                self.variables.get("params", {})
            ):  # no-VJP one-shot kernel
                from ..ops.pallas_kernels import knn_fusion_cells

                return knn_fusion_cells(
                    combined, N1, k1, k,
                    interpret=jax.default_backend() != "tpu",
                    tail_layers=_fold_fusion_mlp(self, self.mlp),
                    payload=combined_feats,
                )
            idx, resi = _cells_fusion_knn(
                combined,
                jnp.stack([N1, jnp.full_like(N1, N)], axis=1),
                jnp.stack([k1, k2], axis=1), k, emit_idx=True,
            )
            nfs = ops.index_points(combined_feats, idx)
        elif _fused_kernel_ok(points1, k):
            from ..ops.pallas_kernels import (
                knn_fusion_adaptive,
                knn_fusion_attention,
            )

            if _fusion_oneshot_ok(train) and not ops.has_tangents(
                combined, combined_feats,
                self.variables.get("params", {})
            ):  # no-VJP one-shot kernel
                # kNN + attention head + payload reduce in ONE kernel
                seg_ends = jnp.stack([N1, jnp.full_like(N1, N)], axis=1)
                budgets = jnp.stack([k1, k2], axis=1)
                return knn_fusion_attention(
                    combined, seg_ends, budgets,
                    _fold_fusion_mlp(self, self.mlp), k, _ALIGN,
                    _FUSION_WINNERS,
                    interpret=jax.default_backend() != "tpu",
                    payload=combined_feats,
                )
            idx, resi = knn_fusion_adaptive(
                combined, N1, k1, k, _ALIGN, emit_idx=True,
                winners=_FUSION_WINNERS,
            )
            nfs = ops.index_points(combined_feats, idx)
        else:
            c1 = jnp.take_along_axis(points1, perm1[..., None], axis=1)
            c2 = jnp.take_along_axis(points2, perm2[..., None], axis=1)
            # features must ride the SAME shuffle as their cloud — idx
            # indexes the shuffled cloud, so gather from shuffled feats
            sf1 = jnp.take_along_axis(feats1, perm1[..., None], axis=1)
            sf2 = jnp.take_along_axis(feats2, perm2[..., None], axis=1)

            def grouped(cloud, feat, valid):
                _, idx = ops.knn_prefix(combined, cloud, k, valid)
                return ops.index_points(cloud, idx), ops.index_points(feat, idx)

            nn1, nf1 = grouped(c1, sf1, jnp.maximum(N1, 1))
            nn2, nf2 = grouped(c2, sf2, jnp.maximum(N2, 1))
            nns = _prefix_merge(nn1, nn2, k1, axis=2)
            nfs = _prefix_merge(nf1, nf2, k1, axis=2)
            resi = nns - combined[:, :, None, :]

        return _apply_fusion_tail(
            self, self.mlp, combined, resi, nfs, train, momentum
        )


class PointsFusionMulti(nn.Module):
    """Fusion across field+1 candidate clouds with per-cloud budgets
    (PointsFusion2, Utils/Layers.py:286-381).

    Budgets: cloud j < last gets ``N_j = floor(N * w_j)`` sampled points and
    ``k_j = floor(k * w_j)`` neighbors; the last cloud takes the remainder.
    GroupNorm(C/8) MLP per the reference.
    """

    mlp: Sequence[int] = (64, 64, 128)

    @nn.compact
    def __call__(self, points_list, k: int, weights, *, train=False, momentum=0.1):
        """points_list: list of ``[B,N,3]``; weights ``[B, len(points_list)]``
        (rows need not sum to 1 — remainders absorb the slack)."""
        F = len(points_list)
        B, N, _ = points_list[0].shape
        w = weights.astype(jnp.float32)
        n_all, k_all = _multi_budgets(N, k, w[:, : F - 1])  # [B,F] each

        key = self.make_rng("sample")
        keys = jax.random.split(key, F)
        perms = [_random_perms(keys[j], B, N) for j in range(F)]
        combined, _ = _composed_shuffle_merge(points_list, perms, n_all)

        if _cells_route_ok(points_list[0], k, train, n_seg=len(points_list)):
            resi = _cells_fusion_knn(
                combined, jnp.cumsum(n_all, axis=1), k_all, k
            )
        elif _fused_kernel_ok(points_list[0], k):
            # one fused kernel: shared distance tiles, F budgeted
            # extraction phases, pre-compacted residual block
            from ..ops.pallas_kernels import knn_fusion_multi

            resi = knn_fusion_multi(
                combined, jnp.cumsum(n_all, axis=1), k_all, k, _ALIGN,
                winners=_FUSION_WINNERS,
            )
        else:
            shuffled = [
                jnp.take_along_axis(pts, perm[..., None], axis=1)
                for pts, perm in zip(points_list, perms)
            ]
            # per-cloud kNN into valid prefixes, then compact along slots
            nn_parts = []
            for j in range(F):
                _, idx = ops.knn_prefix(
                    combined, shuffled[j], k, jnp.maximum(n_all[:, j], 1)
                )
                nn_parts.append(ops.index_points(shuffled[j], idx))
            nns = _budget_compact(nn_parts, k_all, k)
            resi = nns - combined[:, :, None, :]

        feats = jnp.concatenate([resi, _safe_norm(resi)], axis=-1)
        h = PointMLP(self.mlp, norm="group_div")(feats, train=train, momentum=momentum)
        scores = jnp.max(h, axis=-1)
        weights_attn = jax.nn.softmax(policy.f32(scores), axis=-1)
        # sum(w * nn) = combined + sum(w * resi): softmax rows sum to 1
        return combined + jnp.sum(weights_attn[..., None] * resi, axis=2)


def _budget_compact(parts, budgets, k):
    """Compact per-cloud kNN blocks into k slots: slot s takes part j's
    entry ``s - cum_j`` where ``cum_j <= s < cum_{j+1}`` (per batch).

    parts: list of ``[B,N,k,C]``; budgets ``[B,F]`` summing to k.
    """
    F = len(parts)
    B, N, _, C = parts[0].shape
    cat = jnp.concatenate(parts, axis=2)  # [B,N,F*k,C]
    cum = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), jnp.cumsum(budgets, axis=1)], axis=1
    )  # [B,F+1]
    s = jnp.arange(k, dtype=jnp.int32)[None, :]  # [1,k]
    # which part owns slot s: count how many cumulative boundaries s passed
    owner = jnp.sum(
        (s[..., None] >= cum[:, None, 1:]).astype(jnp.int32), axis=-1
    )  # [B,k] in [0, F-1]
    local = s - jnp.take_along_axis(cum, owner, axis=1)  # [B,k]
    flat_idx = owner * k + local  # index into the F*k concat axis
    flat_idx = jnp.clip(flat_idx, 0, F * k - 1)
    # one-hot matmul instead of a small-axis gather (TPU gather pathology)
    onehot = (
        flat_idx[:, :, None] == jnp.arange(F * k, dtype=jnp.int32)[None, None, :]
    ).astype(cat.dtype)  # [B, k, F*k]
    return jnp.einsum(
        "bnjc,bsj->bnsc", cat, onehot, preferred_element_type=cat.dtype
    )
