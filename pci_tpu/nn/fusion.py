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

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from .. import ops
from .mlp import PointMLP


def _safe_norm(x, axis=-1, keepdims=True, eps=1e-12):
    """Norm with a well-defined gradient at 0 (a combined point's nearest
    neighbor is itself, so zero offsets are the common case, and
    d|x|/dx at 0 would be NaN)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims) + eps)


def _neighbor_features(combined, cloud, k, valid_n):
    """kNN of `combined` into `cloud[:valid_n]`; returns ([B,N,k,4], [B,N,k,3])."""
    _, idx = ops.knn_prefix(combined, cloud, k, valid_n)
    nn_pts = ops.index_points(cloud, idx)  # [B,N,k,3]
    resi = nn_pts - combined[:, :, None, :]
    dist = _safe_norm(resi)
    return jnp.concatenate([resi, dist], axis=-1), nn_pts


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


class PointsFusion(nn.Module):
    """Fuse two warped clouds into one, weighting 2*k adaptive neighbors
    with learned attention (Utils/Layers.py:195-283)."""

    mlp: Sequence[int] = (64, 64, 128)
    sampling: str = "random"  # "random" | "fps"

    @nn.compact
    def __call__(self, points1, points2, k: int, t, *, train=False, momentum=0.1):
        """points1/points2 ``[B,N,3]`` warped clouds, t ``[B]`` in (0,1).

        Returns fused cloud ``[B,N,3]``.
        """
        B, N, _ = points1.shape
        t = t.astype(jnp.float32)
        N2 = jnp.floor(N * t).astype(jnp.int32)
        N1 = N - N2
        k2 = jnp.floor(k * t).astype(jnp.int32)
        k1 = k - k2

        if self.sampling == "random":
            key = self.make_rng("sample")
            k_1, k_2 = jax.random.split(key)
            perm1 = jax.vmap(lambda kk: jax.random.permutation(kk, N))(
                jax.random.split(k_1, B)
            )
            perm2 = jax.vmap(lambda kk: jax.random.permutation(kk, N))(
                jax.random.split(k_2, B)
            )
            c1 = jnp.take_along_axis(points1, perm1[..., None], axis=1)
            c2 = jnp.take_along_axis(points2, perm2[..., None], axis=1)
        elif self.sampling == "fps":
            c1 = ops.fps_points(points1, N)
            c2 = ops.fps_points(points2, N)
        else:
            raise ValueError(f"unknown sampling {self.sampling!r}")

        # combined cloud: N1 prefix points of c1, then N2 prefix points of c2
        combined = _prefix_merge(c1, c2, N1, axis=1)

        # adaptive kNN with prefix-valid pools; compact k1+k2 = k slots
        feats1, nn1 = _neighbor_features(combined, c1, k, jnp.maximum(N1, 1))
        feats2, nn2 = _neighbor_features(combined, c2, k, jnp.maximum(N2, 1))
        feats = _prefix_merge(feats1, feats2, k1, axis=2)  # [B,N,k,4]
        nns = _prefix_merge(nn1, nn2, k1, axis=2)  # [B,N,k,3]

        h = PointMLP(self.mlp, norm="batch")(feats, train=train, momentum=momentum)
        scores = jnp.max(h, axis=-1)  # channel max-pool -> [B,N,k]
        weights = jax.nn.softmax(scores, axis=-1)
        fused = jnp.sum(weights[..., None] * nns, axis=2)  # [B,N,3]
        return fused


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
        N2 = jnp.floor(N * t).astype(jnp.int32)
        N1 = N - N2
        k2 = jnp.floor(k * t).astype(jnp.int32)
        k1 = k - k2

        key = self.make_rng("sample")
        k_1, k_2 = jax.random.split(key)
        perm1 = jax.vmap(lambda kk: jax.random.permutation(kk, N))(
            jax.random.split(k_1, B)
        )
        perm2 = jax.vmap(lambda kk: jax.random.permutation(kk, N))(
            jax.random.split(k_2, B)
        )
        c1 = jnp.take_along_axis(points1, perm1[..., None], axis=1)
        c2 = jnp.take_along_axis(points2, perm2[..., None], axis=1)
        combined = _prefix_merge(c1, c2, N1, axis=1)

        def grouped(cloud, feat, valid):
            d, idx = ops.knn_prefix(combined, cloud, k, valid)
            nn_pts = ops.index_points(cloud, idx)
            nn_feat = ops.index_points(feat, idx)
            resi = nn_pts - combined[:, :, None, :]
            dist = _safe_norm(resi)
            return jnp.concatenate([resi, dist], -1), nn_pts, nn_feat

        g1, nn1, nf1 = grouped(c1, feats1, jnp.maximum(N1, 1))
        g2, nn2, nf2 = grouped(c2, feats2, jnp.maximum(N2, 1))
        g = _prefix_merge(g1, g2, k1, axis=2)
        nns = _prefix_merge(nn1, nn2, k1, axis=2)
        nfs = _prefix_merge(nf1, nf2, k1, axis=2)

        h = PointMLP(self.mlp, norm="batch")(g, train=train, momentum=momentum)
        scores = jnp.max(h, axis=-1)
        weights = jax.nn.softmax(scores, axis=-1)[..., None]
        fused_xyz = jnp.sum(weights * nns, axis=2)
        fused_feat = jnp.sum(weights * nfs, axis=2)
        return jnp.concatenate([fused_xyz, fused_feat], axis=-1)


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

        n_budget = jnp.floor(N * w[:, : F - 1]).astype(jnp.int32)  # [B,F-1]
        n_last = N - jnp.sum(n_budget, axis=1, keepdims=True)
        n_all = jnp.concatenate([n_budget, n_last], axis=1)  # [B,F]
        k_budget = jnp.floor(k * w[:, : F - 1]).astype(jnp.int32)
        k_last = k - jnp.sum(k_budget, axis=1, keepdims=True)
        k_all = jnp.concatenate([k_budget, k_last], axis=1)  # [B,F]

        key = self.make_rng("sample")
        keys = jax.random.split(key, F)
        shuffled = []
        for j, pts in enumerate(points_list):
            perm = jax.vmap(lambda kk: jax.random.permutation(kk, N))(
                jax.random.split(keys[j], B)
            )
            shuffled.append(jnp.take_along_axis(pts, perm[..., None], axis=1))

        # combined cloud: concat the per-cloud prefixes (cumulative merge)
        combined = shuffled[-1]
        taken = jnp.zeros((B,), jnp.int32)
        for j in range(F - 1):
            # place cloud j's n_all[:, j] prefix at offset `taken`
            combined = _offset_insert(combined, shuffled[j], taken, n_all[:, j])
            taken = taken + n_all[:, j]
        # remaining tail slots come from the last cloud's prefix
        combined = _offset_insert(
            combined, shuffled[-1], taken, jnp.full((B,), N, jnp.int32) - taken
        )

        # per-cloud kNN into valid prefixes, then compact along slot axis
        feats_parts, nn_parts = [], []
        for j in range(F):
            f, nn_pts = _neighbor_features(
                combined, shuffled[j], k, jnp.maximum(n_all[:, j], 1)
            )
            feats_parts.append(f)
            nn_parts.append(nn_pts)
        feats = _budget_compact(feats_parts, k_all, k)
        nns = _budget_compact(nn_parts, k_all, k)

        h = PointMLP(self.mlp, norm="group_div")(feats, train=train, momentum=momentum)
        scores = jnp.max(h, axis=-1)
        weights_attn = jax.nn.softmax(scores, axis=-1)
        return jnp.sum(weights_attn[..., None] * nns, axis=2)


def _offset_insert(base, src, offset, count):
    """Write ``src``'s per-batch prefix of length ``count`` into ``base``
    starting at per-batch ``offset`` along axis 1 (static shapes)."""
    B, N = base.shape[:2]
    pos = jnp.arange(N, dtype=jnp.int32)[None, :]  # [1,N]
    off = offset[:, None]
    cnt = count[:, None]
    in_range = (pos >= off) & (pos < off + cnt)
    src_idx = jnp.clip(pos - off, 0, N - 1)
    src_shifted = jnp.take_along_axis(src, src_idx[..., None], axis=1)
    return jnp.where(in_range[..., None], src_shifted, base)


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
