"""Brute-force numpy reference implementations used only by tests.

These re-derive the op semantics from first principles (O(N^2) loops /
argsort) so the TPU kernels are checked against an independent oracle,
not against themselves.
"""

import numpy as np


def square_distance_np(src, dst):
    # [B,N,C] x [B,M,C] -> [B,N,M]
    diff = src[:, :, None, :] - dst[:, None, :, :]
    return np.sum(diff**2, axis=-1)


def knn_np(query, points, k):
    d = square_distance_np(query, points)
    idx = np.argsort(d, axis=-1, kind="stable")[..., :k]
    dist = np.take_along_axis(d, idx, axis=-1)
    return dist, idx


def fps_np(xyz, npoint, start=0):
    B, N, _ = xyz.shape
    idxs = np.zeros((B, npoint), dtype=np.int64)
    for b in range(B):
        dist = np.full(N, np.inf)
        farthest = start
        for i in range(npoint):
            idxs[b, i] = farthest
            d = np.sum((xyz[b] - xyz[b, farthest]) ** 2, axis=-1)
            dist = np.minimum(dist, d)
            farthest = int(np.argmax(dist))
    return idxs


def ball_query_np(radius, nsample, xyz, new_xyz):
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    out = np.zeros((B, S, nsample), dtype=np.int64)
    d = square_distance_np(new_xyz, xyz)
    for b in range(B):
        for s in range(S):
            hits = np.where(d[b, s] <= radius**2)[0]
            if len(hits) == 0:
                out[b, s] = 0
                continue
            sel = hits[:nsample]
            if len(sel) < nsample:
                sel = np.concatenate(
                    [sel, np.full(nsample - len(sel), sel[0])]
                )
            out[b, s] = sel
    return out


def chamfer_np(pc1, pc2):
    d12 = square_distance_np(pc1, pc2)  # [B,N,M]
    d21 = np.swapaxes(d12, 1, 2)
    c1 = d12.min(axis=-1).mean(axis=-1)
    c2 = d21.min(axis=-1).mean(axis=-1)
    return float((c1 + c2).mean())


def three_nn_interp_np(query, ref, feats, mode="clamp"):
    d, idx = knn_np(query, ref, 3)
    if mode == "clamp":
        d = np.maximum(d, 1e-10)
        recip = 1.0 / d
    else:
        recip = 1.0 / (d + 1e-8)
    w = recip / recip.sum(axis=-1, keepdims=True)
    B, N, _ = idx.shape
    g = np.stack(
        [feats[b][idx[b]] for b in range(B)], axis=0
    )  # [B,N,3,C]
    return (g * w[..., None]).sum(axis=2)
