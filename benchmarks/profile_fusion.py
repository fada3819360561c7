"""Stage-by-stage timing of PointsFusion internals @16k (TPU).

Finds where the fusion head's milliseconds go (the headline-path hot block):
shuffle, prefix merge, prefix-kNN, neighbor gather, k-axis compaction, MLP.

Usage: python -m benchmarks.profile_fusion [--npoints 16384]
"""

from __future__ import annotations

import argparse

import numpy as np

from benchmarks.profile_stages import _scan_time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npoints", type=int, default=16384)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pci_tpu import ops
    from pci_tpu.nn.fusion import _neighbor_features, _prefix_merge
    from pci_tpu.nn.mlp import PointMLP

    N = args.npoints
    reps = args.reps
    B = 1
    k = 32
    rng = np.random.default_rng(0)
    p1 = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32) * 10)
    p2 = p1 + jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32) * 0.5)
    t = jnp.asarray([0.5], jnp.float32)
    N2 = jnp.floor(N * t).astype(jnp.int32)
    N1 = N - N2
    k2v = jnp.floor(k * t).astype(jnp.int32)
    k1 = k - k2v
    print(f"N={N} reps={reps} device={jax.devices()[0].platform}")

    def shuffle(pts, c):
        key = jax.random.key(0)
        perm = jax.vmap(lambda kk: jax.random.permutation(kk, N))(
            jax.random.split(key, B)
        )
        return jnp.take_along_axis(pts + c, perm[..., None], axis=1)

    _scan_time(lambda a, c: shuffle(a, c), (p1,), reps, "shuffle (perm+gather) x1")

    def perm_only(pts, c):
        key = jax.random.key(0)
        perm = jax.vmap(lambda kk: jax.random.permutation(kk, N))(
            jax.random.split(key, B)
        )
        return perm + (c > 1e30).astype(jnp.int32) * 0 + pts[:, :1, 0].astype(jnp.int32) * 0 + perm

    _scan_time(lambda a, c: perm_only(a, c), (p1,), reps, "permutation only x1")

    _scan_time(
        lambda a, b, c: _prefix_merge(a + c, b, N1, axis=1),
        (p1, p2), reps, "prefix_merge big axis x1",
    )

    _scan_time(
        lambda a, b, c: ops.knn_prefix(a + c, b, k, N1)[0],
        (p1, p2), reps, "knn_prefix 16k k=32 x1",
    )

    _, idx = ops.knn_prefix(p1, p2, k, N1)
    _scan_time(
        lambda a, i, c: ops.index_points(a + c, i),
        (p2, idx), reps, "index_points [B,N,32]<-[B,N,3] x1",
    )

    _scan_time(
        lambda a, b, c: _neighbor_features(a + c, b, k, N1)[0],
        (p1, p2), reps, "neighbor_features (knn+gather+resi) x1",
    )

    f1 = jnp.asarray(rng.standard_normal((B, N, k, 4)).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal((B, N, k, 4)).astype(np.float32))
    _scan_time(
        lambda a, b, c: _prefix_merge(a + c, b, k1, axis=2),
        (f1, f2), reps, "prefix_merge k axis (one-hot) x1",
    )

    mlp = PointMLP((64, 64, 128), norm="batch")
    mv = mlp.init({"params": jax.random.key(0)}, f1, train=False)

    def mlp_head(v, f, nns, c):
        h = mlp.apply(v, f + c, train=False)
        scores = jnp.max(h, axis=-1)
        w = jax.nn.softmax(scores, axis=-1)
        return jnp.sum(w[..., None] * nns[..., :3], axis=2)

    _scan_time(lambda v, f, g, c: mlp_head(v, f, g, c), (mv, f1, f2), reps,
               "MLP+softmax+weighted-sum")


if __name__ == "__main__":
    main()
