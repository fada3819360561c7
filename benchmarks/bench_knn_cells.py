"""Measure the cell-pruned kNN kernel vs the flat kernel + overheads.

  python -m benchmarks.bench_knn_cells [--sizes 16384 65536] [--k 16]

Also times the XLA-side building blocks (argsort, row gathers) that the
sorted design pays for, so the net win is attributable.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


from benchmarks.timing import slope as _shared_slope


def _slope(fn, args, reps, label):
    return _shared_slope(fn, args, reps, label, width=46, digits=2)


def lidar_like(rng, n):
    """Clustered cloud approximating LiDAR density structure."""
    n_c = max(8, n // 512)
    centers = rng.uniform(-30, 30, (n_c, 3))
    per = n // n_c
    parts = [c + rng.standard_normal((per, 3)) for c in centers]
    out = np.concatenate(parts)[:n]
    if len(out) < n:
        out = np.concatenate([out, out[: n - len(out)]])
    return out.astype(np.float32)[None]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[16384, 65536])
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--m", type=int, nargs="+", default=[16, 24, 32])
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--bucket", type=int, default=16)
    ap.add_argument("--winners", type=int, default=2)
    ap.add_argument("--skip_flat64k", action="store_true")
    ap.add_argument("--recall_only", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pci_tpu import ops
    from pci_tpu.ops.pallas_kernels.knn_cells_tpu import knn_cells
    from pci_tpu.ops.pallas_kernels.knn_tpu import knn_pallas

    rng = np.random.default_rng(0)
    k = args.k

    for N in args.sizes:
        pts = lidar_like(rng, N)
        p = jnp.asarray(pts)
        print(f"== N = {N} chunk={args.chunk} bucket={args.bucket} ==",
              flush=True)

        if not args.recall_only:
            # XLA-side overhead pieces
            _slope(
                lambda x, c: jnp.argsort(x[:, :, 0] + c, axis=-1),
                (p,), args.reps, f"argsort [{N}]",
            )
            perm = jnp.argsort(p[:, :, 0], axis=-1).astype(jnp.int32)
            _slope(
                lambda x, pm, c: jnp.take_along_axis(x + c, pm[..., None], axis=1),
                (p, perm), args.reps, f"row gather [{N}, 3]",
            )
            idx16 = jnp.tile(perm[..., None], (1, 1, k))
            _slope(
                lambda x, i, c: jnp.take_along_axis(
                    jnp.tile(x[..., :1] + c, (1, 1, k)), i, axis=1
                ),
                (p, idx16), args.reps, f"row gather [{N}, {k}]",
            )

        # recall check (one shot, not timed)
        if N <= 20000:
            _, i_ref = ops.knn(p, p, k, True)
        else:
            # exact tiled reference: the flat Pallas kernel at 64k compiles
            # for >>10 min (CLAUDE.md kernel facts) — keep it out of here
            from pci_tpu.ops.knn import _knn_tiled

            _, i_ref = _knn_tiled(p, p, k, 8192, True)
        C, l, W = args.chunk, args.bucket, args.winners
        for M in args.m:
            d, idx = knn_cells(p, p, k, C, M, l, False, W)
            ir, ic = np.asarray(i_ref), np.asarray(idx)
            recall = np.mean([
                len(set(ic[0, i]) & set(ir[0, i])) / k
                for i in range(0, N, max(1, N // 4096))
            ])
            print(f"  recall C={C} l={l} W={W} M={M}: {recall:.4f}", flush=True)
            if args.recall_only:
                continue
            # bind x+c to one object so the shared-sort self path engages
            _slope(
                lambda x, c, M=M: (
                    lambda y: knn_cells(y, y, k, C, M, l, False, W)[0]
                )(x + c),
                (p,), args.reps, f"knn_cells self @{N} k={k} C={C} M={M}",
            )
            _slope(
                lambda x, c, M=M: (
                    lambda y: knn_cells(y, y, k, C, M, l, True, W)[2]
                )(x + c),
                (p,), args.reps, f"knn_cells+resi self @{N} k={k} C={C} M={M}",
            )

        if not args.recall_only and (N <= 20000 or not args.skip_flat64k):
            _slope(
                lambda x, c: knn_pallas(x + c, x + c, k)[0],
                (p,), args.reps, f"knn_pallas flat self @{N} k={k}",
            )


if __name__ == "__main__":
    main()
