"""Aggregate-throughput serving bench: B independent PointINet streams
in one jitted call (the serving.Interpolator.stream_batch shape).

PointINet is latency-bound per stream (r2: B=4 batching bought only
+3%), so the per-chip north star runs through MULTI-STREAM throughput —
this captures aggregate frames/s vs stream count on the current kernel
roster (the r4 megakernels changed the occupancy picture: fewer, larger
launches).

  python -m benchmarks.bench_serving [--streams 1 2 4 8] [--npoints N]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.timing import slope


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--npoints", type=int, default=16384)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pci_tpu.models import PointINet
    from pci_tpu.nn import policy

    policy.set_compute_dtype(
        os.environ.get("PCI_TPU_COMPUTE_DTYPE", "bfloat16"))
    print("device:", jax.devices()[0].platform, flush=True)

    base = "/root/reference/Demos/20230508test/demo_data/Inputs/"
    rng = np.random.default_rng(0)
    if os.path.isdir(base):
        def load(name, seed):
            pts = np.fromfile(base + name, np.float32).reshape(-1, 5)[:, :3]
            idx = np.random.default_rng(seed).choice(
                len(pts), args.npoints, replace=len(pts) < args.npoints)
            return pts[idx]

        a1 = load("key_1.bin", 0)
        b1 = load("key_2.bin", 1)
    else:
        a1 = (rng.standard_normal((args.npoints, 3)) * 10).astype(np.float32)
        b1 = a1 + 0.3

    model = PointINet(freeze_flow=True)
    rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}
    p1 = jnp.asarray(a1)[None]
    p2 = jnp.asarray(b1)[None]
    z1 = jnp.zeros_like(p1)
    mv = jax.jit(lambda: model.init(
        rngs, p1, p2, z1, z1, jnp.asarray([0.5], jnp.float32),
        train=False))()

    best = None
    for B in args.streams:
        # B independent streams: jittered copies of the real pair
        pa = jnp.concatenate(
            [p1 + 0.01 * i for i in range(B)], axis=0)
        pb = jnp.concatenate(
            [p2 + 0.01 * i for i in range(B)], axis=0)
        t = jnp.asarray([0.3 + 0.05 * i for i in range(B)], jnp.float32)

        ms = slope(
            lambda v, a, b, tt, c: model.apply(
                v, a + c, b, jnp.zeros_like(a), jnp.zeros_like(a), tt,
                train=False, rngs={"sample": jax.random.key(2)}),
            (mv, pa, pb, t), args.reps,
            f"PointINet {args.npoints // 1024}k x B={B}",
        )
        agg = B / ms * 1e3
        print(f"  -> B={B}: {ms:8.2f} ms/call = {agg:7.1f} frames/s "
              f"aggregate", flush=True)
        if best is None or agg > best[1]:
            best = (B, agg)
    print(f"best: B={best[0]} at {best[1]:.1f} frames/s/chip aggregate",
          flush=True)


if __name__ == "__main__":
    main()
