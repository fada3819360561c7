"""FlowNet3D internal-stage timings at true stage shapes.

The pass is a long chain of sub-ms HBM-bound stages (CLAUDE.md r2); this
isolates each block AND the small-key kNN/3nn primitives that the up-conv
/ propagation stages are built on, so the next kernel target is picked
from measurement, not guesswork.

  python -m benchmarks.profile_flownet [--npoints 16384]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


from benchmarks.timing import slope as _shared_slope


def _slope(fn, args, reps, label):
    return _shared_slope(fn, args, reps, label, width=46, digits=3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npoints", type=int, default=16384)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--policy", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pci_tpu import ops
    from pci_tpu.nn import policy
    from pci_tpu.nn.layers import (
        Classifier,
        FeaturePropagation,
        FlowEmbedding,
        SetConv,
        SetUpConv,
    )

    policy.set_compute_dtype(args.policy)
    N = args.npoints
    reps = args.reps
    rng = np.random.default_rng(0)

    def cl(n, c=3, scale=10.0):
        return jnp.asarray(rng.standard_normal((1, n, c)).astype(np.float32) * scale)

    print(f"N={N} policy={args.policy} device={jax.devices()[0].platform}")

    # true stage shapes of the FlowNet3D pass (models/flownet3d.py)
    stages = [
        ("sc1 16k->1024 r.5 ns16", SetConv(1024, 0.5, 16, (32, 32, 64)),
         (cl(N), cl(N, 3, 1.0))),
        ("sc2 1024->256 r1 ns16", SetConv(256, 1.0, 16, (64, 64, 128)),
         (cl(1024), cl(1024, 64, 1.0))),
        ("sc3 256->64 r2 ns8", SetConv(64, 2.0, 8, (128, 128, 256)),
         (cl(256), cl(256, 128, 1.0))),
        ("sc4 64->16 r4 ns8", SetConv(16, 4.0, 8, (256, 256, 512)),
         (cl(64), cl(64, 256, 1.0))),
    ]
    for label, mod, xs in stages:
        v = jax.jit(lambda mod=mod, xs=xs: mod.init(
            {"params": jax.random.key(0)}, *xs, train=False))()
        _slope(
            lambda vv, a, f, c, mod=mod: mod.apply(vv, a + c, f, train=False),
            (v, *xs), reps, label,
        )

    fe = FlowEmbedding(64, (128, 128, 128))
    a, b = cl(256), cl(256)
    f1, f2 = cl(256, 128, 1.0), cl(256, 128, 1.0)
    v = jax.jit(lambda: fe.init({"params": jax.random.key(0)}, a, b, f1, f2, train=False))()
    _slope(lambda vv, x, c: fe.apply(vv, x + c, b, f1, f2, train=False),
           (v, a), reps, "flow_embedding 256x256 k64")

    ups = [
        ("up1 64->256 k8 (mlp1 empty)", SetUpConv(8, (), (256, 256)),
         (cl(16), cl(64), cl(16, 512, 1.0), cl(64, 256, 1.0))),
        ("up2 256->1024 k8", SetUpConv(8, (128, 128, 256), (256,)),
         (cl(64), cl(256), cl(64, 256, 1.0), cl(256, 256, 1.0))),
        ("up3 256->1024 k8", SetUpConv(8, (128, 128, 256), (256,)),
         (cl(256), cl(1024), cl(256, 256, 1.0), cl(1024, 64, 1.0))),
    ]
    for label, mod, xs in ups:
        v = jax.jit(lambda mod=mod, xs=xs: mod.init(
            {"params": jax.random.key(0)}, *xs, train=False))()
        _slope(
            lambda vv, cx, dx, cf, df, c, mod=mod: mod.apply(
                vv, cx + c, dx, cf, df, train=False),
            (v, *xs), reps, label,
        )

    fp = FeaturePropagation((256, 256))
    sub, dense_ = cl(1024), cl(N)
    sf, df = cl(1024, 256, 1.0), cl(N, 3, 1.0)
    v = jax.jit(lambda: fp.init({"params": jax.random.key(0)}, sub, dense_, sf, df, train=False))()
    _slope(lambda vv, s, c: fp.apply(vv, s + c, dense_, sf, df, train=False),
           (v, sub), reps, "fp 1024->16k (3nn+mlp)")

    clf = Classifier()
    feats = cl(N, 256, 1.0)
    v = jax.jit(lambda: clf.init({"params": jax.random.key(0)}, feats, train=False))()
    _slope(lambda vv, f, c: clf.apply(vv, f + c, train=False),
           (v, feats), reps, "classifier 16k 256->3")

    # primitives under the up/fp stages
    _slope(lambda q, c: ops.knn(q + c, cl(1024), 3)[1].astype(jnp.float32),
           (cl(N),), reps, "knn 16k->1024 k=3 (fp's 3nn)")
    _slope(lambda q, c: ops.knn(q + c, cl(256), 8)[1].astype(jnp.float32),
           (cl(1024),), reps, "knn 1024->256 k=8 (up3)")
    _slope(
        lambda q, c: ops.three_nn_interpolate(q + c, cl(1024), cl(1024, 256, 1.0), "clamp"),
        (cl(N),), reps, "three_nn_interpolate 16k<-1024 c256",
    )
    _slope(lambda q, c: ops.ball_query(0.5, 16, q + c, cl(1024)).astype(jnp.float32),
           (cl(N),), reps, "ball 16k q1024 r.5 ns16 (kernel)")


if __name__ == "__main__":
    main()
