"""ISAPCInet field=2 stage breakdown at TRUE stage shapes.

At field=f the flow fan-out produces 2f flow clouds per direction that are
chunk-concatenated into ONE 2f*N-point cloud (models/isapci.py:147-150),
so the transformer / PointNet++ stages run at 2f*N = 65,536 points when
N=16,384 — the 64k-key kNN is the dominant block, not the 16k one.

  python -m benchmarks.profile_isapci [--npoints 16384] [--field 2]
      [--policy bfloat16]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


from benchmarks.timing import slope as _shared_slope


def _slope(fn, args, reps, label):
    return _shared_slope(fn, args, reps, label, width=46, digits=2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npoints", type=int, default=16384)
    ap.add_argument("--field", type=int, default=2)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--policy", default="float32")
    ap.add_argument("--skip64k", action="store_true",
                    help="skip the slow-compiling 2f*N-point stages")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pci_tpu import ops
    from pci_tpu.models import FlowNet3D
    from pci_tpu.nn import (
        PointsFusion,
        Pointnet2FeatureAbstract,
        TransformerLayer,
        policy,
    )

    policy.set_compute_dtype(args.policy)
    N, f, reps = args.npoints, args.field, args.reps
    M = 2 * f * N  # the concatenated flow-cloud size
    rng = np.random.default_rng(0)

    def cl(n, b=1):
        return jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))

    kw = dict(train=False)
    rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}

    # FlowNet3D single pass @N (x 4f in the model)
    flow = FlowNet3D()
    zN = jnp.zeros((1, N, 3), jnp.float32)
    fv = jax.jit(lambda: flow.init(rngs, zN, zN, zN, zN, train=False))()
    _slope(
        lambda v, a, b, c: flow.apply(v, a + c, b, zN, zN, train=False),
        (fv, cl(N), cl(N)), reps, f"flownet3d pass @{N} (x{4 * f})",
    )

    # fusion head @N
    fus = PointsFusion((64, 64, 128))
    t = jnp.asarray([0.5], jnp.float32)
    fvv = jax.jit(
        lambda: fus.init(rngs, zN, zN, 32, t, train=False)
    )()
    _slope(
        lambda v, a, b, c: fus.apply(
            v, a + c, b, 32, t, train=False,
            rngs={"sample": jax.random.key(2)},
        ),
        (fvv, cl(N), cl(N)), reps, f"fusion head @{N}",
    )

    if args.skip64k:
        return

    # kNN @M self (the transformer's neighborhood search)
    _slope(
        lambda q, c: ops.knn(q + c, q, 16)[1].astype(jnp.float32),
        (cl(M),), max(2, reps // 2), f"knn self @{M} k=16",
    )

    # full transformer layer @M
    tr = TransformerLayer(64, 16)
    xM = cl(M)
    featsM = jnp.tile(xM, (1, 1, 22))[..., :64]
    tv = jax.jit(lambda: tr.init(jax.random.key(0), xM, featsM))()
    _slope(
        lambda v, x, ft, c: tr.apply(v, x + c, ft)[0],
        (tv, xM, featsM), max(2, reps // 2), f"transformer d64 k16 @{M} (x2)",
    )

    # PointNet++ MSG encoder-decoder @M
    ffab = Pointnet2FeatureAbstract(64)
    av = jax.jit(lambda: ffab.init(rngs, xM, train=False))()
    _slope(
        lambda v, x, c: ffab.apply(
            v, x + c, train=False, rngs={"sample": jax.random.key(2)}
        ),
        (av, xM), max(2, reps // 2), f"pointnet2 ffab @{M} (x2)",
    )


if __name__ == "__main__":
    main()
