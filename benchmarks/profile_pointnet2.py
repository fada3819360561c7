"""Pointnet2FeatureAbstract stage breakdown + mid-megakernel A/B.

The ISAPCInet f2 protocol runs this block twice per frame at
M = 2*field*N = 65,536 points (r3: 6.0 ms each).  Decomposition:

  sa1    — the 65,536-key MSG level (streamed ball + gathers + MLPs)
  mid    — sa2..sa4 + fp4..fp2, everything on <=1024 points
           (XLA: ~30 launches; kernel: ONE, pn2mid_tpu.py)
  fp1+hd — dense 3-NN interp onto 65,536 points + [128,128,128] GN MLP
           + Dense/GN(8) head (the big HBM-traffic block)

  python -m benchmarks.profile_pointnet2 [--npoints 65536] [--reps 8]
      [--policy float32]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from benchmarks.timing import slope as _shared_slope


def _slope(fn, args, reps, label):
    return _shared_slope(fn, args, reps, label, width=46, digits=2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npoints", type=int, default=65536)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--policy", default="float32")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pci_tpu.nn import Pointnet2FeatureAbstract, policy
    from pci_tpu.nn import pointnet2 as p2

    policy.set_compute_dtype(args.policy)
    M, reps = args.npoints, args.reps
    rng = np.random.default_rng(0)
    xM = jnp.asarray(rng.standard_normal((1, M, 3)).astype(np.float32))
    rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}

    ffab = Pointnet2FeatureAbstract(64)
    av = jax.jit(lambda: ffab.init(rngs, xM, train=False))()

    # A/B the mid megakernel: the route is decided at TRACE time, so two
    # separately-jitted wrappers traced under different env settings give
    # both configurations in one process (comparable timings, CLAUDE.md)
    os.environ["PCI_TPU_PN2_KERNEL"] = "0"
    f_off = jax.jit(lambda v, x, c: ffab.apply(
        v, x + c, train=False, rngs={"sample": jax.random.key(2)}))
    _slope(f_off, (av, xM), reps, f"ffab @{M} XLA mid (x2 in f2)")

    os.environ["PCI_TPU_PN2_KERNEL"] = "1"
    f_on = jax.jit(lambda v, x, c: ffab.apply(
        v, x + c, train=False, rngs={"sample": jax.random.key(2)}))
    _slope(f_on, (av, xM), reps, f"ffab @{M} pn2mid kernel")

    # stage: sa1 alone (the 65,536-key level)
    sa1 = p2.SetAbstractionMsg(
        1024, [0.1, 0.2], [16, 32], [[16, 16, 32], [32, 32, 64]])
    sv = jax.jit(lambda: sa1.init(rngs, xM, None, train=False))()
    _slope(
        lambda v, x, c: sa1.apply(
            v, x + c, None, train=False,
            rngs={"sample": jax.random.key(2)})[1],
        (sv, xM), reps, f"sa1 @{M}",
    )

    # stage: fp1 + head at the dense size
    l1x = jnp.asarray(rng.standard_normal((1, 1024, 3)).astype(np.float32))
    l1f = jnp.asarray(
        rng.standard_normal((1, 1024, 128)).astype(np.float32))
    fp1 = p2.FeaturePropagationP2([128, 128, 128])
    fv = jax.jit(lambda: fp1.init(
        jax.random.key(0), xM, l1x, None, l1f, train=False))()
    _slope(
        lambda v, x, c: fp1.apply(v, x + c, l1x, None, l1f, train=False),
        (fv, xM), reps, f"fp1 @{M} (interp + 3xGN MLP)",
    )

    # stage: the mid megakernel alone (production config, real params)
    from pci_tpu.ops.pallas_kernels.pn2mid_tpu import (
        gn_pointmlp_vars,
        pn2mid_fused,
    )

    p = av["params"]
    flat = (
        gn_pointmlp_vars(p["sa2"]["scale0"], 3)
        + gn_pointmlp_vars(p["sa2"]["scale1"], 3)
        + gn_pointmlp_vars(p["sa3"]["scale0"], 3)
        + gn_pointmlp_vars(p["sa3"]["scale1"], 3)
        + gn_pointmlp_vars(p["sa4"]["scale0"], 3)
        + gn_pointmlp_vars(p["sa4"]["scale1"], 3)
        + gn_pointmlp_vars(p["fp4"]["PointMLP_0"], 2)
        + gn_pointmlp_vars(p["fp3"]["PointMLP_0"], 2)
        + gn_pointmlp_vars(p["fp2"]["PointMLP_0"], 2)
    )
    l1f96 = jnp.asarray(
        rng.standard_normal((1, 1024, 96)).astype(np.float32))
    _slope(
        lambda lx, lf, c: pn2mid_fused(lx + c, lf, flat),
        (l1x, l1f96), reps, "pn2mid kernel alone @1024",
    )


if __name__ == "__main__":
    main()
