"""Model-level TPU timings: ISAPCInet @16k and batched PointINet
throughput (serving-relevant), honest slope clock.

  python -m benchmarks.profile_models [--npoints 16384]
  python -m benchmarks.profile_models --table6   # PointINet at the
      paper's 16384/32768/65536 protocol (Table 6: 203.7/372.4/725.9 ms
      on the RTX 2060).  64k Pallas compiles are slow (CLAUDE.md) —
      expect a long first iteration.
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
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--table6", action="store_true",
                    help="PointINet at 16384/32768/65536 (paper Table 6)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pci_tpu.models import ISAPCInet, PointINet

    N, reps = args.npoints, args.reps
    rng = np.random.default_rng(0)

    def cl(b=1, n=None):
        n = n or N
        return jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32) * 10)

    print(f"N={N} device={jax.devices()[0].platform}", flush=True)

    if args.table6:
        # paper Table 6 runtime protocol rows (RTX 2060
        # warp / fusion / total ms: 16384 -> 167.3/36.4/203.7,
        # 32768 -> 291.1/81.3/372.4, 65536 -> 529.3/196.6/725.9);
        # the warp column here = the bidirectional FlowNet3D pass
        # (shared Siamese encodings) + the linear warp arithmetic,
        # the fusion column = the PointsFusion head standalone.
        base = {16384: (167.3, 36.4, 203.7), 32768: (291.1, 81.3, 372.4),
                65536: (529.3, 196.6, 725.9)}
        from pci_tpu.nn.fusion import PointsFusion

        for n in (16384, 32768, 65536):
            p1, p2 = cl(n=n), cl(n=n)
            zeros = jnp.zeros_like(p1)
            t = jnp.asarray([0.5], jnp.float32)
            model = PointINet(freeze_flow=True)
            rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}
            mv = jax.jit(lambda p1=p1, p2=p2, t=t, zeros=zeros: model.init(
                rngs, p1, p2, zeros, zeros, t, train=False))()
            r = max(reps // max(n // 16384, 1), 3)

            from pci_tpu.models import FlowNet3D

            flow = FlowNet3D()
            fv = {"params": mv["params"]["flow"],
                  "batch_stats": mv["batch_stats"]["flow"]}
            warp_ms = _slope(
                lambda v, a, b, c: flow.apply(
                    v, a + c, b, jnp.zeros_like(a), jnp.zeros_like(a),
                    train=False, bidirectional=True),
                (fv, p1, p2), r, f"  warp (bidirectional flow) @{n}",
            )
            fusion = PointsFusion((64, 64, 128), sampling="random")
            fu_v = {"params": mv["params"]["fusion"],
                    "batch_stats": mv["batch_stats"]["fusion"]}
            fusion_ms = _slope(
                lambda v, a, b, tt, c: fusion.apply(
                    v, a + c, b, 32, tt, train=False,
                    rngs={"sample": jax.random.key(2)}),
                (fu_v, p1, p2, t), r, f"  fusion head @{n}",
            )
            ms = _slope(
                lambda v, a, b, tt, c: model.apply(
                    v, a + c, b, jnp.zeros_like(a), jnp.zeros_like(a), tt,
                    train=False, rngs={"sample": jax.random.key(2)},
                ),
                (mv, p1, p2, t), r, f"PointINet total @{n}",
            )
            bw, bf, bt = base[n]
            print(
                f"  Table6 @{n}: warp {warp_ms:.1f} vs {bw} | fusion "
                f"{fusion_ms:.1f} vs {bf} | total {ms:.1f} vs {bt} "
                f"({1e3 / ms:.1f} fps, {bt / ms:.1f}x RTX 2060)",
                flush=True,
            )
        return

    # --- batched PointINet throughput ---
    for B in (1, 4):
        p1, p2 = cl(B), cl(B)
        zeros = jnp.zeros_like(p1)
        t = jnp.full((B,), 0.5, jnp.float32)
        model = PointINet(freeze_flow=True)
        rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}
        mv = jax.jit(lambda p1=p1, p2=p2, t=t: model.init(
            rngs, p1, p2, zeros, zeros, t, train=False))()
        ms = _slope(
            lambda v, a, b, tt, c: model.apply(
                v, a + c, b, jnp.zeros_like(a), jnp.zeros_like(a), tt,
                train=False, rngs={"sample": jax.random.key(2)},
            ),
            (mv, p1, p2, t), reps, f"PointINet B={B} (per-call)",
        )
        print(f"  -> {B / ms * 1e3:.1f} frames/s throughput", flush=True)

    # --- ISAPCInet field=1 and 2 ---
    for field in (1, 2):
        fwd = [cl() for _ in range(field)]
        keys = [cl(), cl()]
        bwd = [cl() for _ in range(field)]
        t = jnp.asarray([0.5], jnp.float32)
        zeros = jnp.zeros((1, N, 3), jnp.float32)
        net = ISAPCInet(field=field, freeze_flow=True)
        rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}
        nv = jax.jit(lambda fwd=fwd, keys=keys, bwd=bwd, t=t: net.init(
            rngs, fwd, keys, bwd, t, zeros, train=False))()
        _slope(
            lambda v, tt, c: net.apply(
                v, [f + c for f in fwd], keys, bwd, tt, zeros,
                train=False, rngs={"sample": jax.random.key(2)},
            ),
            (nv, t), max(reps // 2, 4), f"ISAPCInet field={field}",
        )


if __name__ == "__main__":
    main()
