"""Headline benchmark: interpolated frames/s at 16k-pt scan pairs.

Runs PointINet (the reference's headline model, paper Table 6) on the real
nuScenes scan pair shipped with the reference, on whatever accelerator JAX
provides (the driver runs this on one real TPU chip).

Prints ONE JSON line:
  {"metric": "frames_per_sec_16k", "value": N, "unit": "frames/s",
   "vs_baseline": N / 4.909}
Baseline: the PointINet paper's RTX 2060 single-frame rate at 16,384 pts
(203.7 ms/frame = 4.909 fps, BASELINE.md).
"""

import json
import os
import sys
import time

import numpy as np


def _load_cloud(path, npoints, width, seed):
    pts = np.fromfile(path, np.float32).reshape(-1, width)[:, :3]
    idx = np.random.default_rng(seed).choice(len(pts), npoints, replace=len(pts) < npoints)
    return pts[idx]


def main():
    import jax
    import jax.numpy as jnp

    from pci_tpu.models import PointINet

    npoints = 16384
    base = "/root/reference/Demos/20230508test/demo_data/Inputs/"
    if os.path.isdir(base):
        a = _load_cloud(base + "key_1.bin", npoints, 5, 0)
        b = _load_cloud(base + "key_2.bin", npoints, 5, 1)
    else:  # fall back to synthetic clouds
        rng = np.random.default_rng(0)
        a = (rng.standard_normal((npoints, 3)) * 10).astype(np.float32)
        b = a + 0.5 * rng.standard_normal((npoints, 3)).astype(np.float32)

    p1 = jnp.asarray(a)[None]
    p2 = jnp.asarray(b)[None]
    zeros = jnp.zeros_like(p1)
    t = jnp.asarray([0.5], jnp.float32)

    model = PointINet(freeze_flow=True)
    rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}
    variables = model.init(rngs, p1, p2, zeros, zeros, t, train=False)

    def fwd(variables, p1, p2, t, key):
        return model.apply(
            variables, p1, p2, zeros, zeros, t,
            train=False, rngs={"sample": key},
        )

    # Timing recipe: chained forwards inside ONE jitted lax.scan,
    # synchronized by a VALUE FETCH (through the axon TPU tunnel
    # block_until_ready() returns before the computation finishes).  The
    # fetch costs a FIXED ~36-42 ms round trip independent of scan length,
    # so a single scan overstates per-frame time by ~40/iters ms; timing
    # two scan lengths and dividing the difference cancels it (CLAUDE.md).
    def make(iters):
        @jax.jit
        def run(variables, p1, p2, t, key):
            def body(carry, i):
                out = fwd(variables, p1 + carry, p2, t, jax.random.fold_in(key, i))
                return 1e-9 * jnp.sum(out[..., 0]), None

            carry, _ = jax.lax.scan(
                body, jnp.float32(0.0), jnp.arange(iters), length=iters
            )
            return carry

        return run

    lo, hi = make(10), make(50)
    float(lo(variables, p1, p2, t, jax.random.key(2)))  # compile + warm
    float(hi(variables, p1, p2, t, jax.random.key(2)))
    t0 = time.perf_counter()
    float(lo(variables, p1, p2, t, jax.random.key(3)))
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(hi(variables, p1, p2, t, jax.random.key(3)))
    dt = (time.perf_counter() - t0 - t_lo) / 40

    fps = 1.0 / dt
    baseline_fps = 1.0 / 0.2037  # paper Table 6, RTX 2060 @ 16,384 pts
    print(
        json.dumps(
            {
                "metric": "frames_per_sec_16k",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / baseline_fps, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
