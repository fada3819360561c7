"""Per-stage timing breakdown for the headline PointINet @16k path.

Each stage runs inside a ``lax.scan`` of ``REPS`` iterations in ONE jit
(the TPU tunnel adds ~28 ms per blocking fetch, so single-call timing is
meaningless — see CLAUDE.md).  Carry chains a data dependency through the
scan so XLA can't elide iterations.

Usage:  python benchmarks/profile_stages.py [--npoints 16384] [--reps 20]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def _scan_time(fn, args, reps, label):
    """Time chained applications of fn inside one jit — two-point slope.

    Synchronization is a VALUE FETCH (float()), not block_until_ready():
    through the axon TPU tunnel block_until_ready returns before the
    computation finishes.  The fetch itself costs a FIXED ~36-42 ms
    round-trip independent of scan length (measured: a trivial
    elementwise scan takes 42 ms at reps=1 and 36 ms at reps=400), so a
    single timing at reps=R overstates per-iteration time by ~40/R ms.
    Timing at two rep counts and dividing the difference cancels the
    fixed cost exactly.
    """
    import jax
    import jax.numpy as jnp

    def make(length):
        @jax.jit
        def run(seed, args):
            def body(carry, _):
                out = fn(*args, carry)
                # fold output into a scalar carry so iterations chain
                leaf = jax.tree_util.tree_leaves(out)[0]
                red = jnp.sum(leaf.astype(jnp.float32) ** 2) ** 0.5
                return carry * 1e-6 + 1e-6 * red, None

            carry, _ = jax.lax.scan(body, seed, None, length=length)
            return carry

        return run

    lo, hi = make(reps), make(5 * reps)
    float(lo(jnp.float32(0.0), args))  # compile + warm
    float(hi(jnp.float32(0.0), args))
    t0 = time.perf_counter()
    float(lo(jnp.float32(1.0), args))
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(hi(jnp.float32(1.0), args))
    t_hi = time.perf_counter() - t0
    dt = (t_hi - t_lo) / (4 * reps) * 1e3
    print(f"{label:40s} {dt:8.3f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npoints", type=int, default=16384)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pci_tpu import ops
    from pci_tpu.models import FlowNet3D, PointINet
    from pci_tpu.nn.fusion import PointsFusion

    N = args.npoints
    reps = args.reps
    rng = np.random.default_rng(0)
    p1 = jnp.asarray(rng.standard_normal((1, N, 3)).astype(np.float32) * 10)
    p2 = p1 + jnp.asarray(rng.standard_normal((1, N, 3)).astype(np.float32) * 0.5)
    zeros = jnp.zeros_like(p1)
    t = jnp.asarray([0.5], jnp.float32)
    print(f"N={N} reps={reps} device={jax.devices()[0].platform}")

    # --- ops ---
    _scan_time(lambda a, b, c: ops.knn(a + c, b, 32)[0], (p1, p2), reps, "knn 16k->16k k=32")
    _scan_time(lambda a, c: ops.fps_points(a + c, 1024), (p1,), reps, "fps N->1024")
    _scan_time(
        lambda a, b, c: ops.chamfer_distance(a + c, b), (p1, p2), reps, "chamfer"
    )

    # --- FlowNet3D single pass ---
    flow = FlowNet3D()
    fv = flow.init(
        {"params": jax.random.key(0)}, p1, p2, zeros, zeros, train=False
    )
    _scan_time(
        lambda v, a, b, c: flow.apply(v, a + c, b, zeros, zeros, train=False),
        (fv, p1, p2),
        reps,
        "FlowNet3D one pass",
    )

    # --- fusion ---
    fus = PointsFusion((64, 64, 128), sampling="random")
    fusv = fus.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        p1, p2, 32, t, train=False,
    )
    _scan_time(
        lambda v, a, b, tt, c: fus.apply(
            v, a + c, b, 32, tt, train=False, rngs={"sample": jax.random.key(2)}
        ),
        (fusv, p1, p2, t),
        reps,
        "PointsFusion k=32",
    )

    # --- full model ---
    model = PointINet(freeze_flow=True)
    mv = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        p1, p2, zeros, zeros, t, train=False,
    )
    _scan_time(
        lambda v, a, b, tt, c: model.apply(
            v, a + c, b, zeros, zeros, tt, train=False,
            rngs={"sample": jax.random.key(2)},
        ),
        (mv, p1, p2, t),
        reps,
        "PointINet full forward",
    )


if __name__ == "__main__":
    main()
