"""Shared TPU timing helper for every benchmark script.

Slope recipe (CLAUDE.md): chained reps inside ONE jitted ``lax.scan``
synchronized by a VALUE FETCH — through the axon tunnel
``block_until_ready()`` returns before the device finishes, and the
fetch's fixed ~40 ms round trip cancels between two scan lengths.  Any
fix to this contract belongs HERE (five scripts shipped private copies
until round 4).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def slope(fn, args, reps, label, width=46, digits=2):
    import jax
    import jax.numpy as jnp

    def make(length):
        @jax.jit
        def run(seed, args):
            def body(carry, _):
                out = fn(*args, carry)
                leaf = jax.tree_util.tree_leaves(out)[0]
                red = jnp.sum(leaf.astype(jnp.float32) ** 2) ** 0.5
                return carry * 1e-6 + 1e-6 * red, None

            carry, _ = jax.lax.scan(body, seed, None, length=length)
            return carry

        return run

    lo, hi = make(reps), make(5 * reps)
    float(lo(jnp.float32(0.0), args))
    float(hi(jnp.float32(0.0), args))
    t0 = time.perf_counter()
    float(lo(jnp.float32(1.0), args))
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(hi(jnp.float32(1.0), args))
    dt = (time.perf_counter() - t0 - t_lo) / (4 * reps) * 1e3
    print(f"{label:{width}s} {dt:8.{digits}f} ms", flush=True)
    return dt
