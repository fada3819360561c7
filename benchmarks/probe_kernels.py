"""Tiny bounded TPU probes for every round-3 Pallas kernel.

Run FIRST after a chip recovery (r3_tpu_sweep.sh step 0): each probe is
small (sub-second device execution, ~10 s compiles) and value-fetches
its result, so a hang localizes to one kernel instead of wedging the
worker mid-way through a full-model profile.

  python benchmarks/probe_kernels.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

# runnable both as `python benchmarks/probe_kernels.py` and `python -m`
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe(label, fn):
    t0 = time.perf_counter()
    out = fn()
    val = float(np.asarray(out).astype(np.float64).sum())
    dt = time.perf_counter() - t0
    assert np.isfinite(val), (label, val)
    print(f"probe {label:34s} OK  (compile+run {dt:6.1f} s)", flush=True)


def main(interpret=False):
    import jax
    import jax.numpy as jnp

    ip = False
    if interpret:  # TPU-faithful interpreter (CPU smoke of this script)
        # force CPU BEFORE touching devices: with a wedged axon worker the
        # PJRT client creation hangs forever (r3 failure mode)
        jax.config.update("jax_platforms", "cpu")
        from jax.experimental.pallas import tpu as pltpu

        ip = pltpu.InterpretParams()

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    f32 = np.float32

    xyz = jnp.asarray((rng.normal(size=(1, 1024, 3)) * 3).astype(f32))
    feats = jnp.asarray(rng.normal(size=(1, 1024, 4)).astype(f32))
    newx = jnp.asarray((rng.normal(size=(1, 256, 3)) * 3).astype(f32))
    W0 = jnp.asarray(rng.normal(size=(16, 7)).astype(f32))
    b0 = jnp.zeros((16,), f32)

    from pci_tpu.ops.pallas_kernels.setconv_tpu import setconv_fused

    probe("setconv_fused (early-exit)", lambda: setconv_fused(
        xyz, feats, newx, 1.0, 16, (W0, b0), 1, True, ip))
    probe("setconv_fused (tiny radius, full scan)", lambda: setconv_fused(
        xyz, feats, newx, 0.01, 16, (W0, b0), 1, True, ip))

    from pci_tpu.ops.pallas_kernels.ball_tpu import ball_query_pallas

    probe("ball_query_pallas", lambda: ball_query_pallas(
        xyz, newx, jnp.asarray([0.5, 1.0]), (8, 16), ip)[0])
    probe("ball_query_pallas (no early exit)", lambda: ball_query_pallas(
        xyz, newx, jnp.asarray([0.5, 1.0]), (8, 16), ip, False)[0])

    from pci_tpu.ops.pallas_kernels.knnconv_tpu import knnconv_fused

    kf = jnp.asarray(rng.normal(size=(1, 1024, 8)).astype(f32))
    qf = jnp.asarray(rng.normal(size=(1, 256, 6)).astype(f32))
    sk = jnp.asarray(rng.normal(size=(1, 256, 5)).astype(f32))
    Wf = jnp.asarray(rng.normal(size=(16, 17)).astype(f32))
    Wi = jnp.asarray(rng.normal(size=(12, 13)).astype(f32))
    bi = jnp.zeros((12,), f32)
    probe("knnconv_fused (max)", lambda: knnconv_fused(
        newx, xyz, kf, qf, None, 8, (Wf, jnp.zeros((16,), f32)), (),
        1, 0, ip))
    probe("knnconv_fused (interp)", lambda: knnconv_fused(
        newx, xyz, kf, None, sk, 3, (), (Wi, bi), 0, 1, ip, True))

    from pci_tpu.ops.pallas_kernels.fusion_tail_tpu import (
        fusion_attention_tail,
    )

    comb = jnp.asarray(rng.normal(size=(1, 512, 3)).astype(f32))
    resi = jnp.asarray(rng.normal(size=(1, 512, 32, 3)).astype(f32))
    Wa = jnp.asarray(rng.normal(size=(64, 4)).astype(f32))
    ba = jnp.zeros((64,), f32)
    Wb = jnp.asarray(rng.normal(size=(128, 64)).astype(f32))
    bb = jnp.zeros((128,), f32)
    probe("fusion_attention_tail", lambda: fusion_attention_tail(
        comb, resi, None, (Wa, ba, Wb, bb), 2, ip))

    comb2 = jnp.asarray((rng.normal(size=(1, 4096, 3)) * 3).astype(f32))
    if not interpret:  # these route/compile on-device only
        from pci_tpu.ops.pallas_kernels import knn_fusion_adaptive

        probe("knn_fusion_adaptive", lambda: knn_fusion_adaptive(
            comb2, jnp.asarray([2048], jnp.int32),
            jnp.asarray([16], jnp.int32), 32, 32))

        from pci_tpu import ops

        probe("knn (packed-key)", lambda: ops.knn(comb2, comb2, 16)[1])
        probe("fps_points", lambda: ops.fps_points(comb2, 512, 0))

    # r4: key_valid-masked cells kNN (the 64k fusion route's engine) and
    # the W-winners fusion bucket phase — tiny bounded shapes
    from pci_tpu.ops.pallas_kernels.knn_cells_tpu import knn_cells

    comb3 = jnp.asarray((rng.normal(size=(1, 2048, 3)) * 3).astype(f32))
    vmask = jnp.arange(2048, dtype=jnp.int32)[None, :] < 1024
    probe("knn_cells (key_valid mask)", lambda: knn_cells(
        comb3, comb3, 8, chunk=512, m_chunks=4, tile=128,
        key_valid=vmask, emit_resi=True, interpret=ip)[1])
    if not interpret:
        from pci_tpu.ops.pallas_kernels import knn_fusion_adaptive as kfa

        probe("knn_fusion_adaptive (winners=2)", lambda: kfa(
            comb3, jnp.asarray([1024], jnp.int32),
            jnp.asarray([8], jnp.int32), 16, 64, winners=2)[0])

        from pci_tpu.nn.fusion import _cells_fusion_knn

        # F=2 routes to the single-pass kernel; F=3 exercises the
        # 2-pass masked route
        probe("fusion cells single-pass (2 seg)", lambda: _cells_fusion_knn(
            comb3, jnp.asarray([[1024, 2048]], jnp.int32),
            jnp.asarray([[8, 8]], jnp.int32), 16,
            chunk=512, m_chunks=4, tile=128))
        probe("cells fusion 2-pass route (3 seg)", lambda: _cells_fusion_knn(
            comb3, jnp.asarray([[640, 1280, 2048]], jnp.int32),
            jnp.asarray([[5, 5, 6]], jnp.int32), 16,
            chunk=512, m_chunks=4, tile=128))

    # r4 megakernels — first Mosaic lowering happens HERE, bounded, so a
    # rejection/hang localizes before any full-model stage runs them
    from pci_tpu.ops.pallas_kernels.flowenc_tpu import flowenc_fused
    from pci_tpu.ops.pallas_kernels.flowmid_tpu import flowmid_fused
    from pci_tpu.ops.pallas_kernels import knn_fusion_attention

    c1 = jnp.asarray((rng.normal(size=(1, 512, 3)) * 3).astype(f32))
    c2s = jnp.asarray((rng.normal(size=(1, 128, 3)) * 3).astype(f32))
    fz = jnp.zeros((1, 2048, 3), f32)
    We1 = jnp.asarray(rng.normal(size=(8, 6)).astype(f32))
    We2 = jnp.asarray(rng.normal(size=(12, 11)).astype(f32))
    probe("flowenc_fused (enc megakernel)", lambda: flowenc_fused(
        comb3, fz, c1,
        (We1, jnp.zeros((8,), f32), We2, jnp.zeros((12,), f32)),
        128, 1.0, 16, 2.0, 16, 1, 1, ip)[1])

    def _mid():
        fa1 = jnp.asarray(rng.normal(size=(1, 512, 8)).astype(f32))
        fa2 = jnp.asarray(rng.normal(size=(1, 128, 12)).astype(f32))
        mk = lambda co, ci: (  # noqa: E731
            jnp.asarray(rng.normal(size=(co, ci)).astype(f32)),
            jnp.zeros((co,), f32))
        flat = sum([
            mk(12, 27), mk(12, 12), mk(12, 12),    # fe (3+12+12 -> 12)
            mk(16, 15), mk(16, 16), mk(16, 16),    # sc3 (3+12)
            mk(24, 19), mk(24, 24), mk(24, 24),    # sc4 (3+16)
            mk(16, 43), mk(16, 16),                # su1_2 ((3+24)+16)
            mk(16, 19), mk(16, 16), mk(16, 16),    # su2_1 (3+16)
            mk(16, 40),                            # su2_2 (16 + fa2 12 + emb 12)
            mk(16, 19), mk(16, 16), mk(16, 16),    # su3_1 (3+16)
            mk(16, 24),                            # su3_2 (16+8)
        ], ())
        return flowmid_fused(
            c1, fa1, c2s, fa2, c2s + 0.1, fa2 + 0.1, flat,
            32, 8, 8, 2.0, 8, 4.0, 8, 8, ip)
    probe("flowmid_fused (decode megakernel)", _mid)

    probe("knn_fusion_attention (one-shot)", lambda: knn_fusion_attention(
        comb3, jnp.asarray([[1024, 2048]], jnp.int32),
        jnp.asarray([[8, 8]], jnp.int32),
        (Wa, ba, Wb, bb), 16, 32, 1, ip))

    from pci_tpu.ops.pallas_kernels.attention_tpu import (
        fused_vector_attention,
    )

    d, k = 64, 16
    q = jnp.asarray(rng.normal(size=(1, 512, d)).astype(f32))
    g = jnp.asarray(rng.normal(size=(1, 512, k, 2 * d)).astype(f32))
    dl = jnp.asarray(rng.normal(size=(1, 512, k, 3)).astype(f32))
    wd0 = jnp.asarray(rng.normal(size=(3, d)).astype(f32))
    wdd = jnp.asarray(rng.normal(size=(d, d)).astype(f32))
    bd = jnp.zeros((d,), f32)
    probe("fused_vector_attention", lambda: fused_vector_attention(
        q, g, dl, wd0, bd, wdd, bd, wdd, bd, wdd, bd, ip))

    print("ALL PROBES OK", flush=True)


if __name__ == "__main__":
    import sys

    main(interpret="--interpret" in sys.argv)
