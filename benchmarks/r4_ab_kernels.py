"""Round-4 A/B measurements: attribute ms to each routed kernel.

VERDICT r3 item 3: the r3 fused kernels (setconv / knnconv / fusion_tail)
were parity-tested but never perf-measured end-to-end.  This script times
each model with each kernel gate flipped OFF in-process (the gates are
module-level functions — monkeypatching + re-jitting gives the XLA
fallback), so every routing decision gets a measured justification.

Sections (run bounded subsets with --sections):
  flownet  — FlowNet3D eval @16k: all-on vs setconv-off vs knnconv-off
  pointinet— PointINet @16k: all-on vs fusion_tail-off
  fusionab — standalone fusion kNN: (bucket, winners) grid, ms + recall
  cells64k — 64k fusion kNN: flat kernel vs cells route, ms + agreement

Timing: slope recipe (two scan lengths, value-fetch sync) — CLAUDE.md.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from benchmarks.timing import slope as _shared_slope


def _slope(fn, args, reps, label):
    return _shared_slope(fn, args, reps, label, width=52, digits=3)


def _real_pair(npoints):
    base = "/root/reference/Demos/20230508test/demo_data/Inputs/"
    import jax.numpy as jnp

    if os.path.isdir(base):
        def load(name, seed):
            pts = np.fromfile(base + name, np.float32).reshape(-1, 5)[:, :3]
            idx = np.random.default_rng(seed).choice(
                len(pts), npoints, replace=len(pts) < npoints)
            return pts[idx]

        return jnp.asarray(load("key_1.bin", 0)), jnp.asarray(load("key_2.bin", 1))
    rng = np.random.default_rng(0)
    a = (rng.standard_normal((npoints, 3)) * 10).astype(np.float32)
    return jnp.asarray(a), jnp.asarray(a + 0.3)


def section_flownet(reps, npoints=16384):
    import jax
    import jax.numpy as jnp

    from pci_tpu import nn as pnn
    from pci_tpu.models import FlowNet3D

    p1, p2 = _real_pair(npoints)
    p1, p2 = p1[None], p2[None]
    f0 = jnp.zeros_like(p1)
    model = FlowNet3D()
    mv = jax.jit(lambda: model.init(
        {"params": jax.random.key(0)}, p1, p2, f0, f0, train=False))()

    def run_config(label, setconv, knnconv, mid=False, enc=False):
        import pci_tpu.nn.layers as L
        from pci_tpu.models import flownet3d as fmod

        orig_s, orig_k = L._setconv_ok, L._knnconv_ok
        orig_m, orig_e = fmod._mid_ok, fmod._enc_ok
        if not setconv:
            L._setconv_ok = lambda *a, **k: False
        if not knnconv:
            L._knnconv_ok = lambda *a, **k: False
        if not mid:
            fmod._mid_ok = lambda train: False
        if not enc:
            fmod._enc_ok = lambda train: False
        try:
            return _slope(
                lambda v, a, b, c: model.apply(
                    v, a + c, b, jnp.zeros_like(a), jnp.zeros_like(a),
                    train=False),
                (mv, p1, p2), reps, f"FlowNet3D @16k [{label}]",
            )
        finally:
            L._setconv_ok, L._knnconv_ok = orig_s, orig_k
            fmod._mid_ok, fmod._enc_ok = orig_m, orig_e

    full = run_config("enc+mid megakernels", True, True, mid=True, enc=True)
    mid = run_config("mid megakernel only", True, True, mid=True)
    base = run_config("setconv+knnconv ON ", True, True)
    no_s = run_config("setconv OFF        ", False, True)
    no_k = run_config("knnconv OFF        ", True, False)
    none = run_config("both OFF (pure XLA)", False, False)
    print(f"  -> enc megakernel saves {mid - full:+.3f} ms, mid "
          f"megakernel saves {base - mid:+.3f} ms vs layer kernels; "
          f"setconv saves {no_s - base:+.3f} ms, knnconv saves "
          f"{no_k - base:+.3f} ms, both save {none - base:+.3f} ms",
          flush=True)


def section_pointinet(reps, npoints=16384):
    import jax
    import jax.numpy as jnp

    from pci_tpu.models import PointINet

    p1, p2 = _real_pair(npoints)
    p1, p2 = p1[None], p2[None]
    zeros = jnp.zeros_like(p1)
    t = jnp.asarray([0.5], jnp.float32)
    model = PointINet(freeze_flow=True)
    mv = jax.jit(lambda: model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        p1, p2, zeros, zeros, t, train=False))()

    def run_config(label, tail_on, mid=True, enc=True, oneshot=True):
        import pci_tpu.nn.fusion as F
        from pci_tpu.models import flownet3d as fmod

        orig = F._fusion_tail_ok
        orig_m, orig_e = fmod._mid_ok, fmod._enc_ok
        orig_o = F._fusion_oneshot_ok
        if not tail_on:
            F._fusion_tail_ok = lambda train: False
        if not mid:
            fmod._mid_ok = lambda train: False
        if not enc:
            fmod._enc_ok = lambda train: False
        if not oneshot:
            F._fusion_oneshot_ok = lambda train: False
        try:
            return _slope(
                lambda v, a, b, tt, c: model.apply(
                    v, a + c, b, jnp.zeros_like(a), jnp.zeros_like(a), tt,
                    train=False, rngs={"sample": jax.random.key(2)}),
                (mv, p1, p2, t), reps, f"PointINet @16k [{label}]",
            )
        finally:
            F._fusion_tail_ok = orig
            fmod._mid_ok, fmod._enc_ok = orig_m, orig_e
            F._fusion_oneshot_ok = orig_o

    base = run_config("all megakernels ON", True)
    no_o = run_config("oneshot OFF       ", True, oneshot=False)
    no_e = run_config("enc OFF           ", True, enc=False)
    no_m = run_config("mid OFF           ", True, mid=False)
    off = run_config("fusion_tail OFF   ", False, oneshot=False)
    print(f"  -> oneshot fusion saves {no_o - base:+.3f} ms, fusion_tail "
          f"saves {off - no_o:+.3f} ms, decode-mid saves "
          f"{no_m - base:+.3f} ms, enc saves {no_e - base:+.3f} ms",
          flush=True)


def _combined_16k(npoints=16384):
    import jax.numpy as jnp

    p1, p2 = _real_pair(npoints)
    half = npoints // 2
    return jnp.concatenate([p1[:half], p2[:half]], axis=0)[None], half


def section_fusionab(reps, npoints=16384):
    import jax
    import jax.numpy as jnp

    from pci_tpu.ops.pallas_kernels import knn_fusion_adaptive

    k, k1v = 32, 16
    combined, half = _combined_16k(npoints)
    split = jnp.asarray([half], jnp.int32)
    k1 = jnp.asarray([k1v], jnp.int32)

    # exact per-segment reference (one-time, ~0.5 s of top_k)
    N = combined.shape[1]
    pos = jnp.arange(N, dtype=jnp.int32)[None, :]
    d_full = jax.jit(lambda c: jnp.sum(
        (c[:, :, None] - c[:, None, :, :]) ** 2, -1))(combined)
    refs = []
    for lo, hi, kk in ((0, half, k1v), (half, N, k - k1v)):
        dm = jnp.where(((pos >= lo) & (pos < hi))[:, None, :], d_full, np.inf)
        refs.append(np.asarray(jax.lax.top_k(-dm, kk)[1]))
    ref = np.concatenate(refs, axis=-1)
    del d_full

    for bucket, winners in ((32, 1), (64, 1), (64, 2), (128, 2)):
        idx = knn_fusion_adaptive(
            combined, split, k1, k, bucket, False, True, winners=winners)[0]
        gi = np.asarray(idx)
        hits = sum(
            len(set(gi[0, q]) & set(ref[0, q])) for q in range(0, N, 7)
        )
        rec = hits / (len(range(0, N, 7)) * k)
        ms = _slope(
            lambda s, kk, c: knn_fusion_adaptive(
                combined + c, s, kk, k, bucket, False, False,
                winners=winners),
            (split, k1), reps,
            f"fusion kNN 16k l={bucket} W={winners} (recall {rec:.3f})",
        )


def section_cells64k(reps, npoints=65536):
    import jax
    import jax.numpy as jnp

    from pci_tpu.nn.fusion import _cells_fusion_knn
    from pci_tpu.ops.pallas_kernels import knn_fusion_adaptive

    k = 32
    combined, half = _combined_16k(npoints)
    split = jnp.asarray([half], jnp.int32)
    k1 = jnp.asarray([16], jnp.int32)
    seg_ends = jnp.asarray([[half, npoints]], jnp.int32)
    budgets = jnp.asarray([[16, 16]], jnp.int32)

    from pci_tpu.ops.pallas_kernels import knn_fusion_cells

    # NOTE: 64k Mosaic compiles take ~10 min EACH — keep every variant in
    # this one process (CLAUDE.md r2)
    flat = _slope(
        lambda s, kk, c: knn_fusion_adaptive(
            combined + c, s, kk, k, 64, False, False, winners=1),
        (split, k1), max(reps // 4, 3), "fusion kNN 64k FLAT l=64",
    )
    single = _slope(
        lambda s, kk, c: knn_fusion_cells(combined + c, s, kk, k),
        (split, k1), max(reps // 4, 3), "fusion kNN 64k CELLS 1-pass",
    )
    # bucket 32 halves the extraction rows (the 1-pass kernel's dominant
    # cost) at W=2 collision tolerance — candidate new default if recall
    # holds (compare the agreement lines)
    single32 = _slope(
        lambda s, kk, c: knn_fusion_cells(
            combined + c, s, kk, k, bucket=32),
        (split, k1), max(reps // 4, 3), "fusion kNN 64k CELLS 1-pass l=32",
    )
    twop = _slope(
        lambda se, bu, c: _cells_fusion_knn(
            combined + c, se, bu, k, single_pass=False),
        (seg_ends, budgets),
        max(reps // 4, 3), "fusion kNN 64k CELLS 2-pass",
    )
    # one-shot tail mode: fused rows out, no [64k,32,3] resi block or
    # un-permute gather (random folded weights — timing only)
    wr = np.random.default_rng(1)
    layers = (jnp.asarray(wr.normal(size=(64, 4)).astype(np.float32)),
              jnp.zeros((64,), jnp.float32),
              jnp.asarray(wr.normal(size=(128, 64)).astype(np.float32)),
              jnp.zeros((128,), jnp.float32))
    oneshot = _slope(
        lambda s, kk, c: knn_fusion_cells(
            combined + c, s, kk, k, tail_layers=layers),
        (split, k1), max(reps // 4, 3), "fusion 64k CELLS 1-pass ONESHOT",
    )

    # neighbor agreement vs flat (both approximate)
    fi = np.asarray(knn_fusion_adaptive(
        combined, split, k1, k, 64, False, True, winners=1)[0])
    ci = np.asarray(knn_fusion_cells(
        combined, split, k1, k, emit_idx=True)[0])
    ci32 = np.asarray(knn_fusion_cells(
        combined, split, k1, k, bucket=32, emit_idx=True)[0])
    qs = list(range(0, npoints, 31))
    agree = sum(len(set(fi[0, q]) & set(ci[0, q])) for q in qs) / (len(qs) * k)
    agree32 = sum(len(set(fi[0, q]) & set(ci32[0, q])) for q in qs) / (len(qs) * k)
    print(f"  -> flat {flat:.2f} vs 1-pass {single:.2f} (l=32: "
          f"{single32:.2f}, oneshot {oneshot:.2f}) vs 2-pass {twop:.2f} "
          f"ms; agreement vs flat l=16 {agree:.3f} / l=32 {agree32:.3f}",
          flush=True)


def section_bwdab(reps, npoints=16384):
    """Scatter vs sort formulation of the kNN-transpose backward
    (scatter_add_rows) on the fusion-training workload: [B, N·k] duplicate
    indices into [B, N, 3]."""
    import jax
    import jax.numpy as jnp

    from pci_tpu.ops.gather import scatter_add_rows

    k = 32
    combined, half = _combined_16k(npoints)
    N = combined.shape[1]
    rng = np.random.default_rng(0)
    # realistic index distribution: each query's k neighbors are nearby
    # rows (heavy local duplication), not uniform
    base = np.arange(N, dtype=np.int64)[:, None]
    idx = np.clip(base + rng.integers(-64, 65, (N, k)), 0, N - 1)
    idx = jnp.asarray(idx.reshape(1, N * k).astype(np.int32))
    g = jnp.asarray(rng.normal(size=(1, N * k, 3)).astype(np.float32))

    res = {}
    for method in ("scatter", "sort"):
        res[method] = _slope(
            lambda gg, c, m=method: scatter_add_rows(idx, gg + c, N, method=m),
            (g,), reps, f"scatter_add_rows 16k*32 [{method}]",
        )
    a = np.asarray(scatter_add_rows(idx, g, N, method="scatter"))
    b = np.asarray(scatter_add_rows(idx, g, N, method="sort"))
    err = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-30)
    print(f"  -> sort vs scatter: {res['sort']:.3f} vs {res['scatter']:.3f}"
          f" ms, max rel err {err:.2e}", flush=True)

    # end-to-end: grad of a fusion-core consumer under each method
    from pci_tpu.ops.pallas_kernels.fusion_knn_tpu import _fusion_core

    seg_ends = jnp.asarray([[half, N]], jnp.int32)
    budgets = jnp.asarray([[16, 16]], jnp.int32)
    interp = jax.devices()[0].platform != "tpu"  # CPU smoke path
    loss = lambda c: jnp.sum(  # noqa: E731
        _fusion_core(c, seg_ends, budgets, k, 64, 1, interp)[1] ** 2)
    for method in ("scatter", "sort"):
        os.environ["PCI_TPU_KNN_BWD"] = method
        _slope(
            lambda c, z: jax.grad(loss)(c + z), (combined,), max(reps // 2, 3),
            f"fusion core fwd+bwd 16k [{method}]",
        )
    os.environ.pop("PCI_TPU_KNN_BWD", None)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sections", nargs="+",
                    default=["flownet", "pointinet", "fusionab"],
                    choices=["flownet", "pointinet", "fusionab", "cells64k",
                             "bwdab"])
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--npoints", type=int, default=0,
                    help="override point count (CPU smoke)")
    args = ap.parse_args()

    import jax

    print("device:", jax.devices()[0].platform, flush=True)
    for s in args.sections:
        print(f"--- {s} ---", flush=True)
        kw = {"npoints": args.npoints} if args.npoints else {}
        globals()[f"section_{s}"](args.reps, **kw)


if __name__ == "__main__":
    main()
