"""Bounded TPU probes + wedge-bisection protocol for every Pallas kernel.

Run FIRST after a chip recovery: each probe is small (sub-second device
execution, ~10 s compiles) and value-fetches its result, so a hang
localizes to one kernel instead of wedging the worker mid-way through a
full-model profile.

Modes (VERDICT r4 item 4 — a wedge must NAME its trigger):

  python benchmarks/probe_kernels.py            # all probes, one process
  python benchmarks/probe_kernels.py --list     # print probe labels
  python benchmarks/probe_kernels.py --only L   # run exactly one probe
  python benchmarks/probe_kernels.py --bisect   # one probe per SUBPROCESS,
                                                # each bounded by --timeout
                                                # (default 600 s); stops at
                                                # the first hang and prints
                                                # "WEDGE SUSPECT: <label>".

The bisect parent never touches JAX (a wedged axon worker hangs PJRT
client creation in-process forever); it learns the labels from a --list
subprocess and appends START/OK/FAIL/TIMEOUT lines to
results/logs/bisect_<ts>.log so the attribution survives a lost shell.

The auction kernel (longest device executions in the repo, worst ~21 s
@16k — the prime wedge suspect, VERDICT r4 item 4) gets two probes at
the END of the list so its failure cannot mask the cheap kernels.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

# runnable both as `python benchmarks/probe_kernels.py` and `python -m`
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe(label, fn):
    """Returns True on success.  Failures (e.g. a Mosaic lowering
    rejection after a toolchain move — r5 saw float-iota verification
    errors on kernels that ran green in r3) are NAMED and non-fatal: a
    crashing probe process is itself a wedge trigger candidate, and one
    broken kernel must not mask the rest of the measurement program."""
    print(f"probe START {label}", flush=True)
    t0 = time.perf_counter()
    try:
        out = fn()
        val = float(np.asarray(out).astype(np.float64).sum())
        assert np.isfinite(val), (label, val)
    except Exception as e:  # noqa: BLE001 — hangs are the fatal mode here
        dt = time.perf_counter() - t0
        msg = str(e).splitlines()[0][:200] if str(e) else type(e).__name__
        print(f"probe FAIL  {label:40s} ({dt:6.1f} s): {msg}", flush=True)
        return False
    dt = time.perf_counter() - t0
    print(f"probe OK    {label:40s} (compile+run {dt:6.1f} s)", flush=True)
    return True


def build_probes(interpret=False):
    """Ordered ``[(label, thunk)]``.  Builds numpy inputs and imports
    kernel modules only — no PJRT client is created until a thunk runs
    (jnp conversion happens inside the thunks)."""
    import jax.numpy as jnp

    ip = False
    if interpret:  # TPU-faithful interpreter (CPU smoke of this script)
        from jax.experimental.pallas import tpu as pltpu

        ip = pltpu.InterpretParams()

    rng = np.random.default_rng(0)
    f32 = np.float32
    J = jnp.asarray

    xyz_n = (rng.normal(size=(1, 1024, 3)) * 3).astype(f32)
    feats_n = rng.normal(size=(1, 1024, 4)).astype(f32)
    newx_n = (rng.normal(size=(1, 256, 3)) * 3).astype(f32)
    W0_n = rng.normal(size=(16, 7)).astype(f32)
    b0_n = np.zeros((16,), f32)

    probes = []

    def add(label, fn):
        probes.append((label, fn))

    add("backend (devices + matmul)", lambda: __import__("jax").numpy.ones(
        (128, 128)) @ __import__("jax").numpy.ones((128, 128)))

    from pci_tpu.ops.pallas_kernels.setconv_tpu import setconv_fused

    add("setconv_fused early-exit", lambda: setconv_fused(
        J(xyz_n), J(feats_n), J(newx_n), 1.0, 16, (J(W0_n), J(b0_n)), 1,
        True, ip))
    add("setconv_fused full-scan", lambda: setconv_fused(
        J(xyz_n), J(feats_n), J(newx_n), 0.01, 16, (J(W0_n), J(b0_n)), 1,
        True, ip))

    from pci_tpu.ops.pallas_kernels.ball_tpu import ball_query_pallas

    add("ball_query_pallas", lambda: ball_query_pallas(
        J(xyz_n), J(newx_n), J(np.asarray([0.5, 1.0], f32)), (8, 16),
        ip)[0])
    add("ball_query_pallas no-early-exit", lambda: ball_query_pallas(
        J(xyz_n), J(newx_n), J(np.asarray([0.5, 1.0], f32)), (8, 16),
        ip, False)[0])

    from pci_tpu.ops.pallas_kernels.knnconv_tpu import knnconv_fused

    kf_n = rng.normal(size=(1, 1024, 8)).astype(f32)
    qf_n = rng.normal(size=(1, 256, 6)).astype(f32)
    sk_n = rng.normal(size=(1, 256, 5)).astype(f32)
    Wf_n = rng.normal(size=(16, 17)).astype(f32)
    Wi_n = rng.normal(size=(12, 13)).astype(f32)
    add("knnconv_fused max", lambda: knnconv_fused(
        J(newx_n), J(xyz_n), J(kf_n), J(qf_n), None, 8,
        (J(Wf_n), J(np.zeros((16,), f32))), (), 1, 0, ip))
    add("knnconv_fused interp", lambda: knnconv_fused(
        J(newx_n), J(xyz_n), J(kf_n), None, J(sk_n), 3, (),
        (J(Wi_n), J(np.zeros((12,), f32))), 0, 1, ip, True))

    from pci_tpu.ops.pallas_kernels.fusion_tail_tpu import (
        fusion_attention_tail,
    )

    comb_n = rng.normal(size=(1, 512, 3)).astype(f32)
    resi_n = rng.normal(size=(1, 512, 32, 3)).astype(f32)
    Wa_n = rng.normal(size=(64, 4)).astype(f32)
    ba_n = np.zeros((64,), f32)
    Wb_n = rng.normal(size=(128, 64)).astype(f32)
    bb_n = np.zeros((128,), f32)
    add("fusion_attention_tail", lambda: fusion_attention_tail(
        J(comb_n), J(resi_n), None, (J(Wa_n), J(ba_n), J(Wb_n), J(bb_n)),
        2, ip))

    comb2_n = (rng.normal(size=(1, 4096, 3)) * 3).astype(f32)
    comb3_n = (rng.normal(size=(1, 2048, 3)) * 3).astype(f32)
    if not interpret:  # these route/compile on-device only
        from pci_tpu import ops
        from pci_tpu.ops.pallas_kernels import knn_fusion_adaptive

        add("knn_fusion_adaptive", lambda: knn_fusion_adaptive(
            J(comb2_n), J(np.asarray([2048], np.int32)),
            J(np.asarray([16], np.int32)), 32, 32))
        add("knn packed-key", lambda: ops.knn(J(comb2_n), J(comb2_n), 16)[1])
        add("fps_points", lambda: ops.fps_points(J(comb2_n), 512, 0))

    # r4: key_valid-masked cells kNN (the 64k fusion route's engine) and
    # the W-winners fusion bucket phase — tiny bounded shapes
    from pci_tpu.ops.pallas_kernels.knn_cells_tpu import knn_cells

    vmask_n = (np.arange(2048, dtype=np.int32)[None, :] < 1024)
    add("knn_cells key_valid", lambda: knn_cells(
        J(comb3_n), J(comb3_n), 8, chunk=512, m_chunks=4, tile=128,
        key_valid=J(vmask_n), emit_resi=True, interpret=ip)[1])
    if not interpret:
        from pci_tpu.nn.fusion import _cells_fusion_knn
        from pci_tpu.ops.pallas_kernels import knn_fusion_adaptive as kfa

        add("knn_fusion_adaptive winners=2", lambda: kfa(
            J(comb3_n), J(np.asarray([1024], np.int32)),
            J(np.asarray([8], np.int32)), 16, 64, winners=2)[0])
        # F=2 routes to the single-pass kernel; F=3 exercises the
        # 2-pass masked route
        add("fusion cells single-pass 2seg", lambda: _cells_fusion_knn(
            J(comb3_n), J(np.asarray([[1024, 2048]], np.int32)),
            J(np.asarray([[8, 8]], np.int32)), 16,
            chunk=512, m_chunks=4, tile=128))
        add("cells fusion 2-pass 3seg", lambda: _cells_fusion_knn(
            J(comb3_n), J(np.asarray([[640, 1280, 2048]], np.int32)),
            J(np.asarray([[5, 5, 6]], np.int32)), 16,
            chunk=512, m_chunks=4, tile=128))

    # r4 megakernels — first Mosaic lowering happens HERE, bounded, so a
    # rejection/hang localizes before any full-model stage runs them
    from pci_tpu.ops.pallas_kernels import knn_fusion_attention
    from pci_tpu.ops.pallas_kernels.flowenc_tpu import flowenc_fused
    from pci_tpu.ops.pallas_kernels.flowmid_tpu import flowmid_fused

    c1_n = (rng.normal(size=(1, 512, 3)) * 3).astype(f32)
    c2s_n = (rng.normal(size=(1, 128, 3)) * 3).astype(f32)
    We1_n = rng.normal(size=(8, 6)).astype(f32)
    We2_n = rng.normal(size=(12, 11)).astype(f32)
    add("flowenc_fused megakernel", lambda: flowenc_fused(
        J(comb3_n), J(np.zeros((1, 2048, 3), f32)), J(c1_n),
        (J(We1_n), J(np.zeros((8,), f32)), J(We2_n),
         J(np.zeros((12,), f32))),
        128, 1.0, 16, 2.0, 16, 1, 1, ip)[1])

    def _mid():
        mrng = np.random.default_rng(1)
        fa1 = J(mrng.normal(size=(1, 512, 8)).astype(f32))
        fa2 = J(mrng.normal(size=(1, 128, 12)).astype(f32))
        mk = lambda co, ci: (  # noqa: E731
            J(mrng.normal(size=(co, ci)).astype(f32)),
            J(np.zeros((co,), f32)))
        flat = sum([
            mk(12, 27), mk(12, 12), mk(12, 12),    # fe (3+12+12 -> 12)
            mk(16, 15), mk(16, 16), mk(16, 16),    # sc3 (3+12)
            mk(24, 19), mk(24, 24), mk(24, 24),    # sc4 (3+16)
            mk(16, 43), mk(16, 16),                # su1_2 ((3+24)+16)
            mk(16, 19), mk(16, 16), mk(16, 16),    # su2_1 (3+16)
            mk(16, 40),                            # su2_2 (16+fa2 12+emb 12)
            mk(16, 19), mk(16, 16), mk(16, 16),    # su3_1 (3+16)
            mk(16, 24),                            # su3_2 (16+8)
        ], ())
        return flowmid_fused(
            J(c1_n), fa1, J(c2s_n), fa2, J(c2s_n + 0.1), fa2 + 0.1, flat,
            32, 8, 8, 2.0, 8, 4.0, 8, 8, ip)
    add("flowmid_fused megakernel", _mid)

    add("knn_fusion_attention one-shot", lambda: knn_fusion_attention(
        J(comb3_n), J(np.asarray([[1024, 2048]], np.int32)),
        J(np.asarray([[8, 8]], np.int32)),
        (J(Wa_n), J(ba_n), J(Wb_n), J(bb_n)), 16, 32, 1, ip))

    # r5: PointNet++ MSG mid-section megakernel (sa2..fp2, GroupNorm
    # two-pass in VMEM) — tiny structural twin of the production config
    from pci_tpu.ops.pallas_kernels.pn2mid_tpu import pn2mid_fused

    def _pn2():
        prng = np.random.default_rng(2)
        l1x = J(prng.normal(size=(1, 256, 3)).astype(f32))
        l1f = J(prng.normal(size=(1, 256, 16)).astype(f32))
        mkg = lambda ci, co: (  # noqa: E731
            J((prng.normal(size=(ci, co)) * 0.3).astype(f32)),
            J(prng.normal(size=(3, co)).astype(f32)))
        flat = sum([
            mkg(19, 8), mkg(8, 8), mkg(8, 16),   # sa2 s0 (feats 16 + 3)
            mkg(19, 8), mkg(8, 8), mkg(8, 16),   # sa2 s1 -> l2f 32
            mkg(35, 8), mkg(8, 8), mkg(8, 16),   # sa3 s0 (32 + 3)
            mkg(35, 8), mkg(8, 8), mkg(8, 16),   # sa3 s1 -> 32
            mkg(35, 8), mkg(8, 8), mkg(8, 16),   # sa4 s0
            mkg(35, 8), mkg(8, 8), mkg(8, 16),   # sa4 s1 -> 32
            mkg(64, 16), mkg(16, 16),            # fp4 (skip 32 | interp 32)
            mkg(48, 16), mkg(16, 16),            # fp3 (32 | 16)
            mkg(32, 16), mkg(16, 8),             # fp2 (16 | 16)
        ], ())
        return pn2mid_fused(
            l1x, l1f, flat, (64, 16, 8),
            ((0.5, 1.0), (1.0, 2.0), (2.0, 4.0)),
            ((4, 8), (4, 8), (4, 8)), ip)
    add("pn2mid_fused megakernel", _pn2)

    from pci_tpu.ops.pallas_kernels.attention_tpu import (
        fused_vector_attention,
    )

    d, k = 64, 16
    q_n = rng.normal(size=(1, 512, d)).astype(f32)
    g_n = rng.normal(size=(1, 512, k, 2 * d)).astype(f32)
    dl_n = rng.normal(size=(1, 512, k, 3)).astype(f32)
    wd0_n = rng.normal(size=(3, d)).astype(f32)
    wdd_n = rng.normal(size=(d, d)).astype(f32)
    bd_n = np.zeros((d,), f32)
    add("fused_vector_attention", lambda: fused_vector_attention(
        J(q_n), J(g_n), J(dl_n), J(wd0_n), J(bd_n), J(wdd_n), J(bd_n),
        J(wdd_n), J(bd_n), J(wdd_n), J(bd_n), ip))

    if not interpret:
        # Auction EMD — the repo's longest device executions (sequential
        # grid, n/256 price rounds per pass; 16k worst ~21 s, adjacent to
        # the axon ~60 s execution watchdog).  PRIME WEDGE SUSPECT; kept
        # last so a hang here cannot mask the cheap kernels.
        from pci_tpu.ops.emd import emd_assignment_dist

        au1_n = (rng.normal(size=(2048, 3)) * 5).astype(f32)
        au2_n = (au1_n + 0.3 * rng.normal(size=(2048, 3))).astype(f32)
        add("auction_emd 2048", lambda: emd_assignment_dist(
            J(au1_n), J(au2_n), 1e-3, 512)[0])
        au3_n = (rng.normal(size=(8192, 3)) * 5).astype(f32)
        au4_n = (au3_n + 0.3 * rng.normal(size=(8192, 3))).astype(f32)
        add("auction_emd 8192 (long exec)", lambda: emd_assignment_dist(
            J(au3_n), J(au4_n), 1e-3, 1024)[0])

    return probes


def main(interpret=False, only=None):
    import jax

    if interpret:
        # force CPU BEFORE touching devices: with a wedged axon worker the
        # PJRT client creation hangs forever (r3 failure mode)
        jax.config.update("jax_platforms", "cpu")

    probes = build_probes(interpret)
    if only is not None:
        probes = [(lb, fn) for lb, fn in probes if lb == only]
        if not probes:
            print(f"no probe named {only!r}", file=sys.stderr)
            sys.exit(2)
    print("devices:", jax.devices(), flush=True)
    failed = [label for label, fn in probes if not probe(label, fn)]
    if failed:
        print(f"{len(failed)} PROBES FAILED: {failed}", flush=True)
        sys.exit(1)
    print("ALL PROBES OK", flush=True)


def bisect(timeout_s, interpret=False):
    """One probe per bounded subprocess; stop at the first hang and name
    it.  The parent never initializes JAX."""
    import subprocess

    me = os.path.abspath(__file__)
    extra = ["--interpret"] if interpret else []
    r = subprocess.run(
        [sys.executable, me, "--list", *extra],
        capture_output=True, text=True, timeout=300,
    )
    labels = [ln for ln in r.stdout.splitlines() if ln.strip()]
    assert labels, f"--list failed: {r.stderr[-500:]}"

    log_dir = os.path.join(os.path.dirname(me), "..", "results", "logs")
    os.makedirs(log_dir, exist_ok=True)
    log_path = os.path.join(
        log_dir, time.strftime("bisect_%m%d_%H%M.log"))

    def emit(line):
        print(line, flush=True)
        with open(log_path, "a") as f:
            f.write(line + "\n")

    emit(f"bisect: {len(labels)} probes, {timeout_s:.0f}s each -> {log_path}")
    failed = []
    for label in labels:
        emit(f"START   {label}")
        t0 = time.perf_counter()
        try:
            r = subprocess.run(
                [sys.executable, me, "--only", label, *extra],
                capture_output=True, text=True, timeout=timeout_s,
            )
        except subprocess.TimeoutExpired:
            emit(f"TIMEOUT {label} after {timeout_s:.0f}s")
            emit(f"WEDGE SUSPECT: {label}")
            emit("stopping: a wedged worker poisons every later probe")
            sys.exit(2)
        dt = time.perf_counter() - t0
        if r.returncode == 0:
            emit(f"OK      {label} ({dt:.1f}s)")
            # settle: the worker poisons a client connecting within ~a
            # minute of a successful client's exit (r5 wedge findings)
            time.sleep(float(os.environ.get("PCI_TPU_CLIENT_SETTLE", "60")))
        else:
            tail = (r.stderr.strip() or r.stdout.strip()).splitlines()
            emit(f"FAIL    {label} rc={r.returncode} ({dt:.1f}s): "
                 f"{tail[-1][-200:] if tail else ''}")
            failed.append(label)
    if failed:
        emit(f"bisect done: {len(failed)} FAILED (no hang): {failed}")
        sys.exit(1)
    emit("bisect done: ALL PROBES OK")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--only", default=None)
    ap.add_argument("--bisect", action="store_true")
    ap.add_argument("--timeout", type=float, default=600.0)
    args = ap.parse_args()
    if args.list:
        for lb, _ in build_probes(args.interpret):
            print(lb)
    elif args.bisect:
        bisect(args.timeout, args.interpret)
    else:
        main(args.interpret, args.only)
