"""TransformerLayer 64k block attribution (the dominant ISAPCInet f2 cost).

profile_isapci r5 measured the full layer at 34.77 ms @65,536 (bf16
policy) but its standalone "knn self" row timed the FLAT kernel —
``ops.knn(q + c, q, k)`` breaks the ``query is points`` identity that
routes self-kNN to the cell-pruned kernel — so most of the layer's cost
is unattributed.  This profile times each stage on the routes the model
actually takes:

  knn-cells   — selection-only cells self-kNN (the default eval route)
  knn-resi    — cells kNN + in-kernel residual emission (TR_RESI=kernel)
  knn-flat    — the flat kernel (what profile_isapci's row measured)
  gather      — gather_split of [xyz | K|V] rows on fixed idx
  tail        — fused_vector_attention alone
  layer       — full layer, default route (gather)
  layer-resi  — full layer, in-kernel emission route

  python -m benchmarks.profile_transformer [--npoints 65536] [--reps 6]
      [--policy bfloat16] [--d 64] [--k 16]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from benchmarks.timing import slope as _shared_slope


def _slope(fn, args, reps, label):
    return _shared_slope(fn, args, reps, label, width=46, digits=2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npoints", type=int, default=65536)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--policy", default="bfloat16")
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--k", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pci_tpu import ops
    from pci_tpu.nn import TransformerLayer, policy
    from pci_tpu.nn.layers import gather_split

    policy.set_compute_dtype(args.policy)
    N, d, k, reps = args.npoints, args.d, args.k, args.reps
    rng = np.random.default_rng(0)
    xM = jnp.asarray(rng.standard_normal((1, N, 3)).astype(np.float32) * 3)
    featsM = jnp.tile(xM, (1, 1, (d + 2) // 3))[..., :d].astype(jnp.float32)

    # --- selection kernels --------------------------------------------
    def knn_cells_self(x, c):
        # ops.knn detects self-ness OUTSIDE its jit boundary (r5 fix in
        # ops/knn.py), so the duplicated binding routes to the cells
        # kernel at N>=32k on TPU
        y = x + c
        return ops.knn(y, y, k)[1].astype(jnp.float32)

    _slope(knn_cells_self, (xM,), reps, f"self-kNN cells idx-only @{N}")

    def knn_resi_self(x, c):
        y = x + c
        _, resi = ops.knn_self_resi(y, k)
        return resi

    _slope(knn_resi_self, (xM,), reps, f"self-kNN cells + resi @{N}")

    def knn_flat(x, c):
        return ops.knn(x + c, x, k)[1].astype(jnp.float32)

    _slope(knn_flat, (xM,), reps, f"self-kNN FLAT (broken identity) @{N}")

    # --- gather on fixed idx ------------------------------------------
    idx = jax.jit(lambda x: ops.knn(x, x, k)[1])(xM)
    kv = jnp.asarray(
        rng.standard_normal((1, N, 2 * d)).astype(np.float32)
    ).astype(policy.compute_dtype())

    def gath(x, kvv, ii, c):
        # c is fp32: cast before the add or the bf16 KV block silently
        # promotes to fp32 and the row times a never-executed variant
        g_xyz, g_feats = gather_split(x, kvv + c.astype(kvv.dtype), ii)
        # sum BOTH outputs into the timing reduction or one gather is DCE'd
        return (
            jnp.sum(g_xyz, axis=(2, 3))
            + jnp.sum(g_feats.astype(jnp.float32), axis=(2, 3))
        )

    _slope(gath, (xM, kv, idx), reps, f"gather_split xyz+KV @{N} k{k}")

    # --- fused attention tail alone -----------------------------------
    from pci_tpu.ops.pallas_kernels.attention_tpu import fused_vector_attention

    cd = policy.compute_dtype()
    q = jnp.asarray(rng.standard_normal((1, N, d)), cd)
    g = jnp.asarray(rng.standard_normal((1, N, k, 2 * d)), cd)
    delta = jnp.asarray(rng.standard_normal((1, N, k, 3)), jnp.float32)
    w = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, jnp.float32)
    tail = (w(3, d), w(d), w(d, d), w(d), w(d, d), w(d), w(d, d), w(d))

    interp = jax.default_backend() != "tpu"  # CPU smoke runs in interpret
    _slope(
        lambda qq, gg, dd, c: fused_vector_attention(
            qq + c.astype(qq.dtype), gg, dd, *tail, interpret=interp),
        (q, g, delta), reps, f"fused tail @{N} k{k} d{d}",
    )

    # --- full layer, both residual routes (trace-time env) ------------
    tr = TransformerLayer(d, k)
    tv = jax.jit(lambda: tr.init(jax.random.key(0), xM, featsM))()

    os.environ.pop("PCI_TPU_TR_RESI", None)
    f_gather = jax.jit(lambda v, x, ft, c: tr.apply(v, x + c, ft)[0])
    _slope(f_gather, (tv, xM, featsM), reps, f"layer @{N} [gather route]")

    os.environ["PCI_TPU_TR_RESI"] = "kernel"
    f_resi = jax.jit(lambda v, x, ft, c: tr.apply(v, x + c, ft)[0])
    _slope(f_resi, (tv, xM, featsM), reps, f"layer @{N} [resi kernel route]")
    os.environ.pop("PCI_TPU_TR_RESI", None)

    # --- compose: rebuild the layer incrementally to attribute the gap
    # between sum-of-pieces (knn 8.26 + gather 5.70 + tail 1.26 ~= 15.2
    # ms @64k, r5 followup) and the full layer (25.51 ms) -------------
    def c1(x, c):  # knn only
        y = x + c
        return ops.knn(y, y, k)[1].astype(jnp.float32)

    def c2(x, kvv, c):  # knn + fused gather
        y = x + c
        _, ii = ops.knn(y, y, k)
        g_xyz, g_f = gather_split(y, kvv, ii)
        return jnp.sum(g_xyz, (2, 3)) + jnp.sum(g_f.astype(jnp.float32), (2, 3))

    def c3(x, qq, kvv, c):  # + delta + fused tail (no projections)
        y = x + c
        _, ii = ops.knn(y, y, k)
        g_xyz, g_f = gather_split(y, kvv, ii)
        dd = y[:, :, None, :] - g_xyz
        return fused_vector_attention(qq, g_f, dd, *tail, interpret=interp)

    def c4(x, ft, c):  # full tail chain with fresh projections (no flax)
        y = x + c
        xx = ft @ w1
        qq = xx @ wq
        kvv = jnp.concatenate([xx @ wk, xx @ wv], axis=-1)
        _, ii = ops.knn(y, y, k)
        g_xyz, g_f = gather_split(y, kvv, ii)
        dd = y[:, :, None, :] - g_xyz
        res = fused_vector_attention(qq, g_f, dd, *tail, interpret=interp)
        return (res @ w2).astype(jnp.float32) + ft.astype(jnp.float32)

    w1 = jnp.asarray(rng.standard_normal((d, d)) * 0.1, cd)
    wq = jnp.asarray(rng.standard_normal((d, d)) * 0.1, cd)
    wk = jnp.asarray(rng.standard_normal((d, d)) * 0.1, cd)
    wv = jnp.asarray(rng.standard_normal((d, d)) * 0.1, cd)
    w2 = jnp.asarray(rng.standard_normal((d, d)) * 0.1, cd)
    featsC = featsM.astype(cd)
    # bucket A/B for the selection route: l=32 halves the extraction
    # candidate rows (n_cand = 2*M*C/l); attention is permutation-
    # invariant over its k slots so ranking quantization is free — only
    # recall matters (W=2 compensates; verify vs l=16 idx overlap)
    from pci_tpu.ops.pallas_kernels.knn_cells_tpu import knn_cells

    def knn_l32(x, c):
        y = x + c
        return knn_cells(y, y, k, m_chunks=16, tile=256, bucket=32)[1].astype(
            jnp.float32)

    if N >= 32768:
        _slope(knn_l32, (xM,), reps, f"self-kNN cells l=32 @{N}")
        i16 = jax.jit(lambda y: knn_cells(y, y, k, m_chunks=16, tile=256)[1])(xM)
        i32 = jax.jit(
            lambda y: knn_cells(y, y, k, m_chunks=16, tile=256, bucket=32)[1]
        )(xM)
        both = jnp.sum(
            (i32[0, :, :, None] == i16[0, :, None, :]).any(-1).mean()
        )
        print(f"l=32 vs l=16 idx overlap: {float(both):.4f}", flush=True)

    _slope(c1, (xM,), reps, f"compose knn @{N}")
    _slope(c2, (xM, kv), reps, f"compose knn+gather @{N}")
    _slope(c3, (xM, q, kv), reps, f"compose knn+gather+tail @{N}")
    _slope(c4, (xM, featsC), reps, f"compose full chain @{N}")


if __name__ == "__main__":
    main()
