"""FlowNet3D encoder megakernel: set_conv1 + set_conv2 in ONE Pallas
pass (TPU, eval path).

The Siamese encoder (reference Models/New_Models0.py:57-62, shared
across every pair a cloud appears in) is two ball-grouped set-convs:

  set_conv1: 16k keys -> 1024 centers, r=0.5, K=16, MLP (32,32,64)
  set_conv2: 1024 keys ->  256 centers, r=1.0, K=16, MLP (64,64,128)

As separate setconv_fused launches, set_conv2 re-reads set_conv1's
[1024, 64] output from HBM and pays a second fixed launch cost.  Here
both stages run in one kernel with grid=(B,): stage 1 streams the big
key cloud exactly like setconv_tpu (triangular-matmul slot prefix,
early exit, reference pad rules) into a per-query-tile VMEM scratch and
writes f_1 to its output ref; stage 2 then treats ``[centers1 | f_1]``
— still in VMEM — as its resident key rows and produces f_2.  FPS
centers for both stages are computed outside (ops.fps_points, start 0
at eval).  BatchNorm folds into the weights (fold_bn_layers).  Training
and CPU keep the XLA expression; no VJP.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TQ = 128  # query rows per tile
TK = 256  # key rows per streamed tile


def _flowenc_kernel(rows_ref, c1_ref, *refs,
                    r1sq, k1, c_in1, n_tiles1, n_l1,
                    r2sq, k2, n_l2, s1, s2):
    """Grid: (B,).  rows_ref [1, C_in1, Npad] resident [xyz | feats];
    c1_ref [1, 3, S1]; then (WT, b) pairs for MLP1 (n_l1 layers) and
    MLP2 (n_l2); outputs f1 [1, C1out, S1], f2 [1, C2out, S2],
    c2 [1, 3, S2] (set_conv2's FPS centers, computed IN-KERNEL from
    centers1 with the exact greedy loop); scratch acc [max rows, TQ]."""
    from .flowmid_tpu import _fps_greedy

    w = refs[: 2 * (n_l1 + n_l2)]
    f1_ref = refs[2 * (n_l1 + n_l2)]
    f2_ref = refs[2 * (n_l1 + n_l2) + 1]
    c2_ref = refs[2 * (n_l1 + n_l2) + 2]
    acc_ref = refs[2 * (n_l1 + n_l2) + 3]
    f32 = jnp.float32

    tri = (
        lax.broadcasted_iota(jnp.int32, (TK, TK), 0)
        >= lax.broadcasted_iota(jnp.int32, (TK, TK), 1)
    ).astype(f32)

    def mlp(h, layers):
        for wt, b in layers:
            h = lax.dot_general(
                wt[...], h, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            ) + b[...]
            h = jnp.maximum(h, 0.0)
        return h

    def ball_stage(q3, key_slice, n_tiles, r2, K, C, layers, row0,
                   out_ref, out_off):
        """One set-conv stage for one query tile: stream key tiles,
        accumulate slot rows in acc scratch, then per-slot MLP + max.

        q3 [3, TQ]; key_slice(t) -> [C, TK] rows (xyz first 3 rows);
        row0 [C, 1] global fallback row; writes out_ref[0][:, out_off:].
        """
        qx = q3[0][None, :]
        qy = q3[1][None, :]
        qz = q3[2][None, :]
        acc_ref[pl.ds(0, K * C), :] = jnp.zeros((K * C, TQ), f32)

        def body(state):
            t, counts = state
            rows = key_slice(t)  # [C, TK]
            d = (
                (rows[0][:, None] - qx) ** 2
                + (rows[1][:, None] - qy) ** 2
                + (rows[2][:, None] - qz) ** 2
            )  # [TK, TQ]
            mask = (d <= r2).astype(f32)
            incl = lax.dot_general(
                tri, mask, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            slot = counts + incl - 1.0
            for k_ in range(K):
                eq = jnp.where((slot == f32(k_)) & (mask > 0.0), 1.0, 0.0)
                upd = lax.dot_general(
                    rows, eq, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )
                acc_ref[pl.ds(k_ * C, C), :] += upd
            return t + 1, counts + jnp.sum(mask, axis=0, keepdims=True)

        def cond(state):
            t, counts = state
            return (t < n_tiles) & (jnp.min(counts) < f32(K))

        _, counts = lax.while_loop(
            cond, body, (jnp.int32(0), jnp.zeros((1, TQ), f32))
        )

        q3c = jnp.concatenate([qx, qy, qz], axis=0)
        slot0 = acc_ref[pl.ds(0, C), :]
        slot0 = jnp.where(counts > 0.0, slot0, row0)
        best = None
        for k_ in range(K):
            rows_k = acc_ref[pl.ds(k_ * C, C), :] if k_ else slot0
            if k_:
                rows_k = jnp.where(counts > f32(k_), rows_k, slot0)
            h = jnp.concatenate([rows_k[:3] - q3c, rows_k[3:]], axis=0)
            h = mlp(h, layers)
            best = h if best is None else jnp.maximum(best, h)
        out_ref[0, :, pl.ds(out_off, TQ)] = best

    l1 = tuple((w[2 * j], w[2 * j + 1]) for j in range(n_l1))
    l2 = tuple(
        (w[2 * (n_l1 + j)], w[2 * (n_l1 + j) + 1]) for j in range(n_l2)
    )

    # stage 1: centers1 over the streamed big cloud
    row0_1 = rows_ref[0, :, 0][:, None]

    def stage1_tile(i, _):
        q3 = c1_ref[0, :, pl.ds(i * TQ, TQ)]
        ball_stage(
            q3, lambda t: rows_ref[0, :, pl.ds(t * TK, TK)],
            n_tiles1, r1sq, k1, c_in1, l1, row0_1, f1_ref, i * TQ,
        )
        return 0

    lax.fori_loop(0, s1 // TQ, stage1_tile, 0)

    # set_conv2's FPS centers from centers1 — in-kernel exact greedy
    c2 = _fps_greedy(c1_ref[0], s2)  # [3, S2]
    c2_ref[0] = c2

    # stage 2: centers2 over [centers1 | f_1], all VMEM-resident.  Tiles
    # are read back through the REFS with pl.ds — lax.dynamic_slice on
    # values is unimplemented in Mosaic (r5 probe: "Unimplemented
    # primitive ... dynamic_slice"), ref indexing is the supported form.
    c2rows = 3 + f1_ref.shape[1]
    row0_2 = jnp.concatenate(
        [c1_ref[0, :, 0:1], f1_ref[0, :, 0:1]], axis=0
    )

    def stage2_tile(i, _):
        q3 = c2_ref[0, :, pl.ds(i * TQ, TQ)]
        ball_stage(
            q3,
            lambda t: jnp.concatenate(
                [c1_ref[0, :, pl.ds(t * TK, TK)],
                 f1_ref[0, :, pl.ds(t * TK, TK)]], axis=0,
            ),
            s1 // TK, r2sq, k2, c2rows, l2, row0_2, f2_ref, i * TQ,
        )
        return 0

    lax.fori_loop(0, s2 // TQ, stage2_tile, 0)


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 9, 10, 11))
def flowenc_fused(
    xyz, feats, centers1, layers_flat, s2,
    radius1, k1, radius2, k2, n_l1, n_l2, interpret=False,
):
    """Fused set_conv1 + set_conv2 (FlowNet3D encoder) at eval.

    Args:
      xyz: ``[B, N, 3]`` input cloud.
      feats: ``[B, N, D]`` input features (zeros for LiDAR).
      centers1: ``[B, S1, 3]`` FPS centers for set_conv1 (S1 % 256 == 0).
      layers_flat: folded ``(WT, b, ...)`` — MLP1's n_l1 layers then
        MLP2's n_l2 layers (fold_bn_layers per group, concatenated).
      s2: set_conv2 center count — centers computed IN-KERNEL from
        centers1 (exact greedy, start 0) and returned.
      radius1/k1, radius2/k2: ball radius and neighbor budget per stage.

    Returns:
      ``(f_1 [B, S1, C1out], f_2 [B, S2, C2out], centers2 [B, S2, 3])``
      fp32.
    """
    B, N, _ = xyz.shape
    S1, S2 = centers1.shape[1], s2
    assert S1 % TK == 0 and S1 % TQ == 0 and S2 % TQ == 0
    D = feats.shape[-1]
    C = 3 + D
    rows = jnp.concatenate([xyz, feats.astype(jnp.float32)], axis=-1)
    n_pad = (-N) % TK
    if n_pad:  # far-away pad rows: never in radius
        rows = jnp.pad(rows, ((0, 0), (0, n_pad), (0, 0)),
                       constant_values=1e15)
    Np = N + n_pad

    ins = [
        jnp.swapaxes(rows, 1, 2),
        jnp.swapaxes(centers1.astype(jnp.float32), 1, 2),
    ]
    in_specs = [
        pl.BlockSpec((1, C, Np), lambda b: (b, 0, 0)),
        pl.BlockSpec((1, 3, S1), lambda b: (b, 0, 0)),
    ]
    for j, w in enumerate(layers_flat):
        w = (w if j % 2 == 0 else w.reshape(-1, 1)).astype(jnp.float32)
        ins.append(w)
        in_specs.append(pl.BlockSpec(w.shape, lambda b: (0, 0)))

    c1_out = layers_flat[2 * n_l1 - 2].shape[0]
    c2_out = layers_flat[-2].shape[0]
    scratch_rows = max(k1 * C, k2 * (3 + c1_out))

    f1, f2, c2 = pl.pallas_call(
        functools.partial(
            _flowenc_kernel,
            r1sq=float(radius1) ** 2, k1=k1, c_in1=C, n_tiles1=Np // TK,
            n_l1=n_l1, r2sq=float(radius2) ** 2, k2=k2, n_l2=n_l2,
            s1=S1, s2=S2,
        ),
        grid=(B,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, c1_out, S1), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, c2_out, S2), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 3, S2), lambda b: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, c1_out, S1), jnp.float32),
            jax.ShapeDtypeStruct((B, c2_out, S2), jnp.float32),
            jax.ShapeDtypeStruct((B, 3, S2), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((scratch_rows, TQ), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(*ins)
    return (jnp.swapaxes(f1, 1, 2), jnp.swapaxes(f2, 1, 2),
            jnp.swapaxes(c2, 1, 2))
