"""Fused kNN set-conv tail (Pallas TPU, eval path).

Serves FlowNet3D's three kNN-grouped stages (reference math:
Utils/Layers.py:95-160):

  * FlowEmbedding — kNN(xyz1 -> xyz2), concat ``[dxyz, f2_g, f1]``,
    MLP + max-pool;
  * SetUpConv — kNN(dense -> coarse), concat ``[dxyz, f_coarse]``,
    MLP1 (may be empty) + max-pool, concat dense skip feats, MLP2;
  * FeaturePropagation — 3-NN inverse-distance interpolation
    (``interp=True``: weighted-sum pooling with weights from EXACT
    distances recomputed off the gathered xyz, matching
    ops/interpolate.py's recompute-from-idx contract), concat dense
    skip feats, MLP.

All these run at coarse shapes (N <= 1024 keys), so the key cloud and
its feature rows stay fully VMEM-resident and the whole stage fuses
into one kernel per 128-query tile:

  1. full ``[N, TQ]`` squared-distance block on the VPU;
  2. k extraction rounds with packed sort keys (fp32 bitcast int32 with
     the mantissa LSBs replaced by the key row id — order-preserving
     for non-negative values, unique winners even among duplicate
     points, same recipe as knn_tpu.py): one min + one-hot compare +
     one ``[C, N] @ [N, TQ]`` gather-matmul per round, inside a
     ``fori_loop`` so round buffers are reused (an unrolled python
     loop would keep every round's ``[N, TQ]`` alive — VMEM OOM rule
     from CLAUDE.md);
  3. per-slot transposed MLP1 chain + running elementwise max;
  4. optional skip concat + MLP2 chain.

BatchNorm folds into the weights at eval (setconv_tpu.fold_bn_layers).
Training and CPU keep the XLA expression (no VJP here).  Neighbor
RANKING uses mantissa-quantized distances (~2^-13 relative) like every
TPU kNN path in this repo; the emitted rows are exact (gathered, not
reconstructed), and max-pooling is insensitive to neighbor order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TQ = 128  # query rows per grid step
_IMAX = 2**31 - 1  # python int: a jnp constant would be captured as a
# kernel const, which pallas_call rejects


def _knnconv_kernel(*refs, k, n, c1, cs, n_mlp1, n_mlp2, idx_bits,
                    interp, recip, n_final):
    """Grid: (B, S // TQ).

    Ref order: q [1,3,TQ], p [1,3,N], rows [1,C2,N],
    [qf [1,c1,TQ] if c1], [skip [1,cs,TQ] if cs],
    (WT, b) per MLP1 layer, (WT, b) per MLP2 layer, out [1,Cout,TQ].
    """
    i = 0
    q_ref = refs[i]; i += 1
    p_ref = refs[i]; i += 1
    rows_ref = refs[i]; i += 1
    qf_ref = None
    if c1:
        qf_ref = refs[i]; i += 1
    skip_ref = None
    if cs:
        skip_ref = refs[i]; i += 1
    w1 = refs[i: i + 2 * n_mlp1]; i += 2 * n_mlp1
    w2 = refs[i: i + 2 * n_mlp2]; i += 2 * n_mlp2
    out_ref = refs[i]
    f32 = jnp.float32

    qx = q_ref[0, 0, :][None, :]
    qy = q_ref[0, 1, :][None, :]
    qz = q_ref[0, 2, :][None, :]
    q3 = jnp.concatenate([qx, qy, qz], axis=0)  # [3, TQ]

    px = p_ref[0, 0, :][:, None]  # [N, 1]
    py = p_ref[0, 1, :][:, None]
    pz = p_ref[0, 2, :][:, None]
    d = (px - qx) ** 2 + (py - qy) ** 2 + (pz - qz) ** 2  # [N, TQ]

    # packed sort keys: non-negative fp32 bitcast int32 is
    # order-preserved; the low idx_bits carry the key row for unique
    # winners (duplicate-point safe)
    bits = lax.bitcast_convert_type(d, jnp.int32)
    row = lax.broadcasted_iota(jnp.int32, (n, TQ), 0)
    keys0 = (bits & ~((1 << idx_bits) - 1)) | row

    rows_all = rows_ref[0]  # [C2, N]
    qf = qf_ref[0] if c1 else None  # [c1, TQ]

    def mm(wt_ref, b_ref, x):
        return lax.dot_general(
            wt_ref[...], x, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) + b_ref[...]

    def extract(keys):
        """One packed-key min round: (advanced keys, gathered rows)."""
        bmin = jnp.min(keys, axis=0, keepdims=True)  # [1, TQ]
        oh = (keys == bmin).astype(f32)  # exact one-hot
        g = lax.dot_general(
            rows_all, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )  # [C2, TQ] = [g_xyz | g_feats]
        return jnp.where(oh > 0.0, _IMAX, keys), g

    if interp:
        # inverse-distance weighted sum (FeaturePropagation,
        # Utils/Layers.py:171-182): weights from EXACT distances
        # recomputed off the gathered xyz (quantized packed keys only
        # pick the winner)
        cf = rows_all.shape[0] - 3

        def round_step(_, carry):
            keys, fsum, wsum = carry
            keys, g = extract(keys)
            de = jnp.sum((g[:3] - q3) ** 2, axis=0, keepdims=True)
            if recip == "clamp":  # Layers.py:171-182 variant
                r = 1.0 / jnp.maximum(de, 1e-10)
            else:  # "eps": Pointnet2Utils.py:266-316 variant
                r = 1.0 / (de + 1e-8)
            return keys, fsum + r * g[3:], wsum + r

        _, fsum, wsum = lax.fori_loop(
            0, k, round_step,
            (keys0, jnp.zeros((cf, TQ), f32), jnp.zeros((1, TQ), f32)),
        )
        h = fsum / wsum
    else:
        def round_step(_, carry):
            keys, best = carry
            keys, g = extract(keys)
            h = jnp.concatenate(
                [g[:3] - q3, g[3:]] + ([qf] if c1 else []), axis=0
            )
            for j in range(n_mlp1):
                h = jnp.maximum(mm(w1[2 * j], w1[2 * j + 1], h), 0.0)
            return keys, jnp.maximum(best, h)

        cm = (3 + rows_all.shape[0] - 3 + c1) if n_mlp1 == 0 else (
            w1[-2].shape[0]
        )
        best0 = jnp.full((cm, TQ), -jnp.inf, f32)
        _, h = lax.fori_loop(0, k, round_step, (keys0, best0))
    if cs:
        h = jnp.concatenate([h, skip_ref[0]], axis=0)
    for j in range(n_mlp2):
        h = mm(w2[2 * j], w2[2 * j + 1], h)
        if j < n_mlp2 - n_final:  # trailing n_final layers are linear
            h = jnp.maximum(h, 0.0)
    out_ref[0] = h


@functools.partial(jax.jit, static_argnums=(5, 8, 9, 10, 11, 12, 13))
def knnconv_fused(
    q_xyz, k_xyz, k_feats, q_feats, skip_feats, k,
    mlp1_flat, mlp2_flat, n_mlp1, n_mlp2, interpret=False,
    interp=False, recip="clamp", n_final=0,
):
    """Fused kNN-group + folded-BN MLP(s) + max-pool.

    Args:
      q_xyz: ``[B, S, 3]`` query points.
      k_xyz: ``[B, N, 3]`` key points (N <= ~2048: VMEM-resident).
      k_feats: ``[B, N, D]`` per-key features.
      q_feats: ``[B, S, C1]`` per-query features appended to every
        slot's MLP input (FlowEmbedding's ``f1``), or None.
      skip_feats: ``[B, S, Cs]`` skip features concatenated after the
        max-pool (SetUpConv), or None.
      k: static neighbor count.
      mlp1_flat / mlp2_flat: flat ``(WT, b, ...)`` tuples
        (setconv_tpu.fold_bn_layers); either may be empty.
      interp: True = inverse-distance 3-NN interpolation pooling
        (FeaturePropagation; requires ``n_mlp1 == 0`` and no
        ``q_feats``), False = per-slot MLP1 + max-pool.  With empty
        ``mlp2_flat`` the raw interpolated features are emitted
        (ops.three_nn_interpolate semantics — serves the GroupNorm
        FP variant whose MLP cannot fold).
      recip: inverse-distance flavor — "clamp" (Layers.py) or "eps"
        (Pointnet2Utils.py); interp mode only.
      n_final: the trailing ``n_final`` layers of the MLP2 chain skip
        the ReLU (plain linear) — lets a regression head (FlowNet3D's
        classifier, Models/New_Models0.py:40-45, BN folded) ride the
        same kernel instead of a separate launch over the dense cloud.

    Returns:
      ``[B, S, C_out]`` fp32.
    """
    B, N, _ = k_xyz.shape
    S = q_xyz.shape[1]
    rows = jnp.concatenate(
        [k_xyz, k_feats.astype(jnp.float32)], axis=-1
    )
    n_pad = (-N) % 8
    if n_pad:  # far-away pad keys rank last; only reachable if k > N
        k_xyz = jnp.pad(k_xyz, ((0, 0), (0, n_pad), (0, 0)),
                        constant_values=1e15)
        rows = jnp.pad(rows, ((0, 0), (0, n_pad), (0, 0)),
                       constant_values=0.0)
    s_pad = (-S) % TQ
    if s_pad:
        pad_q = lambda a: jnp.concatenate(
            [a, jnp.broadcast_to(a[:, :1], (B, s_pad, a.shape[-1]))], 1
        )
        q_xyz = pad_q(q_xyz)
        q_feats = pad_q(q_feats) if q_feats is not None else None
        skip_feats = pad_q(skip_feats) if skip_feats is not None else None
    Np, Sp = N + n_pad, S + s_pad
    idx_bits = max((Np - 1).bit_length(), 1)

    c1 = q_feats.shape[-1] if q_feats is not None else 0
    cs = skip_feats.shape[-1] if skip_feats is not None else 0
    c2 = rows.shape[-1]

    ins = [
        jnp.swapaxes(q_xyz, 1, 2),
        jnp.swapaxes(k_xyz, 1, 2),
        jnp.swapaxes(rows, 1, 2),
    ]
    in_specs = [
        pl.BlockSpec((1, 3, TQ), lambda b, i: (b, 0, i)),
        pl.BlockSpec((1, 3, Np), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((1, c2, Np), lambda b, i: (b, 0, 0)),
    ]
    if c1:
        ins.append(jnp.swapaxes(q_feats.astype(jnp.float32), 1, 2))
        in_specs.append(pl.BlockSpec((1, c1, TQ), lambda b, i: (b, 0, i)))
    if cs:
        ins.append(jnp.swapaxes(skip_feats.astype(jnp.float32), 1, 2))
        in_specs.append(pl.BlockSpec((1, cs, TQ), lambda b, i: (b, 0, i)))

    def add_layers(flat):
        for j, w in enumerate(flat):
            w = (w if j % 2 == 0 else w.reshape(-1, 1)).astype(jnp.float32)
            ins.append(w)
            in_specs.append(pl.BlockSpec(w.shape, lambda b, i: (0, 0)))

    add_layers(mlp1_flat)
    add_layers(mlp2_flat)

    if interp:
        assert n_mlp1 == 0 and c1 == 0, "interp mode: no MLP1/q_feats"
    if n_mlp2:
        c_out = mlp2_flat[-2].shape[0]
    elif n_mlp1:
        c_out = mlp1_flat[-2].shape[0]
    else:
        c_out = (c2 - 3 + cs) if interp else c2 + c1

    out = pl.pallas_call(
        functools.partial(
            _knnconv_kernel, k=k, n=Np, c1=c1, cs=cs,
            n_mlp1=n_mlp1, n_mlp2=n_mlp2, idx_bits=idx_bits,
            interp=interp, recip=recip, n_final=n_final,
        ),
        grid=(B, Sp // TQ),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, c_out, TQ), lambda b, i: (b, 0, i)),
        out_shape=jax.ShapeDtypeStruct((B, c_out, Sp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*ins)
    return jnp.swapaxes(out[:, :, :S], 1, 2)
