"""FlowNet3D decode mid-section megakernel (Pallas TPU, eval path).

Everything in the decoder between the shared encodings and the final
16k FeaturePropagation runs on <=1024 points (reference chain
Models/New_Models0.py:57-87 / Utils/Layers.py:95-160):

  FlowEmbedding(q=pa_2 256, keys=pb_2 256, knn=64)        -> emb  [256,128]
  set_conv3  (FPS 256->64,  ball r=2 ns=8, MLP->256)      -> fa_3 [64,256]
  set_conv4  (FPS  64->16,  ball r=4 ns=8, MLP->512)      -> fa_4 [16,512]
  set_upconv1(q=pa_3 64,  keys=pa_4 16, nn=8, skip fa_3)  -> nf_3 [64,256]
  set_upconv2(q=pa_2 256, keys=pa_3 64, nn=8, skip [fa_2|emb]) -> nf_2
  set_upconv3(q=pa_1 1024,keys=pa_2 256,nn=8, skip fa_1)  -> nf_1 [1024,256]

As separate fused kernels (knnconv/setconv) each stage is a sub-ms
launch whose cost is fixed overhead + HBM round-trips of tiny tensors.
Here the WHOLE chain runs in ONE kernel with grid=(B,): every
intermediate stays in VMEM (largest buffer is the [256,1024] su3
distance block, ~1 MB; total working set ~8 MB incl. folded weights),
and only nf_1 [256, N1] leaves the core.

Stage bodies reuse the proven per-stage recipes verbatim:
  * kNN stages — packed sort keys (fp32 bitcast int32, mantissa-LSB row
    id) + one min per round + one-hot gather-matmul + per-slot
    transposed MLP + running max (knnconv_tpu.py);
  * ball stages — full [Nk, S] mask, triangular-matmul inclusive prefix
    for first-K-by-index slots, reference pad-with-first / empty-row-0
    semantics (setconv_tpu.py; keys are single-tile at these sizes so
    no streaming loop is needed).

FPS centers for set_conv3/4 are computed IN-KERNEL (the exact greedy
loop of ops.fps, start 0 — the XLA route at these sizes is a
sequential ``fori_loop`` whose ~1.25 us/iteration loop latency
dominates, and the centers never leave the decode chain anyway).
BatchNorm folds into the weights (setconv_tpu.fold_bn_layers).
Training and CPU keep the XLA expression; no VJP here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_IMAX = 2**31 - 1


def _sqdist(q3, p3):
    """q3 [3, S], p3 [3, Nk] -> [Nk, S] squared distances (VPU)."""
    qx = q3[0][None, :]
    qy = q3[1][None, :]
    qz = q3[2][None, :]
    px = p3[0][:, None]
    py = p3[1][:, None]
    pz = p3[2][:, None]
    return (px - qx) ** 2 + (py - qy) ** 2 + (pz - qz) ** 2


def _fps_greedy(p3, npoint):
    """Exact greedy FPS over ``p3 [3, N]`` -> centers ``[3, npoint]``,
    matching ops.fps's XLA loop step-for-step (start index 0, argmax =
    FIRST max index via a min-iota tie-break, same fp32 reduction
    order).  At these sizes (N <= 1024) the XLA route is a sequential
    ``fori_loop`` whose per-iteration latency (~1.25 us, CLAUDE.md)
    dominates — running the same loop inside the megakernel removes two
    kernel launches AND the loop-boundary latency per stage."""
    f32 = jnp.float32
    n = p3.shape[1]
    iota = lax.broadcasted_iota(jnp.int32, (1, n), 1)
    kio = lax.broadcasted_iota(jnp.int32, (1, npoint), 1)

    def body(i, carry):
        dist, far, cs = carry
        oh = (iota == far).astype(f32)  # [1, n] one-hot of current pick
        c = jnp.sum(p3 * oh, axis=1, keepdims=True)  # [3, 1] centroid
        cs = jnp.where(kio == i, c, cs)  # record pick i
        d = jnp.sum((p3 - c) ** 2, axis=0, keepdims=True)  # [1, n]
        dist = jnp.minimum(dist, d)
        m = jnp.max(dist)
        far = jnp.min(jnp.where(dist == m, iota, jnp.int32(2**31 - 1)))
        return dist, far, cs

    _, _, cs = lax.fori_loop(
        0, npoint, body,
        (jnp.full((1, n), jnp.inf, f32), jnp.int32(0),
         jnp.zeros((3, npoint), f32)),
    )
    return cs


def _mlp(h, layers):
    """Transposed folded-BN MLP chain: h [Cin, S] -> [Cout, S]."""
    f32 = jnp.float32
    for wt, b in layers:
        h = lax.dot_general(
            wt[...], h, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) + b[...]
        h = jnp.maximum(h, 0.0)
    return h


def _knn_conv_max(q3, qf, p3, rows, k, layers, n_keys):
    """kNN-group + per-slot MLP + max (FlowEmbedding / SetUpConv body).

    q3 [3, S]; qf [Cq, S] per-query features appended to every slot's
    MLP input, or None; p3 [3, n_keys]; rows [3+Cf, n_keys]
    (= [key_xyz | key_feats]); layers may be empty (identity MLP1).
    Returns [Cm, S].
    """
    f32 = jnp.float32
    d = _sqdist(q3, p3)  # [Nk, S]
    idx_bits = max((n_keys - 1).bit_length(), 1)
    bits = lax.bitcast_convert_type(d, jnp.int32)
    row = lax.broadcasted_iota(jnp.int32, d.shape, 0)
    keys0 = (bits & ~((1 << idx_bits) - 1)) | row

    cm = layers[-1][0].shape[0] if layers else (
        rows.shape[0] + (qf.shape[0] if qf is not None else 0)
    )

    def round_step(_, carry):
        keys, best = carry
        bmin = jnp.min(keys, axis=0, keepdims=True)
        oh = (keys == bmin).astype(f32)
        g = lax.dot_general(
            rows, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )  # [3+Cf, S]
        h = jnp.concatenate(
            [g[:3] - q3, g[3:]] + ([qf] if qf is not None else []), axis=0
        )
        h = _mlp(h, layers)
        return jnp.where(oh > 0.0, _IMAX, keys), jnp.maximum(best, h)

    best0 = jnp.full((cm, q3.shape[1]), -jnp.inf, f32)
    _, h = lax.fori_loop(0, k, round_step, (keys0, best0))
    return h


def _ball_conv_max(c3, p3, rows, r2, K, layers):
    """Ball-group (first-K-by-index, reference pad rules) + per-slot MLP
    + max (SetConv body, single key tile).

    c3 [3, S] centers; p3 [3, Nk]; rows [3+Cf, Nk]; returns [Cout, S].
    """
    f32 = jnp.float32
    nk = p3.shape[1]
    d = _sqdist(c3, p3)  # [Nk, S]
    mask = (d <= r2).astype(f32)
    tri = (
        lax.broadcasted_iota(jnp.int32, (nk, nk), 0)
        >= lax.broadcasted_iota(jnp.int32, (nk, nk), 1)
    ).astype(f32)
    incl = lax.dot_general(
        tri, mask, (((1,), (0,)), ((), ())), preferred_element_type=f32,
    )
    slot = incl - 1.0
    counts = jnp.sum(mask, axis=0, keepdims=True)  # [1, S]
    row0 = rows[:, 0][:, None]

    best = None
    slot0 = None
    for k_ in range(K):
        eq = jnp.where((slot == f32(k_)) & (mask > 0.0), 1.0, 0.0)
        g = lax.dot_general(
            rows, eq, (((1,), (0,)), ((), ())), preferred_element_type=f32,
        )  # [3+Cf, S]
        if k_ == 0:
            g = jnp.where(counts > 0.0, g, row0)
            slot0 = g
        else:
            g = jnp.where(counts > f32(k_), g, slot0)
        h = jnp.concatenate([g[:3] - c3, g[3:]], axis=0)
        h = _mlp(h, layers)
        best = h if best is None else jnp.maximum(best, h)
    return best


_N_LAYERS = (3, 3, 3, 2, 3, 1, 3, 1)  # fe sc3 sc4 su1_2 su2_1 su2_2 su3_1 su3_2


def _flowmid_kernel(*refs, k_fe, r3sq, ns3, r4sq, ns4, k_up, n1, n2, s3, s4):
    """Grid: (B,).  Ref order: pa1 [1,3,N1], fa1 [1,Cf1,N1],
    pa2 [1,3,N2], fa2 [1,Cf2,N2], pb2 [1,3,N2], fb2 [1,Cf2,N2],
    then (WT, b) pairs for the 8 MLP groups (layer counts _N_LAYERS),
    out [1, Cout, N1].  The set_conv3/4 FPS centers (s3/s4 picks) are
    computed IN-KERNEL (_fps_greedy) — they are purely internal to the
    decode chain."""
    pa1 = refs[0][0]
    fa1 = refs[1][0]
    pa2 = refs[2][0]
    fa2 = refs[3][0]
    pb2 = refs[4][0]
    fb2 = refs[5][0]
    i = 6
    groups = []
    for n in _N_LAYERS:
        groups.append(
            tuple((refs[i + 2 * j], refs[i + 2 * j + 1]) for j in range(n))
        )
        i += 2 * n
    fe_l, sc3_l, sc4_l, su1_2, su2_1, su2_2, su3_1, su3_2 = groups
    out_ref = refs[i]

    x3 = _fps_greedy(pa2, s3)
    x4 = _fps_greedy(x3, s4)

    # FlowEmbedding: q=pa_2, keys=pb_2, per-slot input [dxyz|fb_g|fa_2]
    rows_b = jnp.concatenate([pb2, fb2], axis=0)
    emb = _knn_conv_max(pa2, fa2, pb2, rows_b, k_fe, fe_l, n2)

    # set_conv3: centers x3, keys pa_2 w/ emb features
    rows_a2 = jnp.concatenate([pa2, emb], axis=0)
    fa3 = _ball_conv_max(x3, pa2, rows_a2, r3sq, ns3, sc3_l)

    # set_conv4: centers x4, keys x3 w/ fa_3
    rows_3 = jnp.concatenate([x3, fa3], axis=0)
    fa4 = _ball_conv_max(x4, x3, rows_3, r4sq, ns4, sc4_l)

    # set_upconv1: q=x3, keys=x4, empty MLP1, skip fa_3
    rows_4 = jnp.concatenate([x4, fa4], axis=0)
    h = _knn_conv_max(x3, None, x4, rows_4, k_up, (), s4)
    nf3 = _mlp(jnp.concatenate([h, fa3], axis=0), su1_2)

    # set_upconv2: q=pa_2, keys=x3, skip [fa_2 | emb]
    rows_n3 = jnp.concatenate([x3, nf3], axis=0)
    h = _knn_conv_max(pa2, None, x3, rows_n3, k_up, su2_1, s3)
    nf2 = _mlp(jnp.concatenate([h, fa2, emb], axis=0), su2_2)

    # set_upconv3: q=pa_1, keys=pa_2, skip fa_1
    rows_n2 = jnp.concatenate([pa2, nf2], axis=0)
    h = _knn_conv_max(pa1, None, pa2, rows_n2, k_up, su3_1, n2)
    out_ref[0] = _mlp(jnp.concatenate([h, fa1], axis=0), su3_2)


@functools.partial(jax.jit, static_argnums=(7, 8, 9, 10, 11, 12, 13, 14, 15))
def flowmid_fused(
    pa_1, fa_1, pa_2, fa_2, pb_2, fb_2, layers_flat,
    s3=64, s4=16, k_fe=64, radius3=2.0, ns3=8, radius4=4.0, ns4=8, k_up=8,
    interpret=False,
):
    """The whole FlowNet3D decode mid-section as one Pallas kernel.

    Args:
      pa_1, fa_1: ``[B, N1, 3]`` / ``[B, N1, Cf1]`` level-1 encoding of
        the query cloud (set_conv1 output).
      pa_2, fa_2: ``[B, N2, 3]`` / ``[B, N2, Cf2]`` level-2 encoding.
      pb_2, fb_2: level-2 encoding of the OTHER cloud.
      s3, s4: set_conv3/4 FPS center counts — the centers are computed
        IN-KERNEL with the exact greedy loop (start 0, ops.fps
        semantics); they never leave the decode chain.
      layers_flat: flat ``(WT, b, ...)`` tuple concatenating the folded
        MLP groups in order (fe, sc3, sc4, su1.conv2, su2.conv1,
        su2.conv2, su3.conv1, su3.conv2) with layer counts
        ``(3, 3, 3, 2, 3, 1, 3, 1)`` (fold_bn_layers per group).

    Returns:
      nf_1 ``[B, N1, C_out]`` fp32 (set_upconv3 output — feed to the
      FeaturePropagation + classifier tail).
    """
    B, N1, _ = pa_1.shape
    N2 = pa_2.shape[1]
    assert sum(_N_LAYERS) * 2 == len(layers_flat)

    tr = lambda a: jnp.swapaxes(a.astype(jnp.float32), 1, 2)  # noqa: E731
    ins = [tr(pa_1), tr(fa_1), tr(pa_2), tr(fa_2), tr(pb_2), tr(fb_2)]
    in_specs = [
        pl.BlockSpec((1,) + a.shape[1:], lambda b: (b, 0, 0)) for a in ins
    ]
    for j, w in enumerate(layers_flat):
        w = (w if j % 2 == 0 else w.reshape(-1, 1)).astype(jnp.float32)
        ins.append(w)
        in_specs.append(pl.BlockSpec(w.shape, lambda b: (0, 0)))
    c_out = layers_flat[-2].shape[0]

    out = pl.pallas_call(
        functools.partial(
            _flowmid_kernel, k_fe=k_fe, r3sq=float(radius3) ** 2, ns3=ns3,
            r4sq=float(radius4) ** 2, ns4=ns4, k_up=k_up,
            n1=N1, n2=N2, s3=s3, s4=s4,
        ),
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, c_out, N1), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, c_out, N1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(*ins)
    return jnp.swapaxes(out, 1, 2)
