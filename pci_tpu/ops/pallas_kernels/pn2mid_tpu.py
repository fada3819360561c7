"""PointNet++ MSG mid-section megakernel (Pallas TPU, eval path).

Everything in ``Pointnet2FeatureAbstract`` between sa1's 1024-point
output and the dense fp1 runs on <=1024 points (reference chain
Utils/Layers.py:498-528, Utils/Pointnet2Utils.py:206-316):

  sa2: FPS 1024->256, ball r=.2/.4 K=16/32, MLPx3+GN(4), slot max -> [256,256]
  sa3: FPS  256->64,  ball r=.4/.8 K=16/32, MLPx3+GN(4), slot max -> [64,512]
  sa4: FPS   64->16,  ball r=.8/1.6 K=16/32, MLPx3+GN(4), slot max -> [16,1024]
  fp4: 3-NN interp l4->l3, [skip|interp] MLPx2+GN(4)              -> [64,256]
  fp3: 3-NN interp l3->l2, ...                                    -> [256,256]
  fp2: 3-NN interp l2->l1, ...                                    -> [1024,128]

As XLA this is ~30 sub-ms launches (3 FPS fori chains, 3 multi-scale
ball queries, 12 gathers, 22 dense/GN stages) whose cost is launch
latency + HBM round-trips of tiny tensors.  Here the WHOLE chain is ONE
kernel with grid=(B,): every intermediate stays in VMEM and only fp2's
``[1024, 128]`` output leaves the core.

GroupNorm CANNOT fold into the weights (stats are data-dependent,
global per sample x group — torch GroupNorm(4) over [C, S, K] reduces
(C/4, S, K)), which is exactly why these stages never joined the
BN-folding kernels (setconv/knnconv).  With the level activation
VMEM-resident the two-pass (stats, then normalize) costs no HBM.

Layout rules (attention_tpu lessons):
  * grouped activations are ROW-major ``[K*S, C]`` (slot-major rows,
    channels on the 128-lane minor) so each MLP layer is ONE MXU matmul
    and the slot max is a legal MAJOR-axis reshape ``[K, S, C]``;
  * the ``[feats | dxyz]`` channel-minor concat is avoided by splitting
    the first layer's weight rows (h = f@W[:Cf] + dxyz@W[Cf:] + b);
  * xyz and features gather via separate one-hot matmuls (no
    lane-offset slicing of a fused row block).

Ball semantics match ops.ball_query exactly (first-K by INDEX order,
pad with first hit, empty row -> key 0); FPS centers are computed
in-kernel with the exact greedy loop (start 0 = eval fps_start);
3-NN interp recomputes exact distances from the selected rows and uses
the Pointnet2Utils "eps" weights 1/(d^2 + 1e-8).

Training and CPU keep the XLA expression; no VJP here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flowmid_tpu import _fps_greedy

_IMAX = 2**31 - 1
_GN_EPS = 1e-5
_GROUPS = 4

# layer counts: sa2 s0/s1, sa3 s0/s1, sa4 s0/s1, fp4, fp3, fp2
_N_LAYERS = (3, 3, 3, 3, 3, 3, 2, 2, 2)


def _sqd_rows(q_rows, k_t):
    """q_rows [S, 3], k_t [3, Nk] -> [S, Nk] squared distances (VPU)."""
    d = (q_rows[:, 0][:, None] - k_t[0][None, :]) ** 2
    d = d + (q_rows[:, 1][:, None] - k_t[1][None, :]) ** 2
    return d + (q_rows[:, 2][:, None] - k_t[2][None, :]) ** 2


def _dot(a, b):
    return lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _gn_relu(h, aux):
    """GroupNorm(4, eps 1e-5) + ReLU on pre-activations ``h [R, C]``.
    ``aux [3, C]`` rows = (dense bias — already added), gn scale, gn
    bias.  Stats reduce over ALL rows x the group's channel slice, the
    flax/torch semantics for per-sample global normalization."""
    f32 = jnp.float32
    R, C = h.shape
    gsz = C // _GROUPS
    cio = lax.broadcasted_iota(jnp.int32, (C, _GROUPS), 0)
    gio = lax.broadcasted_iota(jnp.int32, (C, _GROUPS), 1)
    M = ((cio // gsz) == gio).astype(f32)  # [C, G] group membership
    s1 = _dot(jnp.sum(h, axis=0, keepdims=True), M)  # [1, G]
    s2 = _dot(jnp.sum(h * h, axis=0, keepdims=True), M)
    n = f32(R * gsz)
    mean_g = s1 / n
    var_g = jnp.maximum(s2 / n - mean_g * mean_g, 0.0)
    # broadcast group stats back to channels: [1, G] @ [G, C]
    mt = jnp.transpose(M)
    mean_c = _dot(mean_g, mt)
    rstd_c = _dot(lax.rsqrt(var_g + _GN_EPS), mt)
    y = (h - mean_c) * rstd_c * aux[1][None, :] + aux[2][None, :]
    return jnp.maximum(y, 0.0)


def _gn_layers(h, layers):
    """Dense + GN + ReLU chain on ``h [R, C]``."""
    for wt, aux in layers:
        h = _gn_relu(_dot(h, wt[...]) + aux[0][None, :], aux[...])
    return h


def _sa_scale(c_rows, k_t, key_rows, feats_rows, r2, K, layers,
              gf_scr, gx_scr):
    """One MSG scale: ball group (first-K by index, reference pads) +
    per-slot MLP/GN + slot max.  Returns ``[S, C_out]``."""
    f32 = jnp.float32
    S = c_rows.shape[0]
    Nk = key_rows.shape[0]
    Cf = feats_rows.shape[1]

    d = _sqd_rows(c_rows, k_t)  # [S, Nk]
    mask = (d <= r2).astype(f32)
    # inclusive in-radius prefix along the key axis: T[m, n] = (m <= n)
    tri = (
        lax.broadcasted_iota(jnp.int32, (Nk, Nk), 0)
        <= lax.broadcasted_iota(jnp.int32, (Nk, Nk), 1)
    ).astype(f32)
    slot = _dot(mask, tri) - 1.0  # [S, Nk], valid where mask
    counts = jnp.sum(mask, axis=1, keepdims=True)  # [S, 1]

    # slot 0: first in-radius hit; empty queries take key row 0
    eq0 = jnp.where((slot == 0.0) & (mask > 0.0), 1.0, 0.0)
    has = counts > 0.0
    g0f = jnp.where(has, _dot(eq0, feats_rows), feats_rows[0][None, :])
    g0x = jnp.where(has, _dot(eq0, key_rows), key_rows[0][None, :])
    gf_scr[0:S, :] = g0f
    gx_scr[0:S, :] = g0x

    def body(k, _):
        kf = k.astype(f32)
        eq = jnp.where((slot == kf) & (mask > 0.0), 1.0, 0.0)
        pad = counts <= kf  # shortfall: repeat the first hit
        gf = jnp.where(pad, gf_scr[0:S, :], _dot(eq, feats_rows))
        gx = jnp.where(pad, gx_scr[0:S, :], _dot(eq, key_rows))
        gf_scr[pl.ds(k * S, S), :] = gf
        gx_scr[pl.ds(k * S, S), :] = gx
        return 0

    lax.fori_loop(1, K, body, 0)

    gf = gf_scr[0:K * S, :]
    dxyz = gx_scr[0:K * S, :] - jnp.reshape(
        jnp.broadcast_to(c_rows[None], (K, S, 3)), (K * S, 3)
    )
    # first layer with split weight rows: [feats | dxyz] never concats
    w0, aux0 = layers[0]
    h = _dot(gf, w0[0:Cf, :]) + _dot(dxyz, w0[Cf:Cf + 3, :]) + aux0[0][None, :]
    h = _gn_relu(h, aux0[...])
    h = _gn_layers(h, layers[1:])
    return jnp.max(jnp.reshape(h, (K, S, h.shape[1])), axis=0)


def _knn3_interp(q_rows, k_t, key_rows, feats_rows):
    """3-NN inverse-squared-distance interp (Pointnet2Utils.py:266-316
    "eps" weights).  Selection via packed sort keys; weights recomputed
    exactly from the selected rows.  Returns ``[Nq, C]``."""
    f32 = jnp.float32
    Nq = q_rows.shape[0]
    S = key_rows.shape[0]
    C = feats_rows.shape[1]
    d = _sqd_rows(q_rows, k_t)  # [Nq, S]
    idx_bits = max((S - 1).bit_length(), 1)
    bits = lax.bitcast_convert_type(d, jnp.int32)
    col = lax.broadcasted_iota(jnp.int32, (Nq, S), 1)
    keys = (bits & ~((1 << idx_bits) - 1)) | col

    num = jnp.zeros((Nq, C), f32)
    den = jnp.zeros((Nq, 1), f32)
    for _ in range(3):
        bmin = jnp.min(keys, axis=1, keepdims=True)
        eq = (keys == bmin).astype(f32)
        gx = _dot(eq, key_rows)  # [Nq, 3]
        gf = _dot(eq, feats_rows)  # [Nq, C]
        dex = jnp.sum((gx - q_rows) ** 2, axis=1, keepdims=True)
        r = 1.0 / (dex + 1e-8)
        num = num + r * gf
        den = den + r
        keys = jnp.where(eq > 0.0, _IMAX, keys)
    return num / den


def _fp_stage(q_rows, k_t, key_rows, feats_rows, skip, layers):
    """FeaturePropagationP2 body: interp + [skip | interp] MLP/GN."""
    interp = _knn3_interp(q_rows, k_t, key_rows, feats_rows)
    cs = skip.shape[1]
    ci = interp.shape[1]
    w0, aux0 = layers[0]
    h = (
        _dot(skip, w0[0:cs, :])
        + _dot(interp, w0[cs:cs + ci, :])
        + aux0[0][None, :]
    )
    h = _gn_relu(h, aux0[...])
    return _gn_layers(h, layers[1:])


def _pn2mid_kernel(*refs, s_list, ks, r2s):
    """Grid (B,).  Ref order: l1_xT [1,3,N1], l1_x [1,N1,3],
    l1_f [1,N1,C1], then (W, aux) pairs for the 9 layer groups
    (_N_LAYERS), then 12 scratches (gf/gx per SA scale), out
    [1, N1, C_out]."""
    l1_xt = refs[0][0]
    l1_x = refs[1][0]
    l1_f = refs[2][0]
    i = 3
    groups = []
    for n in _N_LAYERS:
        groups.append(
            tuple((refs[i + 2 * j], refs[i + 2 * j + 1]) for j in range(n))
        )
        i += 2 * n
    out_ref = refs[i]
    scr = refs[i + 1:]
    assert len(scr) == 12, len(scr)

    s2, s3, s4 = s_list

    # --- encoder: three MSG levels, FPS centers in-kernel ---
    c2t = _fps_greedy(l1_xt, s2)
    c2 = jnp.transpose(c2t)
    l2_f = jnp.concatenate(
        [
            _sa_scale(c2, l1_xt, l1_x, l1_f, r2s[0][0], ks[0][0],
                      groups[0], scr[0], scr[1]),
            _sa_scale(c2, l1_xt, l1_x, l1_f, r2s[0][1], ks[0][1],
                      groups[1], scr[2], scr[3]),
        ],
        axis=1,
    )
    c3t = _fps_greedy(c2t, s3)
    c3 = jnp.transpose(c3t)
    l3_f = jnp.concatenate(
        [
            _sa_scale(c3, c2t, c2, l2_f, r2s[1][0], ks[1][0],
                      groups[2], scr[4], scr[5]),
            _sa_scale(c3, c2t, c2, l2_f, r2s[1][1], ks[1][1],
                      groups[3], scr[6], scr[7]),
        ],
        axis=1,
    )
    c4t = _fps_greedy(c3t, s4)
    c4 = jnp.transpose(c4t)
    l4_f = jnp.concatenate(
        [
            _sa_scale(c4, c3t, c3, l3_f, r2s[2][0], ks[2][0],
                      groups[4], scr[8], scr[9]),
            _sa_scale(c4, c3t, c3, l3_f, r2s[2][1], ks[2][1],
                      groups[5], scr[10], scr[11]),
        ],
        axis=1,
    )

    # --- decoder: three FP levels ---
    l3_f = _fp_stage(c3, c4t, c4, l4_f, l3_f, groups[6])
    l2_f = _fp_stage(c2, c3t, c3, l3_f, l2_f, groups[7])
    out_ref[0] = _fp_stage(l1_x, c2t, c2, l2_f, l1_f, groups[8])


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def pn2mid_fused(
    l1_xyz, l1_f, layers_flat, s_list=(256, 64, 16),
    radii=((0.2, 0.4), (0.4, 0.8), (0.8, 1.6)),
    ks=((16, 32), (16, 32), (16, 32)),
    interpret=False,
):
    """sa2..sa4 + fp4..fp2 of Pointnet2FeatureAbstract as ONE kernel.

    Args:
      l1_xyz, l1_f: ``[B, N1, 3]`` / ``[B, N1, C1]`` sa1 output.
      layers_flat: flat ``(W [Cin,Cout], aux [3,Cout]) * 24`` tuple in
        group order sa2s0, sa2s1, sa3s0, sa3s1, sa4s0, sa4s1, fp4, fp3,
        fp2 with layer counts ``_N_LAYERS`` (``gn_pointmlp_vars`` per
        group); ``aux`` rows = (dense bias, gn scale, gn bias).
      s_list: FPS center counts per SA level.
      radii / ks: per-level (scale0, scale1) ball radius / budget.

    Returns:
      fp2 output ``[B, N1, C_out]`` fp32.
    """
    B, n1, _ = l1_xyz.shape
    assert sum(_N_LAYERS) * 2 == len(layers_flat), len(layers_flat)
    f32 = jnp.float32

    xt = jnp.swapaxes(l1_xyz.astype(f32), 1, 2)
    ins = [xt, l1_xyz.astype(f32), l1_f.astype(f32)]
    in_specs = [
        pl.BlockSpec((1,) + a.shape[1:], lambda b: (b, 0, 0)) for a in ins
    ]
    for w in layers_flat:
        w = w.astype(f32)
        ins.append(w)
        in_specs.append(pl.BlockSpec(w.shape, lambda b: (0, 0)))

    # per-SA-scale input feature widths: level 0 consumes sa1's C1, each
    # later level the concat of the previous level's two scale outputs
    c_in = int(l1_f.shape[2])
    cfs = []
    off = 0
    for lvl in range(3):
        cfs.append(c_in)
        last0 = layers_flat[2 * (off + _N_LAYERS[2 * lvl] - 1)]
        off += _N_LAYERS[2 * lvl]
        last1 = layers_flat[2 * (off + _N_LAYERS[2 * lvl + 1] - 1)]
        off += _N_LAYERS[2 * lvl + 1]
        c_in = int(last0.shape[1]) + int(last1.shape[1])

    # scratch: grouped gathers per SA scale ([K*S, Cf] + [K*S, 3])
    scratch = []
    for lvl in range(3):
        S = s_list[lvl]
        for sc in range(2):
            K = ks[lvl][sc]
            scratch.append(pltpu.VMEM((K * S, cfs[lvl]), f32))
            scratch.append(pltpu.VMEM((K * S, 3), f32))

    c_out = layers_flat[-2].shape[1]
    r2s = tuple(tuple(float(r) ** 2 for r in rs) for rs in radii)

    out = pl.pallas_call(
        functools.partial(_pn2mid_kernel, s_list=s_list, ks=ks, r2s=r2s),
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, n1, c_out), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, n1, c_out), f32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*ins)
    return out


def gn_pointmlp_vars(p, n):
    """Flatten a PointMLP(norm='group') param subtree into the kernel's
    ``(W, aux)*n`` layout (aux rows = dense bias, gn scale, gn bias)."""
    out = []
    for i in range(n):
        d = p[f"Dense_{i}"]
        g = p[f"GroupNorm_{i}"]
        out.append(jnp.asarray(d["kernel"], jnp.float32))
        out.append(jnp.stack([
            jnp.asarray(d["bias"], jnp.float32),
            jnp.asarray(g["scale"], jnp.float32),
            jnp.asarray(g["bias"], jnp.float32),
        ]))
    return tuple(out)
