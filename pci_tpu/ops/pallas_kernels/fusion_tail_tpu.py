"""Fused PointsFusion attention tail (Pallas TPU, eval path).

After the adaptive-kNN kernel emits the pre-merged neighbor residuals,
the fusion head (reference math: Utils/Layers.py:264-283 /
PointINet20230424/models/layers.py:406-430) is still an XLA chain over
``[B, N, k, C]`` tensors:

    feats  = [resi, |resi|]                 # [B, N, k, 4]
    h      = MLP(feats)                     # 4 -> 64 -> 64 -> 128 (BN)
    scores = max_c h                        # [B, N, k]
    w      = softmax_k(scores)
    fused  = combined + sum_k w * resi      # (+ sum_k w * feats_k for
                                            #  the intensity variant)

Every MLP boundary round-trips a ``[16k, 32, 64..128]`` activation
through HBM while the FLOPs are trivial — the same traffic shape the
transformer tail had (attention_tpu.py).  This kernel computes the
whole head per 256-query tile with VMEM-resident intermediates and
writes only the fused ``[B, N, 3 + Ce]`` rows.

Layout: the k axis merges into the ROW axis of each matmul (static
major-axis reshape, the attention_tpu.py lesson); the channel-minor
first-layer input concat ``[resi | dist]`` is avoided by splitting the
first weight matrix (``h0 = resi @ W[:3] + dist * W[3]``).  All
arithmetic fp32 (slightly MORE precise than the bf16-policy XLA path;
the softmax is fp32 in both — policy contract).

BatchNorm folds into the weights at eval (setconv_tpu.fold_bn_layers).
Training and CPU keep the XLA expression (no VJP here).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TQN = 256  # queries per grid step


def _tail_kernel(*refs, k, ce, n_layers):
    """Grid: (B, N // TQN).

    Ref order: combined [1, TQN, 3], resi [1, TQN, k, 3],
    [extra [1, TQN, k, ce] if ce], w0a [3, C0], w0b [1, C0], b0 [1, C0],
    then (w, b) per remaining layer ([Cin, Cout] / [1, Cout]),
    out [1, TQN, 3 + ce].
    """
    i = 0
    comb_ref = refs[i]; i += 1
    resi_ref = refs[i]; i += 1
    extra_ref = None
    if ce:
        extra_ref = refs[i]; i += 1
    w0a, w0b, b0 = refs[i], refs[i + 1], refs[i + 2]; i += 3
    wrest = refs[i: i + 2 * (n_layers - 1)]; i += 2 * (n_layers - 1)
    out_ref = refs[i]
    f32 = jnp.float32

    resi = resi_ref[0].astype(f32)  # [TQN, k, 3]
    tq = resi.shape[0]
    rows = tq * k
    dlt = resi.reshape(rows, 3)
    dist = jnp.sqrt(
        jnp.sum(dlt * dlt, axis=1, keepdims=True) + 1e-12
    )  # [rows, 1] (_safe_norm semantics)

    def mm(x, w):
        return jax.lax.dot_general(
            x, w[...], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )

    h = jnp.maximum(mm(dlt, w0a) + dist * w0b[...] + b0[...], 0.0)
    for j in range(n_layers - 1):
        h = jnp.maximum(mm(h, wrest[2 * j]) + wrest[2 * j + 1][...], 0.0)

    scores = jnp.max(h.reshape(tq, k, h.shape[-1]), axis=2)  # [tq, k]
    m = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - m)
    w = (e / jnp.sum(e, axis=1, keepdims=True))[:, :, None]  # [tq, k, 1]

    fused_xyz = comb_ref[0].astype(f32) + jnp.sum(w * resi, axis=1)
    if ce:
        fused_extra = jnp.sum(w * extra_ref[0].astype(f32), axis=1)
        out_ref[0] = jnp.concatenate([fused_xyz, fused_extra], axis=-1)
    else:
        out_ref[0] = fused_xyz


@functools.partial(jax.jit, static_argnums=(4, 5))
def fusion_attention_tail(
    combined, resi, extra, layers_flat, n_layers, interpret=False
):
    """Fused attention head: score MLP + channel max + softmax over k +
    weighted residual (and optional feature) reduction.

    Args:
      combined: ``[B, N, 3]`` fp32 combined cloud.
      resi: ``[B, N, k, 3]`` fp32 neighbor residuals
        (``neighbor - combined``).
      extra: ``[B, N, k, Ce]`` per-neighbor payload to reduce with the
        same weights (PointsFusionWithFeatures' intensity rows), or
        None.
      layers_flat: flat ``(WT, b, ...)`` folded-BN tuple
        (setconv_tpu.fold_bn_layers) for the score MLP; first layer
        must take 4 input channels ``[resi | dist]``.
      n_layers: static layer count.

    Returns:
      ``[B, N, 3 + Ce]`` fp32 fused rows.
    """
    B, N, k, _ = resi.shape
    ce = extra.shape[-1] if extra is not None else 0
    n_pad = (-N) % TQN
    if n_pad:
        combined = jnp.pad(combined, ((0, 0), (0, n_pad), (0, 0)))
        resi = jnp.pad(resi, ((0, 0), (0, n_pad), (0, 0), (0, 0)))
        if extra is not None:
            extra = jnp.pad(extra, ((0, 0), (0, n_pad), (0, 0), (0, 0)))
    Np = N + n_pad

    wts = [w.astype(jnp.float32) for w in layers_flat[0::2]]
    bs = [b.reshape(1, -1).astype(jnp.float32) for b in layers_flat[1::2]]
    # WT [Cout, Cin] -> W [Cin, Cout]; split layer 0 over [resi | dist]
    w0 = jnp.transpose(wts[0])
    params = [w0[:3], w0[3:4], bs[0]]
    for wt, b in zip(wts[1:], bs[1:]):
        params.extend([jnp.transpose(wt), b])

    ins = [combined, resi]
    in_specs = [
        pl.BlockSpec((1, TQN, 3), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, TQN, k, 3), lambda b, i: (b, i, 0, 0)),
    ]
    if ce:
        ins.append(extra)
        in_specs.append(
            pl.BlockSpec((1, TQN, k, ce), lambda b, i: (b, i, 0, 0))
        )
    for p in params:
        ins.append(p)
        in_specs.append(pl.BlockSpec(p.shape, lambda b, i: (0, 0)))

    out = pl.pallas_call(
        functools.partial(_tail_kernel, k=k, ce=ce, n_layers=n_layers),
        grid=(B, Np // TQN),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, TQN, 3 + ce), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Np, 3 + ce), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*ins)
    return out[:, :N]
