"""Fused SetConv tail: ball query + neighbor gather + MLP + max-pool in
ONE Pallas pass (TPU, eval path).

FlowNet3D's set-conv stage (reference Utils/Layers.py:69-92 = Sample +
Group + three Conv/BN/ReLU layers + neighborhood max) runs in XLA as a
chain of ~10 sub-ms HBM-bound ops: the streamed ball kernel, two row
gathers, three matmuls with BatchNorm/ReLU boundaries, and the K-axis
max — every boundary a ``[B, S, K, C]`` HBM round-trip.  The FLOPs are
trivial; the traffic and launch latency are the cost (CLAUDE.md r2:
"FlowNet3D internals are all sub-1ms ... no single fusion target left" —
so fuse the whole stage instead).

This kernel extends the streamed ball query (ball_tpu.py): keys stay
VMEM-resident as a ``[3, N]`` strip for the distance tiles PLUS a
``[C, N]`` row strip of ``[xyz | feats]``; the same while-loop walks
256-key tiles in index order resolving each hit's output slot by
counts + triangular-matmul prefix, but instead of emitting indices it
accumulates the hit's ROW into a ``[K * C, TQ]`` VMEM scratch via one
``[C, TK] @ [TK, TQ]`` one-hot matmul per slot.  After the walk it
applies the reference's pad-with-first / empty-query-row-0 semantics to
the accumulated rows, forms ``[dxyz | feats]`` (or ``[feats | dxyz]``
for the MSG orientation), and runs the whole MLP stack per slot in
transposed form (``W.T @ x`` — everything stays ``[C, TQ]``-shaped, no
minor-axis transposes), max-reducing across slots on the fly.  Only the
pooled ``[Cout, TQ]`` result leaves VMEM.

BatchNorm folds into the weights at eval (running stats are affine:
``W' = W * s``, ``b' = b * s + (beta - mean * s)`` with
``s = gamma / sqrt(var + eps)``) — see :func:`fold_bn_layers`.
Training (which needs batch statistics + gradients) and CPU keep the
XLA expression; this kernel defines no VJP.

Exactness: matches the XLA eval path's semantics (same first-K-by-index
selection, same pad rules); arithmetic is fp32 throughout, which is
slightly MORE precise than the bf16-policy XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TQ = 128  # query rows per grid step
TK = 256  # key rows per streamed tile


def _setconv_kernel(q_ref, p_ref, rows_ref, *refs,
                    r2, K, C, n_tiles, dxyz_first, early_exit,
                    n_layers):
    """Grid: (B, S // TQ).

    q_ref [1, 3, TQ] query strip; p_ref [1, 3, N] resident key xyz;
    rows_ref [1, C, N] resident [xyz | feats] rows; per MLP layer a
    WT [C_out, C_in] + b [C_out, 1] pair; out [1, C_last, TQ];
    acc_ref [K * C, TQ] f32 VMEM scratch.
    """
    w_refs = refs[: 2 * n_layers]
    out_ref = refs[2 * n_layers]
    acc_ref = refs[2 * n_layers + 1]
    f32 = jnp.float32

    qx = q_ref[0, 0, :][None, :]  # [1, TQ]
    qy = q_ref[0, 1, :][None, :]
    qz = q_ref[0, 2, :][None, :]

    # tri[i, j] = (i >= j): incl = tri @ mask gives the inclusive
    # in-radius prefix count along the key tile (0/1 inputs are exact on
    # the MXU with fp32 accumulation)
    tri = (
        lax.broadcasted_iota(jnp.int32, (TK, TK), 0)
        >= lax.broadcasted_iota(jnp.int32, (TK, TK), 1)
    ).astype(f32)

    acc_ref[...] = jnp.zeros((K * C, TQ), f32)

    def body(state):
        t, counts = state
        p = p_ref[0, :, pl.ds(t * TK, TK)]  # [3, TK]
        pt = jnp.transpose(p)  # [TK, 3]
        d = (
            (pt[:, 0][:, None] - qx) ** 2
            + (pt[:, 1][:, None] - qy) ** 2
            + (pt[:, 2][:, None] - qz) ** 2
        )  # [TK, TQ]
        mask = (d <= r2).astype(f32)
        incl = lax.dot_general(
            tri, mask, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        slot = counts + incl - 1.0  # [TK, TQ], valid where mask
        rows = rows_ref[0, :, pl.ds(t * TK, TK)]  # [C, TK]
        for k in range(K):
            eq_k = jnp.where(
                (slot == f32(k)) & (mask > 0.0), 1.0, 0.0
            )  # [TK, TQ]
            upd = lax.dot_general(
                rows, eq_k, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )  # [C, TQ]
            acc_ref[pl.ds(k * C, C), :] += upd
        return t + 1, counts + jnp.sum(mask, axis=0, keepdims=True)

    counts0 = jnp.zeros((1, TQ), f32)
    if early_exit:
        def cond(state):
            t, counts = state
            return (t < n_tiles) & (jnp.min(counts) < f32(K))

        _, counts = lax.while_loop(cond, body, (jnp.int32(0), counts0))
    else:
        def fbody(t, counts):
            return body((t, counts))[1]

        counts = lax.fori_loop(0, n_tiles, fbody, counts0)

    # reference pad semantics on the accumulated rows: slot k is real
    # iff counts > k; unfilled slots repeat slot 0; all-empty queries
    # take global row 0 (ops/ball.py contract)
    row0 = rows_ref[0, :, 0][:, None]  # [C, 1]
    slot0 = acc_ref[pl.ds(0, C), :]
    slot0 = jnp.where(counts > 0.0, slot0, row0)

    q3 = jnp.concatenate([qx, qy, qz], axis=0)  # [3, TQ]

    def mlp_max(h, best):
        # h [Cin, TQ] -> transposed MLP chain -> elementwise max
        for i in range(n_layers):
            wt = w_refs[2 * i][...]
            b = w_refs[2 * i + 1][...]
            h = lax.dot_general(
                wt, h, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            ) + b
            h = jnp.maximum(h, 0.0)
        return h if best is None else jnp.maximum(best, h)

    best = None
    for k in range(K):
        rows_k = acc_ref[pl.ds(k * C, C), :] if k else slot0
        if k:
            rows_k = jnp.where(counts > f32(k), rows_k, slot0)
        dxyz = rows_k[:3] - q3
        if C > 3:
            feats = rows_k[3:]
            h = (jnp.concatenate([dxyz, feats], axis=0) if dxyz_first
                 else jnp.concatenate([feats, dxyz], axis=0))
        else:
            h = dxyz
        best = mlp_max(h, best)

    out_ref[0] = best


@functools.partial(
    jax.jit, static_argnums=(3, 4, 6, 7, 8)
)
def setconv_fused(
    xyz, feats, new_xyz, radius, nsample, layers_flat, n_layers,
    dxyz_first=True, interpret=False,
):
    """Fused ball-group + folded-BN MLP + max-pool.

    Args:
      xyz: ``[B, N, 3]`` keys.
      feats: ``[B, N, D]`` per-key features (D may be 0).
      new_xyz: ``[B, S, 3]`` query centers.
      radius: static python float.
      nsample: static neighbor budget K.
      layers_flat: flat tuple ``(WT_0, b_0, WT_1, b_1, ...)`` with
        ``WT_i [C_out, C_in]`` fp32 (BN folded — :func:`fold_bn_layers`)
        and ``b_i [C_out]``.
      n_layers: static layer count.
      dxyz_first: channel order of the MLP input — True for FlowNet3D's
        ``[dxyz, feats]`` (Utils/Layers.py:84), False for the MSG
        orientation ``[feats, dxyz]`` (Pointnet2Utils.py:135).

    Returns:
      ``[B, S, C_last]`` fp32 max-pooled features.
    """
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    D = feats.shape[-1] if feats is not None else 0
    C = 3 + D
    rows = xyz if D == 0 else jnp.concatenate(
        [xyz, feats.astype(jnp.float32)], axis=-1
    )
    # pad keys to the tile grain with far-away rows (never in radius);
    # pad queries by repeating row 0 (fills normally -> early exit is
    # not held open by discarded rows)
    n_pad = (-N) % TK
    if n_pad:
        xyz = jnp.pad(xyz, ((0, 0), (0, n_pad), (0, 0)),
                      constant_values=1e15)
        rows = jnp.pad(rows, ((0, 0), (0, n_pad), (0, 0)),
                       constant_values=1e15)
    s_pad = (-S) % TQ
    if s_pad:
        new_xyz = jnp.concatenate(
            [new_xyz,
             jnp.broadcast_to(new_xyz[:, :1], (B, s_pad, 3))], axis=1
        )
    Np, Sp = N + n_pad, S + s_pad

    q_t = jnp.swapaxes(new_xyz, 1, 2)  # [B, 3, Sp]
    p_t = jnp.swapaxes(xyz, 1, 2)  # [B, 3, Np]
    rows_t = jnp.swapaxes(rows, 1, 2)  # [B, C, Np]

    ws = [w.astype(jnp.float32) for w in layers_flat[0::2]]
    bs = [b.reshape(-1, 1).astype(jnp.float32) for b in layers_flat[1::2]]
    c_out = ws[-1].shape[0]

    in_specs = [
        pl.BlockSpec((1, 3, TQ), lambda b, i: (b, 0, i)),
        pl.BlockSpec((1, 3, Np), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((1, C, Np), lambda b, i: (b, 0, 0)),
    ]
    wb = []
    for wt, b in zip(ws, bs):
        in_specs.append(pl.BlockSpec(wt.shape, lambda b, i: (0, 0)))
        in_specs.append(pl.BlockSpec(b.shape, lambda b, i: (0, 0)))
        wb.extend([wt, b])

    out = pl.pallas_call(
        functools.partial(
            _setconv_kernel,
            r2=float(radius) ** 2, K=nsample, C=C,
            n_tiles=Np // TK, dxyz_first=dxyz_first,
            early_exit=True, n_layers=n_layers,
        ),
        grid=(B, Sp // TQ),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, c_out, TQ), lambda b, i: (b, 0, i)),
        out_shape=jax.ShapeDtypeStruct((B, c_out, Sp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((nsample * C, TQ), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(q_t, p_t, rows_t, *wb)
    return jnp.swapaxes(out[:, :, :S], 1, 2)


def fold_bn_layers(mlp_params, bn_params, bn_stats, eps=1e-3):
    """Fold eval-mode BatchNorm into Dense weights.

    Args:
      mlp_params: list of flax Dense param dicts (``kernel [Cin,Cout]``,
        ``bias [Cout]``).
      bn_params: list of BatchNorm param dicts (``scale``, ``bias``).
      bn_stats: list of batch_stats dicts (``mean``, ``var``).

    Returns:
      flat tuple ``(WT_0, b_0, WT_1, b_1, ...)`` for
      :func:`setconv_fused`.
    """
    flat = []
    for d, p, s in zip(mlp_params, bn_params, bn_stats):
        scale = p["scale"] / jnp.sqrt(s["var"] + eps)
        wt = (d["kernel"] * scale[None, :]).T
        b = d["bias"] * scale + (p["bias"] - s["mean"] * scale)
        flat.extend([wt, b])
    return tuple(flat)
