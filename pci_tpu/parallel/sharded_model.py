"""Point-sharded model blocks: run one layer's N-axis across chips.

The ISAPCInet transformer concatenates the whole window into a single
2f*N-point cloud (/root/reference/Models/New_Models0.py:175-183), so at
the paper's 65,536-pt protocol the self-attention input is 128k+ points
— past what one chip's distance tiles want to hold.  This module runs
:class:`pci_tpu.nn.TransformerLayer` (eval path) with the point axis
sharded over a mesh axis:

* the O(N^2) self-kNN rides the ICI ring (:func:`parallel.ring.knn_sharded`
  — running top-k merge, key blocks circulated with ``ppermute``);
* pointwise projections stay local to each shard (matmuls over the
  channel axis are row-independent);
* the neighbor gather all-gathers only the [N, 2d] K/V table (linear in
  N — 33 MB at 128k x d64 bf16) rather than any N^2 object, then the
  [N_local, k, d] attention tail runs entirely on-shard.

Numerics match the single-device XLA path bitwise-close (same distance
expression per block, same top-k merge order); tests assert it on a
virtual CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from .ring import knn_sharded


def _dense(p, x, bias=True):
    y = x @ p["kernel"]
    return y + p["bias"] if bias else y


def transformer_layer_sharded(
    params,
    xyz: jax.Array,
    feats: jax.Array,
    *,
    d_model: int,
    k: int,
    mesh: Mesh,
    axis: str = "points",
):
    """Eval-mode ``TransformerLayer`` forward with the N axis sharded.

    ``params`` is the layer's flax param subtree (``fc1 / w_qs / w_ks /
    w_vs / fc_delta_* / fc_gamma_* / fc2``); ``xyz [B,N,3]`` and
    ``feats [B,N,C]`` are sharded ``P(None, axis)`` over ``mesh``.
    Returns ``out [B,N,C]`` with the same sharding (attention maps are
    not materialized, matching the fused TPU eval path).
    """
    # Pointwise projections: row-independent matmuls, no communication —
    # GSPMD keeps them on-shard under the inputs' sharding.
    x = _dense(params["fc1"], feats)
    q = _dense(params["w_qs"], x, bias=False)
    k_feat = _dense(params["w_ks"], x, bias=False)
    v_feat = _dense(params["w_vs"], x, bias=False)
    kv = jnp.concatenate([k_feat, v_feat], axis=-1)

    # Global self-kNN over the sharded key axis (ring top-k merge).
    _, idx = knn_sharded(xyz, xyz, k, mesh, axis)

    # batch rides the data axis when it divides (avoids an SPMD reshard
    # of every model-side input; non-divisible batches replicate)
    spec = P(None, axis)
    if "data" in mesh.axis_names and xyz.shape[0] % mesh.shape["data"] == 0:
        spec = P("data", axis)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec),
        out_specs=spec,
    )
    def _tail(q_l, kv_l, xyz_l, idx_l, pre_l):
        # one linear-size all-gather: the K/V table + coordinates
        kv_full = lax.all_gather(kv_l, axis, axis=1, tiled=True)
        xyz_full = lax.all_gather(xyz_l, axis, axis=1, tiled=True)
        g = jax.vmap(lambda t, i: t[i])(kv_full, idx_l)      # [B,S,k,2d]
        nbr_xyz = jax.vmap(lambda t, i: t[i])(xyz_full, idx_l)
        delta = xyz_l[:, :, None, :] - nbr_xyz               # [B,S,k,3]

        kf = g[..., :d_model]
        vf = g[..., d_model:]
        pos = _dense(params["fc_delta_0"], delta)
        pos = jax.nn.relu(pos)
        pos = _dense(params["fc_delta_1"], pos)

        attn = q_l[:, :, None, :] - kf + pos
        attn = _dense(params["fc_gamma_0"], attn)
        attn = jax.nn.relu(attn)
        attn = _dense(params["fc_gamma_1"], attn)
        attn = jax.nn.softmax(attn / jnp.sqrt(jnp.float32(d_model)), axis=-2)

        res = jnp.sum(attn * (vf + pos), axis=2)             # [B,S,d_model]
        return _dense(params["fc2"], res) + pre_l

    return _tail(q, kv, xyz, idx, feats)
