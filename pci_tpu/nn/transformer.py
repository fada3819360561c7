"""Point-transformer self-attention layer.

Mirrors /root/reference/Utils/Layers.py:405-443: kNN(k) neighborhoods,
vector attention ``softmax(gamma(q - k + delta))) * (v + delta)`` with a
positional MLP ``delta = fc_delta(dxyz)``, residual connection in the
input feature space.  Returns (features, attention) like the reference
(the attention maps feed the interpretability heatmaps).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .. import ops
from . import policy
from .layers import gather_split
from .mlp import dense


class TransformerLayer(nn.Module):
    d_model: int
    k: int

    def _materialize_tail_params(self, dtype):
        """Create fc_delta_* / fc_gamma_* with dummy calls so fused
        routes keep the checkpoint tree identical to the XLA expression
        (single definition — three routing branches depend on it)."""
        dm = self.d_model
        z3 = jnp.zeros((1, 3), dtype)
        zd = jnp.zeros((1, dm), dtype)
        _ = dense(dm, name="fc_delta_0")(z3)
        _ = dense(dm, name="fc_delta_1")(zd)
        _ = dense(dm, name="fc_gamma_0")(zd)
        _ = dense(dm, name="fc_gamma_1")(zd)
        p = self.variables["params"]
        return (
            p["fc_delta_0"]["kernel"], p["fc_delta_0"]["bias"],
            p["fc_delta_1"]["kernel"], p["fc_delta_1"]["bias"],
            p["fc_gamma_0"]["kernel"], p["fc_gamma_0"]["bias"],
            p["fc_gamma_1"]["kernel"], p["fc_gamma_1"]["bias"],
        )

    @nn.compact
    def __call__(self, xyz, feats, *, train: bool = False, mesh=None):
        """xyz ``[B,N,3]``, feats ``[B,N,d_points]`` ->
        (``[B,N,d_points]``, attn ``[B,N,k,d_model]``).

        On TPU at eval the attention tail runs as ONE fused Pallas
        kernel (ops/pallas_kernels/attention_tpu.py) and ``attn`` is
        returned as ``None`` — materializing the [B,N,k,d] maps is the
        cost the kernel exists to remove.  ``train=True`` (or CPU) keeps
        the XLA expression, which defines the gradients.

        ``mesh``: a mesh with a >1 ``points`` axis runs the WHOLE layer
        point-sharded (parallel/sharded_model.py: ring self-kNN +
        linear-size K/V all-gather) — the 2f*N concatenated flow cloud
        (128k+ at the 64k protocol) across chips.  Eval-only; ``attn``
        is ``None`` on this path too.
        """
        import os

        d_points = feats.shape[-1]
        if (
            mesh is not None
            and not train
            and "points" in mesh.axis_names
            and mesh.shape["points"] > 1
        ):
            from ..parallel.sharded_model import transformer_layer_sharded

            # materialize the full param tree with dummy calls so the
            # checkpoint layout matches the unsharded path exactly
            dm = self.d_model
            zdp = jnp.zeros((1, d_points), jnp.float32)
            zd = jnp.zeros((1, dm), jnp.float32)
            _ = dense(dm, name="fc1")(zdp)
            _ = dense(dm, use_bias=False, name="w_qs")(zd)
            _ = dense(dm, use_bias=False, name="w_ks")(zd)
            _ = dense(dm, use_bias=False, name="w_vs")(zd)
            self._materialize_tail_params(jnp.float32)
            _ = dense(d_points, name="fc2")(zd)
            out = transformer_layer_sharded(
                self.variables["params"], xyz, feats,
                d_model=dm, k=self.k, mesh=mesh,
            )
            return out, None
        # In-kernel residual emission costs ~4.7 ms @64k while gathering
        # the 3ch fp32 xyz rows FUSED with the K/V gather is ~0.2 ms
        # marginal (CLAUDE.md r3 numbers; the cells+gather combination
        # was never A/B'd) — default is the plain gather path below
        # (ops.knn routes the SELECTION to the cell-pruned kernel at
        # N>=32k anyway); PCI_TPU_TR_RESI=kernel keeps emission for A/B.
        use_cells = (
            ops.cells_eligible(xyz, self.k)
            and os.environ.get("PCI_TPU_TR_RESI") == "kernel"
        )
        use_fused = (
            jax.default_backend() == "tpu"
            and not train
            and self.d_model % 8 == 0
            # eval tail has no VJP: fall back to the XLA expression when
            # a tangent could flow (the trainable fused kernel below
            # covers train=True; frozen callers stop-grad their params)
            and not ops.has_tangents(
                xyz, feats, self.variables.get("params", {})
            )
        )

        pre = feats
        x = dense(self.d_model, name="fc1")(feats)
        q = dense(self.d_model, use_bias=False, name="w_qs")(x)
        k_proj = dense(self.d_model, use_bias=False, name="w_ks")(x)
        v_proj = dense(self.d_model, use_bias=False, name="w_vs")(x)
        kv = jnp.concatenate([k_proj, v_proj], axis=-1)
        if use_cells:
            # large-N path: the cell-pruned kernel emits the neighbor
            # offsets in-kernel (no [B,N,k,3] xyz gather, and the kNN
            # itself prunes the O(N^2) distance tiles IVF-style)
            knn_idx, resi = ops.knn_self_resi(xyz, self.k)
            g = ops.knn_gather(kv, knn_idx)
            delta = -resi  # query - neighbor, exact fp32
        else:
            _, knn_idx = ops.knn(xyz, xyz, self.k)
            # fused [xyz | K | V] row gather under fp32; split by dtype
            # under bf16 (see nn.layers.gather_split)
            knn_xyz, g = gather_split(xyz, kv, knn_idx)
            delta = xyz[:, :, None, :] - knn_xyz  # [B,N,k,3]
        if use_fused:
            # one Pallas kernel for the whole [B,N,k,d] tail: pos MLP,
            # gamma MLP, fp32 softmax over k, weighted V+pos reduction.
            # Params are materialized by dummy Dense calls so the tree
            # stays checkpoint-identical to the XLA expression below.
            from ..ops.pallas_kernels.attention_tpu import (
                fused_vector_attention,
            )

            tail = self._materialize_tail_params(q.dtype)
            res = fused_vector_attention(q, g, delta, *tail)
            out = policy.f32(dense(d_points, name="fc2")(res)) + policy.f32(pre)
            return out, None

        use_fused_train = (
            jax.default_backend() == "tpu"
            and train
            and self.d_model % 8 == 0
            and os.environ.get("PCI_TPU_FUSED_ATTN_TRAIN", "1") == "1"
        )
        if use_fused_train:
            # TRAIN tail as one fused fwd + flash-style recompute bwd
            # (attention_tpu.vector_attention_trainable): no [B,N,k,d]
            # intermediate reaches HBM in either direction.  Gradients
            # match the XLA expression to ~1e-7 rel (interpreter-checked)
            # — attn maps are not materialized, so None like eval.
            from ..ops.pallas_kernels.attention_tpu import (
                vector_attention_trainable,
            )

            tail = self._materialize_tail_params(q.dtype)
            res = vector_attention_trainable(q, g, delta, *tail)
            out = policy.f32(dense(d_points, name="fc2")(res)) + policy.f32(pre)
            return out, None

        k_feat = g[..., : self.d_model].astype(policy.compute_dtype())
        v_feat = g[..., self.d_model :].astype(policy.compute_dtype())

        # positional encoding of neighbor offsets
        pos = dense(self.d_model, name="fc_delta_0")(delta)
        pos = nn.relu(pos)
        pos = dense(self.d_model, name="fc_delta_1")(pos)

        attn = q[:, :, None, :] - k_feat + pos
        attn = dense(self.d_model, name="fc_gamma_0")(attn)
        attn = nn.relu(attn)
        attn = dense(self.d_model, name="fc_gamma_1")(attn)
        # softmax + weighted reduction in fp32 even under a bf16 policy
        # (the body's [N,k,d] traffic is the cost; the reduction is not)
        attn = nn.softmax(policy.f32(attn) / jnp.sqrt(self.d_model), axis=-2)

        res = jnp.sum(attn * policy.f32(v_feat + pos), axis=2)  # [B,N,d_model]
        out = policy.f32(dense(d_points, name="fc2")(res)) + policy.f32(pre)
        return out, attn
