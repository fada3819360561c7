"""Point-transformer self-attention layer.

Mirrors /root/reference/Utils/Layers.py:405-443: kNN(k) neighborhoods,
vector attention ``softmax(gamma(q - k + delta))) * (v + delta)`` with a
positional MLP ``delta = fc_delta(dxyz)``, residual connection in the
input feature space.  Returns (features, attention) like the reference
(the attention maps feed the interpretability heatmaps).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .. import ops
from .mlp import dense


class TransformerLayer(nn.Module):
    d_model: int
    k: int

    @nn.compact
    def __call__(self, xyz, feats):
        """xyz ``[B,N,3]``, feats ``[B,N,d_points]`` ->
        (``[B,N,d_points]``, attn ``[B,N,k,d_model]``)."""
        d_points = feats.shape[-1]
        _, knn_idx, knn_xyz = ops.knn_points(xyz, xyz, self.k)

        pre = feats
        x = dense(self.d_model, name="fc1")(feats)
        q = dense(self.d_model, use_bias=False, name="w_qs")(x)
        k_feat = ops.knn_gather(dense(self.d_model, use_bias=False, name="w_ks")(x), knn_idx)
        v_feat = ops.knn_gather(dense(self.d_model, use_bias=False, name="w_vs")(x), knn_idx)

        # positional encoding of neighbor offsets
        delta = xyz[:, :, None, :] - knn_xyz  # [B,N,k,3]
        pos = dense(self.d_model, name="fc_delta_0")(delta)
        pos = nn.relu(pos)
        pos = dense(self.d_model, name="fc_delta_1")(pos)

        attn = q[:, :, None, :] - k_feat + pos
        attn = dense(self.d_model, name="fc_gamma_0")(attn)
        attn = nn.relu(attn)
        attn = dense(self.d_model, name="fc_gamma_1")(attn)
        attn = nn.softmax(attn / jnp.sqrt(self.d_model), axis=-2)  # over k

        res = jnp.sum(attn * (v_feat + pos), axis=2)  # [B,N,d_model]
        out = dense(d_points, name="fc2")(res) + pre
        return out, attn
