"""FlowNet3D scene-flow backbone (CVPR 2019), TPU-native.

Architecture mirrored from /root/reference/Models/New_Models0.py:20-87
(byte-identical copies at Models/Models.py, PolyPCI/Models/Models_V1.py,
PointINet20230424/models/models.py): a 4-level set-conv encoder with a
cross-cloud flow embedding, 3 up-convs, feature propagation, and a small
regression head.

Both input clouds share the encoder weights (the reference calls
set_conv1/2 on each cloud with the same modules).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..nn.layers import (
    Classifier,
    FeaturePropagation,
    FlowEmbedding,
    SetConv,
    SetUpConv,
)


class FlowNet3D(nn.Module):
    @nn.compact
    def __call__(self, xyz1, xyz2, feats1, feats2, *, train: bool = False, momentum=0.1):
        """Estimate per-point scene flow from cloud1 to cloud2.

        Args:
          xyz1, xyz2: ``[B, N, 3]`` point clouds.
          feats1, feats2: ``[B, N, 3]`` features (colors for FlyThings3D,
            zeros for LiDAR).

        Returns:
          flow ``[B, N, 3]``.
        """
        kw = dict(train=train, momentum=momentum)
        sc1 = SetConv(1024, 0.5, 16, (32, 32, 64), name="set_conv1")
        sc2 = SetConv(256, 1.0, 16, (64, 64, 128), name="set_conv2")
        fe = FlowEmbedding(64, (128, 128, 128), name="flow_embedding")
        sc3 = SetConv(64, 2.0, 8, (128, 128, 256), name="set_conv3")
        sc4 = SetConv(16, 4.0, 8, (256, 256, 512), name="set_conv4")
        up1 = SetUpConv(8, (), (256, 256), name="set_upconv1")
        up2 = SetUpConv(8, (128, 128, 256), (256,), name="set_upconv2")
        up3 = SetUpConv(8, (128, 128, 256), (256,), name="set_upconv3")
        fp = FeaturePropagation((256, 256), name="fp")

        p1_1, f1_1 = sc1(xyz1, feats1, **kw)
        p1_2, f1_2 = sc2(p1_1, f1_1, **kw)
        p2_1, f2_1 = sc1(xyz2, feats2, **kw)
        p2_2, f2_2 = sc2(p2_1, f2_1, **kw)

        emb = fe(p1_2, p2_2, f1_2, f2_2, **kw)

        p1_3, f1_3 = sc3(p1_2, emb, **kw)
        p1_4, f1_4 = sc4(p1_3, f1_3, **kw)

        nf1_3 = up1(p1_4, p1_3, f1_4, f1_3, **kw)
        nf1_2 = up2(p1_3, p1_2, nf1_3, jnp.concatenate([f1_2, emb], axis=-1), **kw)
        nf1_1 = up3(p1_2, p1_1, nf1_2, f1_1, **kw)
        nf1 = fp(p1_1, xyz1, nf1_1, feats1, **kw)

        return Classifier(name="classifier")(nf1, **kw)
