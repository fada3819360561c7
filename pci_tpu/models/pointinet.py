"""PointINet (AAAI 2021): bidirectional scene flow -> linear warp ->
adaptive attentive fusion.

Mirrors /root/reference/PointINet20230424/models/models.py:79-124 (the
canonical version that also carries an intensity channel).  Layout is
channels-last; points may be ``[B, N, 3]`` (xyz only) or ``[B, N, 3+C]``
(xyz + intensity), matching the reference's 4-channel KITTI mode.

Freeze semantics: ``freeze_flow=True`` stop-gradients the flow outputs
(the reference wraps the flow calls in ``torch.no_grad()``) and runs the
flow's BatchNorm in running-average mode.  The optimizer-side parameter
freeze lives in ``pci_tpu.train`` (optax mask), mirroring
``requires_grad=False``.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from ..nn.fusion import PointsFusion, PointsFusionWithFeatures
from .flownet3d import FlowNet3D


class PointINet(nn.Module):
    freeze_flow: bool = True
    fusion_k: int = 32
    fusion_sampling: str = "random"

    @nn.compact
    def __call__(self, points1, points2, feats1, feats2, t, *, train: bool = False, momentum=0.1):
        """points1/2 ``[B,N,3(+C)]``, feats1/2 ``[B,N,3]`` (zeros for
        LiDAR), t ``[B]`` in (0,1) -> fused cloud ``[B,N,3(+C)]``."""
        has_extra = points1.shape[-1] > 3
        xyz1, extra1 = points1[..., :3], points1[..., 3:]
        xyz2, extra2 = points2[..., :3], points2[..., 3:]

        flow = FlowNet3D(name="flow")
        flow_train = train and not self.freeze_flow
        # Two sequential flow calls, like the reference (models.py:104-108).
        # Batching them into one 2B pass was measured SLOWER on v5e
        # (35 vs 42+ fps at 16k): the batched kNN/ball-query kernels hit
        # VMEM limits at 2x width and pipeline worse than two narrow calls.
        # With the flow frozen (the production/eval setting) the Siamese
        # encoder is deterministic, so the bidirectional pass shares both
        # clouds' set-conv encodings — one full two-cloud encoder saved.
        if not flow_train:
            flow_forward, flow_backward = flow(
                xyz1, xyz2, feats1, feats2, train=False, momentum=momentum,
                bidirectional=True,
            )
        else:
            flow_forward = flow(xyz1, xyz2, feats1, feats2, train=flow_train, momentum=momentum)
            flow_backward = flow(xyz2, xyz1, feats2, feats1, train=flow_train, momentum=momentum)
        if self.freeze_flow:
            flow_forward = lax.stop_gradient(flow_forward)
            flow_backward = lax.stop_gradient(flow_backward)

        tb = t[:, None, None].astype(jnp.float32)
        warped1 = xyz1 + flow_forward * tb
        warped2 = xyz2 + flow_backward * (1.0 - tb)

        if has_extra:
            fusion = PointsFusionWithFeatures((64, 64, 128), name="fusion")
            return fusion(
                warped1, warped2, extra1, extra2, self.fusion_k, t,
                train=train, momentum=momentum,
            )
        fusion = PointsFusion(
            (64, 64, 128), sampling=self.fusion_sampling, name="fusion"
        )
        return fusion(
            warped1, warped2, self.fusion_k, t, train=train, momentum=momentum
        )
