"""ISAPCInet — interval-sensitive adaptive point-cloud interpolation
(the reference author's primary model) and PointINet2.

Behavioral spec from /root/reference/Models/New_Models0.py:90-195 (ISAPCInet),
Models/New_Models_field_0.py:88-148 (field-0 variant),
Models/New_Models0_noT_96.py:91-172 (no-Tnet variant),
Models/Models.py:130-188 (PointINet2).

Flow fan-out: the 4*field FlowNet3D calls run SEQUENTIALLY with shared
parameters (a python loop over jit-traced calls).  A batched variant
(stacking all pairs into the batch axis) was built and measured SLOWER on
v5e (plus ~8x compile time) because FlowNet3D at 16k points is
gather/top-k bound, not MXU bound — wider batches don't amortize anything
and blow up VMEM working sets (commits 9b438a2 / 6a724d7).  The pairs
remain embarrassingly parallel across the mesh's data axis if sharded
upstream.

Two deliberate deviations from reference quirks (no pretrained weights
exist, so weight-layout compatibility is moot):
  * New_Models0.py:164 reshapes the stacked flows with a raw ``.view`` that
    interleaves xyz channels across flow chunks before feeding
    Pointnet2FeatureAbstract; we use the semantically-intended chunk
    concatenation (same one the reference itself uses for the transformer
    input at :175-178).
  * New_Models0.py:185 ``.view``s transformer output channels the same way;
    we reshape chunk-major ([B, N, 2*field*C]).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from ..nn.fusion import PointsFusion, PointsFusionMulti
from ..nn.heads import Outputer, Tnet, Wnet
from ..nn.pointnet2 import Pointnet2FeatureAbstract
from ..nn.transformer import TransformerLayer
from .flownet3d import FlowNet3D
from .pointinet import PointINet


def _flow_pair_plan(field: int):
    """The reference's flow fan-out order (New_Models0.py:130-149).

    Returns (forward_pairs, backward_pairs): lists of
    ``(src_kind, src_idx, dst_kind, dst_idx, scale)`` where kind is one of
    'f' (forward_pcds), 'b' (backward_pcds), 'k' (key_pcds).
    """
    fwd, bwd = [], []
    for i in reversed(range(1, field + 1)):
        fwd.append(("f", i - 1, "k", 0, 1.0 / i))
        bwd.append(("b", i - 1, "k", 1, 1.0 / i))
    fwd.append(("k", 0, "k", 1, 1.0))
    bwd.append(("k", 1, "k", 0, 1.0))
    for i in range(1, field):
        fwd.append(("k", 0, "b", i - 1, 1.0 / (i + 1)))
        bwd.append(("k", 1, "f", i - 1, 1.0 / (i + 1)))
    return fwd, bwd


class ISAPCInet(nn.Module):
    """Multi-frame interpolation: 4*field flow candidates, Tnet time
    weighting, PointNet++ flow-feature abstraction, point-transformer
    refinement, flow regression, warp, adaptive fusion."""

    field: int
    ff_out_c: int = 64
    tr_out_c: int = 64
    use_tnet: bool = True  # False mirrors the noT_96 variant
    freeze_flow: bool = True
    fusion_k: int = 32
    fusion_sampling: str = "random"

    @nn.compact
    def __call__(
        self, forward_pcds, key_pcds, backward_pcds, t, ini_feature,
        *, train: bool = False, momentum=0.1, mesh=None,
    ):
        """forward_pcds: ``field * [B,N,3]`` frames before the key pair,
        key_pcds: ``2 * [B,N,3]``, backward_pcds: ``field * [B,N,3]``,
        t ``[B]`` in (0,1), ini_feature ``[B,N,3]`` zeros ->
        interpolated cloud ``[B,N,3]``."""
        B, N, _ = ini_feature.shape
        kw = dict(train=train, momentum=momentum)
        flow_train = train and not self.freeze_flow
        flow = FlowNet3D(name="flow")
        t32 = t.astype(jnp.float32)

        def clouds(kind, idx):
            return {"f": forward_pcds, "b": backward_pcds, "k": key_pcds}[kind][idx]

        if self.field == 0:
            # field-0 variant (New_Models_field_0.py): key-pair flows only
            if not flow_train:  # shared Siamese encodings (FlowNet3D doc)
                flow_fwd, flow_bwd = flow(
                    key_pcds[0], key_pcds[1], ini_feature, ini_feature,
                    train=False, momentum=momentum, bidirectional=True,
                )
            else:
                flow_fwd = flow(key_pcds[0], key_pcds[1], ini_feature, ini_feature,
                                train=flow_train, momentum=momentum)
                flow_bwd = flow(key_pcds[1], key_pcds[0], ini_feature, ini_feature,
                                train=flow_train, momentum=momentum)
            if self.freeze_flow:
                flow_fwd = lax.stop_gradient(flow_fwd)
                flow_bwd = lax.stop_gradient(flow_bwd)
            ffab = Pointnet2FeatureAbstract(self.ff_out_c, name="ffab")
            tr_f = TransformerLayer(self.tr_out_c, 16, name="flow_tr_forward")
            tr_b = TransformerLayer(self.tr_out_c, 16, name="flow_tr_backward")
            outputer = Outputer(name="outputer")
            ff = ffab(flow_fwd, **kw)
            bf = ffab(flow_bwd, **kw)
            rf, _ = tr_f(flow_fwd, ff, train=train, mesh=mesh)
            rb, _ = tr_b(flow_bwd, bf, train=train, mesh=mesh)
            net_fwd = outputer(rf)
            net_bwd = outputer(rb)
        else:
            fwd_plan, bwd_plan = _flow_pair_plan(self.field)
            plan = fwd_plan + bwd_plan  # 4*field pairs
            # Sequential parameter-shared calls beat one 4*field-wide
            # batched pass on v5e (measured 51 vs 75 ms for 8 pairs @16k:
            # the wide batch blows past VMEM pipelining in the gather/
            # top-k kernels, and compile is 8x slower).  Sequential also
            # matches the reference's per-call BN statistics.
            if not flow_train:
                # one encoder invocation per DISTINCT cloud: field=2 runs
                # 8 pairs over 6 distinct frames = 16 -> 6 encodings
                # (FlowNet3D.multi; eval-deterministic encoder)
                uniq: list = []
                for p in plan:
                    for kid in ((p[0], p[1]), (p[2], p[3])):
                        if kid not in uniq:
                            uniq.append(kid)
                pairs = [
                    (uniq.index((p[0], p[1])), uniq.index((p[2], p[3])))
                    for p in plan
                ]
                fl = flow.multi(
                    [clouds(k, i) for k, i in uniq],
                    [ini_feature] * len(uniq), pairs,
                    train=False, momentum=momentum,
                )
                flow_list = []
                for f, p in zip(fl, plan):
                    if self.freeze_flow:
                        f = lax.stop_gradient(f)
                    flow_list.append(f * p[4])
            else:
                flow_list = []
                for p in plan:
                    f = flow(
                        clouds(p[0], p[1]), clouds(p[2], p[3]),
                        ini_feature, ini_feature,
                        train=flow_train, momentum=momentum,
                    )
                    if self.freeze_flow:
                        f = lax.stop_gradient(f)
                    flow_list.append(f * p[4])
            flows = jnp.stack(flow_list)  # [4f, B, N, 3]
            n2f = 2 * self.field
            flows_fwd = jnp.moveaxis(flows[:n2f], 0, 1)  # [B, 2f, N, 3]
            flows_bwd = jnp.moveaxis(flows[n2f:], 0, 1)

            if self.use_tnet:
                w_fwd = Tnet(self.field, name="tnet_forward")(t32[:, None])
                w_bwd = Tnet(self.field, name="tnet_backward")(t32[:, None])
                weighted_fwd = flows_fwd * w_fwd[:, :, None, None]
                weighted_bwd = flows_bwd * w_bwd[:, :, None, None]
            else:
                weighted_fwd, weighted_bwd = flows_fwd, flows_bwd

            # flows as a 2f*N-point cloud (chunk concat along the point axis)
            wf_cloud = weighted_fwd.reshape(B, n2f * N, 3)
            wb_cloud = weighted_bwd.reshape(B, n2f * N, 3)
            f_cloud = flows_fwd.reshape(B, n2f * N, 3)
            b_cloud = flows_bwd.reshape(B, n2f * N, 3)

            ffab = Pointnet2FeatureAbstract(self.ff_out_c, name="ffab")
            ff = ffab(wf_cloud, **kw)
            bf = ffab(wb_cloud, **kw)

            tr_f = TransformerLayer(self.tr_out_c, 16, name="flow_tr_forward")
            tr_b = TransformerLayer(self.tr_out_c, 16, name="flow_tr_backward")
            # the 2f*N cloud: point-shard over mesh["points"] when given
            rf, _ = tr_f(f_cloud, ff, train=train, mesh=mesh)  # [B,2fN,C]
            rb, _ = tr_b(b_cloud, bf, train=train, mesh=mesh)

            # chunk-major channel fold: [B, 2f*N, C] -> [B, N, 2f*C]
            rf = rf.reshape(B, n2f, N, self.ff_out_c)
            rf = jnp.moveaxis(rf, 1, 2).reshape(B, N, n2f * self.ff_out_c)
            rb = rb.reshape(B, n2f, N, self.ff_out_c)
            rb = jnp.moveaxis(rb, 1, 2).reshape(B, N, n2f * self.ff_out_c)

            outputer = Outputer(name="outputer")
            net_fwd = outputer(rf)
            net_bwd = outputer(rb)

        tb = t32[:, None, None]
        warped_fwd = key_pcds[0] + net_fwd * tb
        warped_bwd = key_pcds[1] + net_bwd * (1.0 - tb)

        fusion = PointsFusion(
            (64, 64, 128), sampling=self.fusion_sampling, name="fusion"
        )
        return fusion(warped_fwd, warped_bwd, self.fusion_k, t32, **kw)


class PointINet2(nn.Module):
    """Key-pair PointINet + per-ring warped fusions + Wnet-weighted
    multi-cloud fusion (Models/Models.py:130-188).

    The reference keeps its per-ring ``PointsFusion`` modules in a plain
    python list, hiding their parameters from the optimizer
    (Models/Models.py:142-144 — a documented defect); here they are proper
    submodules.
    """

    field: int
    freeze_flow: bool = True
    fusion_k: int = 64  # the reference hard-codes k=64 in forward

    @nn.compact
    def __call__(
        self, forward_pcds, key_pcds, backward_pcds, t, ini_feature,
        *, train: bool = False, momentum=0.1,
    ):
        B, N, _ = ini_feature.shape
        kw = dict(train=train, momentum=momentum)
        t32 = t.astype(jnp.float32)
        weights = Wnet(self.field, name="wnet")(t32[:, None])  # [B, 6*field]

        pointinet = PointINet(
            freeze_flow=self.freeze_flow, fusion_k=32, name="pointinet"
        )
        key_fused = pointinet(
            key_pcds[0], key_pcds[1], ini_feature, ini_feature, t32, **kw
        )

        flow = FlowNet3D(name="flow")
        flow_train = train and not self.freeze_flow
        fused_list = [key_fused]
        if self.field > 0:
            # sequential ring flows (see ISAPCInet: sequential beats one
            # wide batched FlowNet3D pass on v5e)
            tb = t32[:, None, None]
            if not flow_train:
                # shared encodings: 2*field pairs over 2*field+2 distinct
                # clouds (keys re-encoded per pair otherwise) — see
                # FlowNet3D.multi
                cl = (
                    list(forward_pcds) + list(backward_pcds)
                    + [key_pcds[0], key_pcds[1]]
                )
                k0, k1 = 2 * self.field, 2 * self.field + 1
                pairs = []
                for i in range(1, self.field + 1):
                    pairs.append((self.field - i, k0))
                    pairs.append((self.field + i - 1, k1))
                fl = flow.multi(cl, [ini_feature] * len(cl), pairs,
                                train=False, momentum=momentum)
            for i in range(1, self.field + 1):
                if not flow_train:
                    ff = fl[2 * (i - 1)] / i
                    fb = fl[2 * (i - 1) + 1] / i
                else:
                    ff = flow(forward_pcds[self.field - i], key_pcds[0],
                              ini_feature, ini_feature,
                              train=flow_train, momentum=momentum) / i
                    fb = flow(backward_pcds[i - 1], key_pcds[1],
                              ini_feature, ini_feature,
                              train=flow_train, momentum=momentum) / i
                if self.freeze_flow:
                    ff = lax.stop_gradient(ff)
                    fb = lax.stop_gradient(fb)
                warped1 = key_pcds[0] + ff * tb
                warped2 = key_pcds[1] + fb * (1.0 - tb)
                ring_fusion = PointsFusion((64, 64, 128), name=f"fusion_ring{i}")
                fused_list.append(
                    ring_fusion(warped1, warped2, self.fusion_k, t32, **kw)
                )

        fusion2 = PointsFusionMulti((64, 64, 128), name="fusion2")
        return fusion2(fused_list, self.fusion_k, weights, **kw)
