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

import os

import flax.linen as nn
import jax
import jax.numpy as jnp

from .. import ops
from ..nn.layers import (
    Classifier,
    FeaturePropagation,
    FlowEmbedding,
    SetConv,
    SetUpConv,
    fold_pointmlp_vars,
)


def _enc_ok(train: bool) -> bool:
    """Route the Siamese encoder (set_conv1 + set_conv2) to the fused
    two-stage megakernel (ops/pallas_kernels/flowenc_tpu.py): TPU, eval
    only.  Module-level for tests / A-B flips."""
    return (
        jax.default_backend() == "tpu"
        and not train
        and os.environ.get("PCI_TPU_ENC_KERNEL", "1") == "1"
    )


def _mid_ok(train: bool) -> bool:
    """Route the decode mid-section (flow_embedding .. set_upconv3) plus
    the fp+classifier tail to the fused kernels
    (ops/pallas_kernels/flowmid_tpu.py + knnconv n_final): TPU, eval
    only.  Module-level so tests can monkeypatch it on (the kernel runs
    in interpreter mode off-TPU)."""
    return (
        jax.default_backend() == "tpu"
        and not train
        and os.environ.get("PCI_TPU_MID_KERNEL", "1") == "1"
    )


class FlowNet3D(nn.Module):
    """Siamese encoder + cross-cloud embedding + up-conv decoder.

    ``encode``/``decode`` are exposed separately because every caller
    that needs multiple flow directions over a SHARED cloud set
    (PointINet's two directions, ISAPCInet's 4*field fan-out over
    field+... distinct frames, New_Models0.py:130-149) would otherwise
    re-encode each cloud once per pair: the encoder weights are shared
    and at eval the encoder is deterministic (FPS start fixed, BN running
    stats), so per-cloud encodings are bit-identical across pairs.
    ``multi``/``bidirectional`` are eval-path only: under ``train=True``
    BN batch-stat update COUNTS differ from per-pair passes (callers
    gate on the flow-freeze flag).
    """

    def setup(self):
        self.set_conv1 = SetConv(1024, 0.5, 16, (32, 32, 64))
        self.set_conv2 = SetConv(256, 1.0, 16, (64, 64, 128))
        self.flow_embedding = FlowEmbedding(64, (128, 128, 128))
        self.set_conv3 = SetConv(64, 2.0, 8, (128, 128, 256))
        self.set_conv4 = SetConv(16, 4.0, 8, (256, 256, 512))
        self.set_upconv1 = SetUpConv(8, (), (256, 256))
        self.set_upconv2 = SetUpConv(8, (128, 128, 256), (256,))
        self.set_upconv3 = SetUpConv(8, (128, 128, 256), (256,))
        self.fp = FeaturePropagation((256, 256))
        self.classifier = Classifier()

    def encode(self, xyz, feats, *, train: bool = False, momentum=0.1):
        """Two-level set-conv encoding of one cloud -> (xyz, feats,
        p_1, f_1, p_2, f_2), reusable across every pair the cloud
        appears in."""
        kw = dict(train=train, momentum=momentum)
        if (
            _enc_ok(train)
            and not self.is_initializing()
            # no-VJP kernel: fall back to XLA when a tangent could flow
            # (frozen-flow callers stop-grad the flow params at the loss,
            # train.state.freeze_params, so they KEEP the kernel route)
            and not ops.has_tangents(xyz, feats, self.variables["params"])
        ):
            return self._encode_fused(xyz, feats)
        p_1, f_1 = self.set_conv1(xyz, feats, **kw)
        p_2, f_2 = self.set_conv2(p_1, f_1, **kw)
        return (xyz, feats, p_1, f_1, p_2, f_2)

    def _encode_fused(self, xyz, feats):
        """Eval encode as one kernel: set_conv1 streams the input cloud,
        set_conv2 consumes its VMEM-resident output (flowenc_tpu)."""
        from ..ops.pallas_kernels.flowenc_tpu import flowenc_fused

        sc1, sc2 = self.set_conv1, self.set_conv2
        interpret = jax.default_backend() != "tpu"  # interpreter for tests
        p_1 = ops.fps_points(xyz, sc1.npoint, 0, exact=sc1.fps_exact)
        p = self.variables["params"]
        st = self.variables["batch_stats"]
        flat = (
            fold_pointmlp_vars(
                p["set_conv1"]["PointMLP_0"],
                st["set_conv1"]["PointMLP_0"], len(sc1.mlp),
            )
            + fold_pointmlp_vars(
                p["set_conv2"]["PointMLP_0"],
                st["set_conv2"]["PointMLP_0"], len(sc2.mlp),
            )
        )
        f_1, f_2, p_2 = flowenc_fused(
            xyz, feats, p_1, flat, sc2.npoint,
            sc1.radius, sc1.nsample, sc2.radius, sc2.nsample,
            len(sc1.mlp), len(sc2.mlp), interpret,
        )
        return (xyz, feats, p_1, f_1, p_2, f_2)

    def decode(self, enc_a, enc_b, *, train: bool = False, momentum=0.1):
        """Flow a->b from the two clouds' encodings."""
        kw = dict(train=train, momentum=momentum)
        xyza, featsa, pa_1, fa_1, pa_2, fa_2 = enc_a
        _, _, _, _, pb_2, fb_2 = enc_b
        if (
            _mid_ok(train)
            and not self.is_initializing()
            and not ops.has_tangents(enc_a, enc_b, self.variables["params"])
        ):
            return self._decode_fused(
                xyza, featsa, pa_1, fa_1, pa_2, fa_2, pb_2, fb_2
            )
        emb = self.flow_embedding(pa_2, pb_2, fa_2, fb_2, **kw)
        pa_3, fa_3 = self.set_conv3(pa_2, emb, **kw)
        pa_4, fa_4 = self.set_conv4(pa_3, fa_3, **kw)
        nf_3 = self.set_upconv1(pa_4, pa_3, fa_4, fa_3, **kw)
        nf_2 = self.set_upconv2(
            pa_3, pa_2, nf_3, jnp.concatenate([fa_2, emb], axis=-1), **kw
        )
        nf_1 = self.set_upconv3(pa_2, pa_1, nf_2, fa_1, **kw)
        nf = self.fp(pa_1, xyza, nf_1, featsa, **kw)
        return self.classifier(nf, **kw)

    def _decode_fused(self, xyza, featsa, pa_1, fa_1, pa_2, fa_2, pb_2,
                      fb_2):
        """Eval decode in TWO kernels: the whole coarse mid-section
        (flow_embedding .. set_upconv3) as one VMEM-resident megakernel,
        then the dense FeaturePropagation with the classifier's folded
        BN layer + final linear riding its MLP2 chain (one [N,3] write
        instead of a [N,256] round-trip + two more launches)."""
        from ..ops.pallas_kernels.flowmid_tpu import flowmid_fused
        from ..ops.pallas_kernels.knnconv_tpu import knnconv_fused
        from ..ops.pallas_kernels.setconv_tpu import fold_bn_layers

        interpret = jax.default_backend() != "tpu"  # interpreter for tests
        p = self.variables["params"]
        st = self.variables["batch_stats"]
        fold = lambda name, sub, n: fold_pointmlp_vars(  # noqa: E731
            p[name][sub], st[name][sub], n
        )
        flat = (
            fold("flow_embedding", "PointMLP_0", 3)
            + fold("set_conv3", "PointMLP_0", 3)
            + fold("set_conv4", "PointMLP_0", 3)
            + fold("set_upconv1", "conv2", 2)
            + fold("set_upconv2", "conv1", 3)
            + fold("set_upconv2", "conv2", 1)
            + fold("set_upconv3", "conv1", 3)
            + fold("set_upconv3", "conv2", 1)
        )
        nf_1 = flowmid_fused(
            pa_1, fa_1, pa_2, fa_2, pb_2, fb_2, flat,
            self.set_conv3.npoint, self.set_conv4.npoint,
            self.flow_embedding.nsample,
            self.set_conv3.radius, self.set_conv3.nsample,
            self.set_conv4.radius, self.set_conv4.nsample,
            self.set_upconv1.nsample, interpret,
        )
        # fp + classifier tail: BN-folded Dense(128) keeps its ReLU, the
        # final Dense(3) is linear (n_final=1)
        cp, cs_ = p["classifier"], st["classifier"]
        tail = (
            fold("fp", "PointMLP_0", len(self.fp.mlp))
            + fold_bn_layers(
                [cp["Dense_0"]], [cp["BatchNorm_0"]], [cs_["BatchNorm_0"]]
            )
            + (cp["Dense_1"]["kernel"].T, cp["Dense_1"]["bias"])
        )
        return knnconv_fused(
            xyza, pa_1, nf_1, None, featsa, 3, (), tail, 0,
            len(self.fp.mlp) + 2, interpret, interp=True, recip="clamp",
            n_final=1,
        )

    def multi(self, clouds, feats, pairs, *, train: bool = False,
              momentum=0.1, batched_decode: bool | None = None):
        """Flows for ``pairs`` of indices into ``clouds``: each cloud is
        encoded ONCE (ISAPCInet field=2 runs 8 pairs over 6 distinct
        clouds = 16 -> 6 encoder invocations).

        ``batched_decode`` stacks the per-pair DECODES along the batch
        axis into one wide pass.  Unlike the measured-slower full-pass
        batching (r1: the 16k ball-query encoder blew VMEM at 2x width),
        the decode's stages run at coarse levels (<=1024 points except
        the final fp), so width amortizes per-stage overhead without the
        encoder's working-set blowup.  Row-independent at eval (BN
        running stats) => identical numerics.  Default from
        PCI_TPU_BATCH_DECODE (off until measured on chip)."""
        if batched_decode is None:
            batched_decode = os.environ.get("PCI_TPU_BATCH_DECODE") == "1"
        encs = [
            self.encode(c, f, train=train, momentum=momentum)
            for c, f in zip(clouds, feats)
        ]
        if not batched_decode or len(pairs) == 1:
            return [
                self.decode(encs[a], encs[b], train=train, momentum=momentum)
                for a, b in pairs
            ]
        stack = lambda idxs: tuple(  # noqa: E731
            jnp.concatenate([encs[i][j] for i in idxs], axis=0)
            for j in range(6)
        )
        enc_a = stack([a for a, _ in pairs])
        enc_b = stack([b for _, b in pairs])
        out = self.decode(enc_a, enc_b, train=train, momentum=momentum)
        B = clouds[0].shape[0]
        return [out[i * B:(i + 1) * B] for i in range(len(pairs))]

    def __call__(self, xyz1, xyz2, feats1, feats2, *, train: bool = False,
                 momentum=0.1, bidirectional: bool = False):
        """Estimate per-point scene flow from cloud1 to cloud2.

        Args:
          xyz1, xyz2: ``[B, N, 3]`` point clouds.
          feats1, feats2: ``[B, N, 3]`` features (colors for FlyThings3D,
            zeros for LiDAR).
          bidirectional: also return the 2->1 flow, reusing both clouds'
            encodings (see class docstring; eval-path only).

        Returns:
          flow ``[B, N, 3]``; ``(flow12, flow21)`` when bidirectional.
        """
        if bidirectional:
            # = multi over the shared pair: each cloud encoded once, and
            # PCI_TPU_BATCH_DECODE stacks both directions' decodes into
            # one wide megakernel launch
            f12, f21 = self.multi(
                [xyz1, xyz2], [feats1, feats2], [(0, 1), (1, 0)],
                train=train, momentum=momentum,
            )
            return f12, f21
        e1 = self.encode(xyz1, feats1, train=train, momentum=momentum)
        e2 = self.encode(xyz2, feats2, train=train, momentum=momentum)
        return self.decode(e1, e2, train=train, momentum=momentum)
