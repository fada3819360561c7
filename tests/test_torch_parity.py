"""Weight-for-weight parity of FlowNet3D vs the reference PyTorch model.

The strongest correctness evidence this repo can produce without trained
reference checkpoints: instantiate the REFERENCE torch FlowNet3D
(/root/reference/PointINet20230424/models/models.py), copy its randomly
initialized weights into our flax model, and assert the two forward
passes agree on the same cloud pair.  Any mismatch in channel concat
order, BN semantics, kNN/ball-query/FPS behavior, or MLP layout breaks
this test.

The reference imports pytorch3d (not installed here) at module scope; a
minimal exact shim is injected.  The reference's random FPS start
(torch.randint, pointnet2_utils.py) is pinned to 0 to match our
deterministic eval path.
"""

from __future__ import annotations

import os
import sys
import types
from unittest import mock

import numpy as np
import pytest

REF = "/root/reference/PointINet20230424"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo unavailable"
)


def _install_pytorch3d_shim():
    import torch

    if "pytorch3d" in sys.modules:
        return

    def knn_gather(x, idx):
        B, S, K = idx.shape
        C = x.shape[2]
        flat = idx.reshape(B, S * K, 1).expand(B, S * K, C)
        return torch.gather(x, 1, flat).reshape(B, S, K, C)

    class _KNN:
        def __init__(self, dists, idx, knn):
            self.dists, self.idx, self.knn = dists, idx, knn

    def knn_points(p1, p2, K=1, return_nn=False, **kw):
        d = torch.cdist(p1, p2) ** 2  # pytorch3d returns squared dists
        dists, idx = d.topk(K, dim=2, largest=False)
        nn = knn_gather(p2, idx) if return_nn else None
        return _KNN(dists, idx, nn)

    root = types.ModuleType("pytorch3d")
    ops = types.ModuleType("pytorch3d.ops")
    ops.knn_points = knn_points
    ops.knn_gather = knn_gather
    root.ops = ops
    sys.modules["pytorch3d"] = root
    sys.modules["pytorch3d.ops"] = ops


def _load_reference_flownet():
    _install_pytorch3d_shim()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import models.models as ref_models  # noqa: F401

    return ref_models


def _torch_to_flax(sd):
    """Reference state_dict -> our (params, batch_stats) nested dicts."""
    # torch conv-stack prefix -> flax module path (both are sequences of
    # (1x1 conv, BN) pairs; Dense_i == conv.{3i}, BatchNorm_i == conv.{3i+1})
    stacks = {
        "set_conv1.conv": ("set_conv1", "PointMLP_0"),
        "set_conv2.conv": ("set_conv2", "PointMLP_0"),
        "flow_embedding.conv": ("flow_embedding", "PointMLP_0"),
        "set_conv3.conv": ("set_conv3", "PointMLP_0"),
        "set_conv4.conv": ("set_conv4", "PointMLP_0"),
        "set_upconv1.conv2": ("set_upconv1", "conv2"),
        "set_upconv2.conv1": ("set_upconv2", "conv1"),
        "set_upconv2.conv2": ("set_upconv2", "conv2"),
        "set_upconv3.conv1": ("set_upconv3", "conv1"),
        "set_upconv3.conv2": ("set_upconv3", "conv2"),
        "fp.conv": ("fp", "PointMLP_0"),
    }
    params: dict = {}
    bstats: dict = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    for tpfx, fpath in stacks.items():
        i = 0
        while f"{tpfx}.{3 * i}.weight" in sd:
            w = sd[f"{tpfx}.{3 * i}.weight"].numpy()  # [out, in, 1, 1]
            put(params, (*fpath, f"Dense_{i}", "kernel"), w[:, :, 0, 0].T)
            put(params, (*fpath, f"Dense_{i}", "bias"),
                sd[f"{tpfx}.{3 * i}.bias"].numpy())
            put(params, (*fpath, f"BatchNorm_{i}", "scale"),
                sd[f"{tpfx}.{3 * i + 1}.weight"].numpy())
            put(params, (*fpath, f"BatchNorm_{i}", "bias"),
                sd[f"{tpfx}.{3 * i + 1}.bias"].numpy())
            put(bstats, (*fpath, f"BatchNorm_{i}", "mean"),
                sd[f"{tpfx}.{3 * i + 1}.running_mean"].numpy())
            put(bstats, (*fpath, f"BatchNorm_{i}", "var"),
                sd[f"{tpfx}.{3 * i + 1}.running_var"].numpy())
            i += 1
        assert i > 0, f"no layers found for {tpfx}"

    # classifier: Conv1d(256,128) + BN + ReLU + Conv1d(128,3)
    put(params, ("classifier", "Dense_0", "kernel"),
        sd["classifier.0.weight"].numpy()[:, :, 0].T)
    put(params, ("classifier", "Dense_0", "bias"),
        sd["classifier.0.bias"].numpy())
    put(params, ("classifier", "BatchNorm_0", "scale"),
        sd["classifier.1.weight"].numpy())
    put(params, ("classifier", "BatchNorm_0", "bias"),
        sd["classifier.1.bias"].numpy())
    put(bstats, ("classifier", "BatchNorm_0", "mean"),
        sd["classifier.1.running_mean"].numpy())
    put(bstats, ("classifier", "BatchNorm_0", "var"),
        sd["classifier.1.running_var"].numpy())
    put(params, ("classifier", "Dense_1", "kernel"),
        sd["classifier.3.weight"].numpy()[:, :, 0].T)
    put(params, ("classifier", "Dense_1", "bias"),
        sd["classifier.3.bias"].numpy())
    return params, bstats


def _zero_randint(low, high, size, **kw):
    import torch

    return torch.zeros(size, dtype=kw.get("dtype", torch.long))


class TestFlowNet3DTorchParity:
    def test_same_weights_same_flow(self):
        import torch

        import jax
        import jax.numpy as jnp

        from pci_tpu.models import FlowNet3D

        ref_models = _load_reference_flownet()
        torch.manual_seed(0)
        ref = ref_models.FlowNet3D().eval()

        rng = np.random.default_rng(5)
        N = 2048  # > the 1024 first-level FPS so no oversampling edge
        p1 = (rng.standard_normal((1, N, 3)) * 5).astype(np.float32)
        p2 = (p1 + 0.3 * rng.standard_normal((1, N, 3))).astype(np.float32)
        z = np.zeros((1, N, 3), np.float32)

        with torch.no_grad(), mock.patch("torch.randint", _zero_randint):
            out_ref = ref(
                torch.from_numpy(p1).permute(0, 2, 1),
                torch.from_numpy(p2).permute(0, 2, 1),
                torch.from_numpy(z).permute(0, 2, 1),
                torch.from_numpy(z).permute(0, 2, 1),
            )
        out_ref = out_ref.permute(0, 2, 1).numpy()  # [B, N, 3]

        net = FlowNet3D()
        variables = net.init(
            jax.random.key(0), jnp.asarray(p1), jnp.asarray(p2),
            jnp.asarray(z), jnp.asarray(z), train=False,
        )
        params, bstats = _torch_to_flax(ref.state_dict())
        # the converted trees must cover every leaf of our init
        conv = {"params": params, "batch_stats": bstats}
        ref_leaves = len(jax.tree_util.tree_leaves(conv))
        our_leaves = len(jax.tree_util.tree_leaves(variables))
        assert ref_leaves == our_leaves, (ref_leaves, our_leaves)
        jax.tree_util.tree_map(  # shape agreement leaf by leaf
            lambda a, b: None if a.shape == b.shape else (_ for _ in ()).throw(
                AssertionError((a.shape, b.shape))
            ),
            variables, conv,
        )

        out = np.asarray(net.apply(
            conv, jnp.asarray(p1), jnp.asarray(p2),
            jnp.asarray(z), jnp.asarray(z), train=False,
        ))
        assert out.shape == out_ref.shape
        # same weights, same neighbors -> agreement to fp32 accumulation
        np.testing.assert_allclose(out, out_ref, rtol=5e-3, atol=5e-3)
