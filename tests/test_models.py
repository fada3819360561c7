"""Model-level tests: shapes, finiteness, gradient flow, freeze semantics.

Small clouds keep CPU runtimes sane; FlowNet3D's hard-coded pyramid sizes
(1024/256/64/16) oversample small clouds via FPS repetition, which is
static-shape-safe.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pci_tpu.models import FlowNet3D, ISAPCInet, PointINet, PointINet2, PolyPCI

N = 160
B = 2


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def cloud(rng, b=B, n=N, c=3, scale=2.0):
    return jnp.asarray((rng.standard_normal((b, n, c)) * scale).astype(np.float32))


def zeros(b=B, n=N, c=3):
    return jnp.zeros((b, n, c), jnp.float32)


class TestFlowNet3D:
    def test_forward_shape(self, rng):
        net = FlowNet3D()
        x1, x2 = cloud(rng), cloud(rng)
        vars_ = net.init(jax.random.key(0), x1, x2, zeros(), zeros(), train=False)
        flow = net.apply(vars_, x1, x2, zeros(), zeros(), train=False)
        assert flow.shape == (B, N, 3)
        assert np.isfinite(np.asarray(flow)).all()

    def test_has_batch_stats(self, rng):
        net = FlowNet3D()
        x1, x2 = cloud(rng), cloud(rng)
        vars_ = net.init(jax.random.key(0), x1, x2, zeros(), zeros(), train=False)
        assert "batch_stats" in vars_
        # BN eps=1e-3 layers exist in every set_conv
        assert "set_conv1" in vars_["params"]

    def test_decode_fused_matches_xla(self, rng, monkeypatch):
        """The decode-mid megakernel + fp/classifier-fused tail
        (interpreter mode) vs the pure-XLA eval decode."""
        from pci_tpu.models import flownet3d as F

        net = FlowNet3D()
        x1, x2 = cloud(rng), cloud(rng)
        vars_ = net.init(
            jax.random.key(0), x1, x2, zeros(), zeros(), train=False
        )
        want = np.asarray(
            net.apply(vars_, x1, x2, zeros(), zeros(), train=False)
        )
        monkeypatch.setattr(F, "_mid_ok", lambda train: not train)
        got = np.asarray(
            net.apply(vars_, x1, x2, zeros(), zeros(), train=False)
        )
        # kNN ranking in the kernel is mantissa-quantized (~2^-15): a
        # boundary neighbor can swap, perturbing the max-pool slightly
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=3e-4)

    def test_encode_fused_matches_xla(self, rng, monkeypatch):
        """The two-stage encoder megakernel (interpreter mode) vs the
        pure-XLA eval encoder, via the full forward."""
        from pci_tpu.models import flownet3d as F

        net = FlowNet3D()
        x1, x2 = cloud(rng), cloud(rng)
        vars_ = net.init(
            jax.random.key(0), x1, x2, zeros(), zeros(), train=False
        )
        want = np.asarray(
            net.apply(vars_, x1, x2, zeros(), zeros(), train=False)
        )
        monkeypatch.setattr(F, "_enc_ok", lambda train: not train)
        got = np.asarray(
            net.apply(vars_, x1, x2, zeros(), zeros(), train=False)
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_grad_flows(self, rng):
        net = FlowNet3D()
        x1, x2 = cloud(rng), cloud(rng)
        vars_ = net.init(jax.random.key(0), x1, x2, zeros(), zeros(), train=False)

        def loss(p):
            flow = net.apply(
                {"params": p, "batch_stats": vars_["batch_stats"]},
                x1, x2, zeros(), zeros(), train=False,
            )
            return jnp.mean(flow**2)

        g = jax.grad(loss)(vars_["params"])
        total = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
        assert np.isfinite(total) and total > 0


class TestPointINet:
    def _init(self, rng, extra=0):
        net = PointINet(freeze_flow=True)
        p1 = cloud(rng, c=3 + extra)
        p2 = cloud(rng, c=3 + extra)
        t = jnp.asarray([0.3, 0.6])
        rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}
        vars_ = net.init(rngs, p1, p2, zeros(), zeros(), t, train=False)
        return net, vars_, p1, p2, t

    def test_xyz_only(self, rng):
        net, vars_, p1, p2, t = self._init(rng)
        out = net.apply(
            vars_, p1, p2, zeros(), zeros(), t, train=False,
            rngs={"sample": jax.random.key(2)},
        )
        assert out.shape == (B, N, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_with_intensity(self, rng):
        net, vars_, p1, p2, t = self._init(rng, extra=1)
        out = net.apply(
            vars_, p1, p2, zeros(), zeros(), t, train=False,
            rngs={"sample": jax.random.key(2)},
        )
        assert out.shape == (B, N, 4)

    def test_frozen_flow_gets_no_grad(self, rng):
        net, vars_, p1, p2, t = self._init(rng)

        def loss(p):
            out = net.apply(
                {"params": p, "batch_stats": vars_["batch_stats"]},
                p1, p2, zeros(), zeros(), t, train=True,
                rngs={"sample": jax.random.key(2)},
                mutable=["batch_stats"],
            )[0]
            return jnp.mean(out**2)

        g = jax.grad(loss)(vars_["params"])
        flow_g = sum(
            float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g["flow"])
        )
        fusion_g = sum(
            float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g["fusion"])
        )
        assert flow_g == 0.0  # stop_gradient mirrors torch.no_grad
        assert fusion_g > 0.0


class TestISAPCInet:
    @pytest.mark.parametrize("field", [0, 2])
    def test_forward(self, rng, field):
        net = ISAPCInet(field=field, ff_out_c=32, tr_out_c=32)
        fwd = [cloud(rng) for _ in range(field)]
        keys = [cloud(rng), cloud(rng)]
        bwd = [cloud(rng) for _ in range(field)]
        t = jnp.asarray([0.25, 0.75])
        rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}
        vars_ = net.init(rngs, fwd, keys, bwd, t, zeros(), train=False)
        out = net.apply(
            vars_, fwd, keys, bwd, t, zeros(), train=False,
            rngs={"sample": jax.random.key(2)},
        )
        assert out.shape == (B, N, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_no_tnet_variant(self, rng):
        net = ISAPCInet(field=1, use_tnet=False, ff_out_c=32, tr_out_c=32)
        fwd = [cloud(rng)]
        keys = [cloud(rng), cloud(rng)]
        bwd = [cloud(rng)]
        t = jnp.asarray([0.5, 0.5])
        rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}
        vars_ = net.init(rngs, fwd, keys, bwd, t, zeros(), train=False)
        assert "tnet_forward" not in vars_["params"]
        out = net.apply(
            vars_, fwd, keys, bwd, t, zeros(), train=False,
            rngs={"sample": jax.random.key(2)},
        )
        assert out.shape == (B, N, 3)


class TestPointINet2:
    def test_forward(self, rng):
        net = PointINet2(field=1)
        fwd = [cloud(rng)]
        keys = [cloud(rng), cloud(rng)]
        bwd = [cloud(rng)]
        t = jnp.asarray([0.4, 0.9])
        rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}
        vars_ = net.init(rngs, fwd, keys, bwd, t, zeros(), train=False)
        # ring fusions are registered submodules (fixes a reference defect)
        assert "fusion_ring1" in vars_["params"]
        out = net.apply(
            vars_, fwd, keys, bwd, t, zeros(), train=False,
            rngs={"sample": jax.random.key(2)},
        )
        assert out.shape == (B, N, 3)


class TestISAPCInetAsym:
    def test_forward(self, rng):
        from pci_tpu.models import ISAPCInetAsym

        net = ISAPCInetAsym(forward_field=2, backward_field=1)
        fwd = [cloud(rng), cloud(rng)]
        key = cloud(rng)
        bwd = [cloud(rng)]
        t = jnp.asarray([0.3, 0.7])
        vars_ = net.init(jax.random.key(0), fwd, key, bwd, t, zeros(), train=False)
        out = net.apply(vars_, fwd, key, bwd, t, zeros(), train=False)
        assert out.shape == (B, N, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_t_zero_returns_key(self, rng):
        """At t=0 the warp term vanishes -> output equals the key frame."""
        from pci_tpu.models import ISAPCInetAsym

        net = ISAPCInetAsym(forward_field=1, backward_field=1)
        fwd, key, bwd = [cloud(rng)], cloud(rng), [cloud(rng)]
        t = jnp.asarray([0.0, 0.0])
        vars_ = net.init(jax.random.key(0), fwd, key, bwd, t, zeros(), train=False)
        out = net.apply(vars_, fwd, key, bwd, t, zeros(), train=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(key), atol=1e-5)


class TestPolyPCI:
    def test_forward(self, rng):
        field, degree = 2, 2
        net = PolyPCI(field=field, degree=degree)
        fwd = [cloud(rng) for _ in range(field)]
        key = cloud(rng)
        bwd = [cloud(rng) for _ in range(field)]
        # trajectory order: key, f1, b1, f2, b2 at times 0, -1, 1, -2, 2
        T = jnp.asarray(np.tile([0.0, -1.0, 1.0, -2.0, 2.0], (B, 1)).astype(np.float32))
        t = jnp.asarray([0.5, -0.5])
        vars_ = net.init(jax.random.key(0), fwd, key, bwd, t, T, zeros(), train=False)
        out = net.apply(vars_, fwd, key, bwd, t, T, zeros(), train=False)
        assert out.shape == (B, N, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_t_zero_recovers_key_when_identical_frames(self, rng):
        """With all frames equal to the key frame, every rebuilt trajectory
        snaps back onto key points, so the t=0 evaluation returns points of
        the key cloud (polynomial through constant trajectories)."""
        field, degree = 1, 1
        net = PolyPCI(field=field, degree=degree)
        key = cloud(rng, b=1)
        fwd = [key]
        bwd = [key]
        T = jnp.asarray([[0.0, -1.0, 1.0]], jnp.float32)
        t = jnp.asarray([0.0])
        vars_ = net.init(jax.random.key(0), fwd, key, bwd, t, T, zeros(1), train=False)
        out = net.apply(vars_, fwd, key, bwd, t, T, zeros(1), train=False)
        # rebuild snaps warped points onto real frame points; with identical
        # frames the trajectory is constant in time only if the snap returns
        # the same point each ring.  Weaker invariant: outputs lie inside
        # the key cloud's bounding box.
        lo, hi = key.min(axis=1), key.max(axis=1)
        assert bool(jnp.all(out >= lo[:, None] - 1e-3) & jnp.all(out <= hi[:, None] + 1e-3))


class TestBidirectionalFlow:
    def test_matches_two_directional_passes(self):
        """flow(bidirectional=True) must equal the two separate calls
        bitwise at eval (shared Siamese encodings, same ops)."""
        import numpy as np

        from pci_tpu.models import FlowNet3D

        rng = np.random.default_rng(5)
        p1 = jnp.asarray(rng.standard_normal((1, 128, 3)).astype(np.float32) * 3)
        p2 = jnp.asarray(rng.standard_normal((1, 128, 3)).astype(np.float32) * 3)
        z = jnp.zeros_like(p1)
        model = FlowNet3D()
        v = model.init({"params": jax.random.key(0)}, p1, p2, z, z, train=False)
        f12 = model.apply(v, p1, p2, z, z, train=False)
        f21 = model.apply(v, p2, p1, z, z, train=False)
        b12, b21 = model.apply(v, p1, p2, z, z, train=False, bidirectional=True)
        np.testing.assert_array_equal(np.asarray(b12), np.asarray(f12))
        np.testing.assert_array_equal(np.asarray(b21), np.asarray(f21))

    def test_param_tree_identical(self):
        """bidirectional init must produce the same checkpoint tree."""
        import numpy as np

        from pci_tpu.models import FlowNet3D

        rng = np.random.default_rng(5)
        p1 = jnp.asarray(rng.standard_normal((1, 64, 3)).astype(np.float32))
        p2 = jnp.asarray(rng.standard_normal((1, 64, 3)).astype(np.float32))
        z = jnp.zeros_like(p1)
        model = FlowNet3D()
        va = model.init({"params": jax.random.key(0)}, p1, p2, z, z, train=False)
        vb = model.init({"params": jax.random.key(0)}, p1, p2, z, z,
                        train=False, bidirectional=True)
        ta = jax.tree_util.tree_structure(va)
        tb = jax.tree_util.tree_structure(vb)
        assert ta == tb

    def test_multi_batched_decode_matches(self):
        """Batched decode fan-out must match per-pair decodes at eval."""
        import numpy as np

        from pci_tpu.models import FlowNet3D

        rng = np.random.default_rng(9)
        clouds = [
            jnp.asarray(rng.standard_normal((2, 96, 3)).astype(np.float32) * 3)
            for _ in range(3)
        ]
        feats = [jnp.zeros_like(c) for c in clouds]
        pairs = [(0, 1), (1, 0), (2, 1), (0, 2)]
        model = FlowNet3D()
        v = model.init({"params": jax.random.key(0)}, clouds[0], clouds[1],
                       feats[0], feats[1], train=False)

        seq = model.apply(v, clouds, feats, pairs, train=False,
                          batched_decode=False, method=FlowNet3D.multi)
        bat = model.apply(v, clouds, feats, pairs, train=False,
                          batched_decode=True, method=FlowNet3D.multi)
        for s, b in zip(seq, bat):
            np.testing.assert_allclose(
                np.asarray(s), np.asarray(b), rtol=1e-5, atol=1e-6
            )


class TestAutodiffRouting:
    """Eval-only Pallas kernels define no VJP: routing one inside a
    differentiated trace crashed the r5 bench_train (the frozen-flow
    fine-tune step differentiates the FULL param tree, so tangents rode
    the flow params into the flowenc megakernel).  Two-layer fix under
    test: (a) gates fall back to XLA when ops.has_tangents, (b)
    train.freeze_params stop-grads frozen subtrees at the loss so the
    megakernels stay ROUTABLE in a frozen-flow train step."""

    def test_grad_with_gates_on_falls_back_to_xla(self, rng, monkeypatch):
        from pci_tpu.models import flownet3d as F

        net = FlowNet3D()
        x1, x2 = cloud(rng), cloud(rng)
        vars_ = net.init(
            jax.random.key(0), x1, x2, zeros(), zeros(), train=False
        )

        def loss(p):
            flow = net.apply(
                {"params": p, "batch_stats": vars_["batch_stats"]},
                x1, x2, zeros(), zeros(), train=False,
            )
            return jnp.mean(flow**2)

        want = jax.grad(loss)(vars_["params"])
        monkeypatch.setattr(F, "_enc_ok", lambda train: not train)
        monkeypatch.setattr(F, "_mid_ok", lambda train: not train)
        got = jax.grad(loss)(vars_["params"])  # crashed before the gate fix
        for a, b in zip(
            jax.tree_util.tree_leaves(got), jax.tree_util.tree_leaves(want)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_frozen_flow_keeps_megakernel_route(self, rng, monkeypatch):
        from pci_tpu.models import flownet3d as F
        from pci_tpu.train import freeze_params

        net = PointINet(freeze_flow=True)
        p1, p2 = cloud(rng), cloud(rng)
        t = jnp.asarray([0.3, 0.6])
        rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}
        vars_ = net.init(rngs, p1, p2, zeros(), zeros(), t, train=False)

        monkeypatch.setattr(F, "_enc_ok", lambda train: not train)
        calls = {"fused": 0}
        orig = FlowNet3D._encode_fused

        def record(self, xyz, feats):
            calls["fused"] += 1
            return orig(self, xyz, feats)

        monkeypatch.setattr(FlowNet3D, "_encode_fused", record)

        def loss(params):
            params = freeze_params(params, ("flow",))
            out = net.apply(
                {"params": params, "batch_stats": vars_["batch_stats"]},
                p1, p2, zeros(), zeros(), t, train=False,
                rngs={"sample": jax.random.key(2)},
            )
            return jnp.mean(out[..., :3] ** 2)

        g = jax.grad(loss)(vars_["params"])
        # the stop-grad'd flow kept the kernel route under jax.grad
        assert calls["fused"] >= 2  # bidirectional flow = 2+ encodes
        flow_total = sum(
            float(jnp.abs(l).sum())
            for l in jax.tree_util.tree_leaves(g["flow"])
        )
        other_total = sum(
            float(jnp.abs(l).sum())
            for k, v in g.items() if k != "flow"
            for l in jax.tree_util.tree_leaves(v)
        )
        assert flow_total == 0.0
        assert np.isfinite(other_total) and other_total > 0
