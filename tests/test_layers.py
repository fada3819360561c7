"""Unit tests for the neural layer stack (small shapes, hermetic CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pci_tpu import nn as pnn


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(1)


def cloud(rng, B=2, N=64, C=3, scale=2.0):
    return jnp.asarray((rng.standard_normal((B, N, C)) * scale).astype(np.float32))


class TestBatchNorm:
    def test_train_normalizes(self, rng):
        bn = pnn.BatchNorm(eps=1e-3)
        x = cloud(rng, 2, 128, 8, scale=5.0) + 3.0
        vars_ = bn.init(jax.random.key(0), x, train=True)
        y, new_vars = bn.apply(vars_, x, train=True, momentum=0.5, mutable=["batch_stats"])
        ym = np.asarray(jnp.mean(y, axis=(0, 1)))
        ys = np.asarray(jnp.std(y, axis=(0, 1)))
        np.testing.assert_allclose(ym, 0.0, atol=1e-3)
        np.testing.assert_allclose(ys, 1.0, atol=1e-2)

    def test_running_stats_torch_semantics(self, rng):
        bn = pnn.BatchNorm(eps=1e-3)
        x = cloud(rng, 2, 256, 4, scale=2.0) + 1.0
        vars_ = bn.init(jax.random.key(0), x, train=True)
        _, new_vars = bn.apply(vars_, x, train=True, momentum=0.3, mutable=["batch_stats"])
        m = np.asarray(new_vars["batch_stats"]["mean"])
        batch_mean = np.asarray(jnp.mean(x, axis=(0, 1)))
        np.testing.assert_allclose(m, 0.3 * batch_mean, rtol=1e-5, atol=1e-5)
        v = np.asarray(new_vars["batch_stats"]["var"])
        n = x.shape[0] * x.shape[1]
        batch_var = np.asarray(jnp.var(x, axis=(0, 1))) * n / (n - 1)
        np.testing.assert_allclose(v, 0.7 * 1.0 + 0.3 * batch_var, rtol=1e-4)

    def test_eval_uses_running(self, rng):
        bn = pnn.BatchNorm(eps=1e-3)
        x = cloud(rng, 2, 64, 4)
        vars_ = bn.init(jax.random.key(0), x, train=True)
        y = bn.apply(vars_, x, train=False)
        # fresh stats: mean 0 var 1 -> y == x (up to eps)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-3, atol=1e-3)


class TestSetConv:
    def test_shapes_and_grad(self, rng):
        sc = pnn.SetConv(16, 0.8, 8, (16, 32))
        xyz = cloud(rng, 2, 64)
        feats = cloud(rng, 2, 64, 3)
        vars_ = sc.init(jax.random.key(0), xyz, feats, train=True)
        (nxyz, nfeats), _ = sc.apply(vars_, xyz, feats, train=True, mutable=["batch_stats"])
        assert nxyz.shape == (2, 16, 3)
        assert nfeats.shape == (2, 16, 32)

        def loss(v):
            (_, f), _ = sc.apply(v, xyz, feats, train=True, mutable=["batch_stats"])
            return jnp.sum(f**2)

        g = jax.grad(loss)(vars_)
        leaves = jax.tree_util.tree_leaves(g["params"])
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        assert sum(float(jnp.abs(l).sum()) for l in leaves) > 0


    def test_random_fps_start_train_only(self, rng):
        """Reference parity (Pointnet2Utils.py:76): training samples a
        random FPS start per call; eval stays deterministic."""
        sc = pnn.SetConv(16, 0.8, 8, (16, 32))
        xyz = cloud(rng, 2, 64)
        feats = cloud(rng, 2, 64, 3)
        vars_ = sc.init(jax.random.key(0), xyz, feats, train=True)

        def run(train, key=None):
            rngs = {"sample": key} if key is not None else {}
            (nxyz, _), _ = sc.apply(
                vars_, xyz, feats, train=train, mutable=["batch_stats"],
                rngs=rngs,
            )
            return np.asarray(nxyz)

        a = run(True, jax.random.key(1))
        b = run(True, jax.random.key(2))
        assert not np.allclose(a, b)  # different starts -> different sets
        e1 = run(False)
        e2 = run(False)
        np.testing.assert_array_equal(e1, e2)
        # without a sample rng, train is still deterministic (start 0)
        t1 = run(True)
        t2 = run(True)
        np.testing.assert_array_equal(t1, t2)


class TestFlowEmbedding:
    def test_shapes(self, rng):
        fe = pnn.FlowEmbedding(8, (16, 16))
        xyz1, xyz2 = cloud(rng, 2, 32), cloud(rng, 2, 32)
        f1, f2 = cloud(rng, 2, 32, 16), cloud(rng, 2, 32, 16)
        vars_ = fe.init(jax.random.key(0), xyz1, xyz2, f1, f2, train=True)
        out, _ = fe.apply(vars_, xyz1, xyz2, f1, f2, train=True, mutable=["batch_stats"])
        assert out.shape == (2, 32, 16)


class TestSetUpConv:
    def test_empty_mlp1(self, rng):
        up = pnn.SetUpConv(4, (), (32,))
        cx, dx = cloud(rng, 2, 8), cloud(rng, 2, 32)
        cf, df = cloud(rng, 2, 8, 64), cloud(rng, 2, 32, 16)
        vars_ = up.init(jax.random.key(0), cx, dx, cf, df, train=True)
        out, _ = up.apply(vars_, cx, dx, cf, df, train=True, mutable=["batch_stats"])
        assert out.shape == (2, 32, 32)


class TestFusion:
    def test_fused_points_near_inputs(self, rng):
        """Fused points are convex combos of neighbors, so they lie inside
        the union bounding box of the warped clouds."""
        fusion = pnn.PointsFusion((8, 16), sampling="random")
        p1 = cloud(rng, 2, 64)
        p2 = cloud(rng, 2, 64) + 0.1
        t = jnp.asarray([0.3, 0.7])
        vars_ = fusion.init(
            {"params": jax.random.key(0), "sample": jax.random.key(1)},
            p1, p2, 8, t, train=True,
        )
        out, _ = fusion.apply(
            vars_, p1, p2, 8, t, train=True, mutable=["batch_stats"],
            rngs={"sample": jax.random.key(2)},
        )
        assert out.shape == (2, 64, 3)
        lo = jnp.minimum(p1.min(axis=1), p2.min(axis=1)) - 1e-4
        hi = jnp.maximum(p1.max(axis=1), p2.max(axis=1)) + 1e-4
        assert bool(jnp.all(out >= lo[:, None, :]) & jnp.all(out <= hi[:, None, :]))

    def test_extreme_t(self, rng):
        """t=0 -> all samples and neighbors come from cloud1."""
        fusion = pnn.PointsFusion((8,), sampling="random")
        p1 = cloud(rng, 1, 32)
        p2 = cloud(rng, 1, 32) + 100.0  # far away
        t = jnp.asarray([0.0])
        vars_ = fusion.init(
            {"params": jax.random.key(0), "sample": jax.random.key(1)},
            p1, p2, 4, t, train=False,
        )
        out = fusion.apply(
            vars_, p1, p2, 4, t, train=False, rngs={"sample": jax.random.key(2)}
        )
        # with t=0, N2=0, k2=0: fused cloud must ignore cloud2 entirely
        assert float(out.max()) < 50.0

    def test_fps_sampling_mode(self, rng):
        fusion = pnn.PointsFusion((8,), sampling="fps")
        p1, p2 = cloud(rng, 1, 32), cloud(rng, 1, 32)
        t = jnp.asarray([0.5])
        vars_ = fusion.init({"params": jax.random.key(0)}, p1, p2, 4, t, train=False)
        out = fusion.apply(vars_, p1, p2, 4, t, train=False)
        assert out.shape == (1, 32, 3)

    def test_multi_fusion(self, rng):
        fusion = pnn.PointsFusionMulti((8, 16))
        clouds_ = [cloud(rng, 2, 32) for _ in range(3)]
        w = jnp.asarray(np.full((2, 12), 1 / 12, np.float32))  # 6*field=12 channels
        vars_ = fusion.init(
            {"params": jax.random.key(0), "sample": jax.random.key(1)},
            clouds_, 6, w, train=False,
        )
        out = fusion.apply(
            vars_, clouds_, 6, w, train=False, rngs={"sample": jax.random.key(2)}
        )
        assert out.shape == (2, 32, 3)


class TestFusionHelpers:
    def test_with_features_gathers_matching_points(self, rng):
        """Regression: with feats == points, the fused feature channel must
        equal the fused xyz exactly — neighbor features must come from the
        SAME (shuffled) points the neighbor indices refer to."""
        fusion = pnn.PointsFusionWithFeatures((8, 16))
        p1, p2 = cloud(rng, 1, 64), cloud(rng, 1, 64)
        t = jnp.asarray([0.4])
        vars_ = fusion.init(
            {"params": jax.random.key(0), "sample": jax.random.key(1)},
            p1, p2, p1, p2, 8, t, train=False,
        )
        out = fusion.apply(
            vars_, p1, p2, p1, p2, 8, t, train=False,
            rngs={"sample": jax.random.key(2)},
        )
        np.testing.assert_allclose(
            np.asarray(out[..., :3]), np.asarray(out[..., 3:]), atol=1e-5
        )

    def test_multi_budgets_invariants(self):
        from pci_tpu.nn.fusion import _ALIGN, _multi_budgets

        rngl = np.random.default_rng(0)
        N, k = 4096, 32
        for _ in range(20):
            w = rngl.dirichlet(np.ones(4), size=2).astype(np.float32)
            n_all, k_all = _multi_budgets(N, k, jnp.asarray(w[:, :3]))
            n_all, k_all = np.asarray(n_all), np.asarray(k_all)
            assert (n_all.sum(1) == N).all()
            assert (k_all.sum(1) == k).all()
            assert (n_all >= 0).all() and (k_all >= 0).all()
            assert (n_all % _ALIGN == 0).all()  # bucket-aligned segments
            assert (n_all[:, -1] >= _ALIGN).all()
            # budgeted clouds hold points
            assert (n_all[(k_all > 0)] > 0).all()

    def test_multi_budgets_overflow_clips_k(self):
        """Aligned budgets that overflow N clip middle clouds to n==0;
        their k budget must be zeroed (reassigned to the last cloud), or
        the CPU fallback would emit out-of-cloud duplicate neighbors."""
        from pci_tpu.nn.fusion import _ALIGN, _multi_budgets

        N, k = 2 * _ALIGN, 32
        w = jnp.asarray([[0.45, 0.45, 0.45]], jnp.float32)
        n_all, k_all = _multi_budgets(N, k, w)
        n_all, k_all = np.asarray(n_all), np.asarray(k_all)
        assert (n_all.sum(1) == N).all()
        assert (k_all.sum(1) == k).all()
        assert (k_all >= 0).all()
        assert (k_all[n_all == 0] == 0).all()
        assert (n_all[:, -1] >= _ALIGN).all()

    def test_composed_shuffle_merge_oracle(self):
        from pci_tpu.nn.fusion import _composed_shuffle_merge

        rngl = np.random.default_rng(1)
        B, N, F = 2, 64, 3
        pts = [jnp.asarray(rngl.standard_normal((B, N, 3)).astype(np.float32))
               for _ in range(F)]
        perms = [jnp.asarray(np.stack([rngl.permutation(N) for _ in range(B)]).astype(np.int32))
                 for _ in range(F)]
        n_all = jnp.asarray([[16, 32, 16], [48, 0, 16]], jnp.int32)
        combined, gidx = _composed_shuffle_merge(pts, perms, n_all)
        combined = np.asarray(combined)
        for b in range(B):
            want = np.concatenate(
                [
                    np.asarray(pts[j])[b][np.asarray(perms[j])[b][: int(n_all[b, j])]]
                    for j in range(F)
                ],
                axis=0,
            )
            np.testing.assert_array_equal(combined[b], want)
        # gidx carries features through the same merge
        cat = np.concatenate([np.asarray(p) for p in pts], axis=1)
        np.testing.assert_array_equal(
            np.take_along_axis(cat, np.asarray(gidx)[..., None], axis=1),
            combined,
        )


class TestTransformer:
    def test_shapes_and_residual(self, rng):
        tr = pnn.TransformerLayer(16, 4)
        xyz = cloud(rng, 2, 32)
        feats = cloud(rng, 2, 32, 8)
        vars_ = tr.init(jax.random.key(0), xyz, feats)
        out, attn = tr.apply(vars_, xyz, feats)
        assert out.shape == (2, 32, 8)
        assert attn.shape == (2, 32, 4, 16)
        # softmax over k sums to 1
        np.testing.assert_allclose(
            np.asarray(jnp.sum(attn, axis=2)), 1.0, rtol=1e-4
        )


class TestFusedAttention:
    def test_kernel_matches_reference_math(self, rng):
        """fused_vector_attention (interpret mode) vs plain-jnp tail math.

        Mirrors the XLA expression in nn/transformer.py:96-108 with the
        kernel's own dtype contract (bf16 q/K/V, fp32 delta/weights,
        fp32 accumulation + softmax).
        """
        from pci_tpu.ops.pallas_kernels.attention_tpu import (
            fused_vector_attention,
        )

        B, N, k, d = 1, 512, 4, 16
        f32 = np.float32
        q = rng.standard_normal((B, N, d)).astype(f32)
        g = rng.standard_normal((B, N, k, 2 * d)).astype(f32)
        delta = rng.standard_normal((B, N, k, 3)).astype(f32)
        ws = {
            n: rng.standard_normal(s).astype(f32) * 0.3
            for n, s in (
                ("wd0", (3, d)), ("wd1", (d, d)),
                ("wg0", (d, d)), ("wg1", (d, d)),
            )
        }
        bs = {n: rng.standard_normal(d).astype(f32) * 0.1
              for n in ("bd0", "bd1", "bg0", "bg1")}

        out = fused_vector_attention(
            jnp.asarray(q), jnp.asarray(g), jnp.asarray(delta),
            ws["wd0"], bs["bd0"], ws["wd1"], bs["bd1"],
            ws["wg0"], bs["bg0"], ws["wg1"], bs["bg1"],
            interpret=True,
        )

        # reference math with the kernel's bf16 input rounding
        qb = jnp.asarray(q).astype(jnp.bfloat16).astype(jnp.float32)
        gb = jnp.asarray(g).astype(jnp.bfloat16).astype(jnp.float32)
        kf, vf = np.asarray(gb[..., :d]), np.asarray(gb[..., d:])
        relu = lambda x: np.maximum(x, 0.0)
        pos = relu(delta @ ws["wd0"] + bs["bd0"]) @ ws["wd1"] + bs["bd1"]
        a = (
            relu(
                (np.asarray(qb)[:, :, None, :] - kf + pos) @ ws["wg0"]
                + bs["bg0"]
            )
            @ ws["wg1"] + bs["bg1"]
        )
        a = a / np.sqrt(d)
        e = np.exp(a - a.max(axis=2, keepdims=True))
        attn = e / e.sum(axis=2, keepdims=True)
        ref = np.sum(attn * (vf + pos), axis=2)

        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-2, rtol=2e-2)

    def test_unaligned_n_padded(self, rng):
        """N not a multiple of the 512-query grain (real protocol: the
        2fN flow cloud at 16000 pts is 32000 for field=1) — the wrapper
        zero-pads and slices."""
        from pci_tpu.ops.pallas_kernels.attention_tpu import (
            fused_vector_attention,
        )

        B, k, d = 1, 4, 8
        f32 = np.float32
        ws = [rng.standard_normal(s).astype(f32) * 0.3
              for s in ((3, d), (d, d), (d, d), (d, d))]
        bs = [rng.standard_normal(d).astype(f32) * 0.1 for _ in range(4)]
        N_big, N = 512, 320
        q = rng.standard_normal((B, N_big, d)).astype(f32)
        g = rng.standard_normal((B, N_big, k, 2 * d)).astype(f32)
        dl = rng.standard_normal((B, N_big, k, 3)).astype(f32)

        def run(n):
            return np.asarray(fused_vector_attention(
                jnp.asarray(q[:, :n]), jnp.asarray(g[:, :n]),
                jnp.asarray(dl[:, :n]),
                ws[0], bs[0], ws[1], bs[1], ws[2], bs[2], ws[3], bs[3],
                interpret=True,
            ))

        np.testing.assert_allclose(run(N), run(N_big)[:, :N], rtol=1e-5)


class TestHeads:
    def test_tnet_softmax(self, rng):
        tnet = pnn.Tnet(field=2)
        t = jnp.asarray([[0.3], [0.8]])
        vars_ = tnet.init(jax.random.key(0), t)
        w = tnet.apply(vars_, t)
        assert w.shape == (2, 4)
        np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, rtol=1e-5)

    def test_wnet(self, rng):
        wnet = pnn.Wnet(field=2)
        t = jnp.asarray([[0.5]])
        vars_ = wnet.init(jax.random.key(0), t)
        w = wnet.apply(vars_, t)
        assert w.shape == (1, 12)
        np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, rtol=1e-5)

    def test_outputer(self, rng):
        out_mod = pnn.Outputer()
        f = cloud(rng, 2, 32, 64)
        vars_ = out_mod.init(jax.random.key(0), f)
        y = out_mod.apply(vars_, f)
        assert y.shape == (2, 32, 3)


class TestPointnet2:
    def test_msg_sa(self, rng):
        sa = pnn.SetAbstractionMsg(16, [0.4, 0.8], [4, 8], [[8, 16], [8, 16]])
        xyz = cloud(rng, 2, 64)
        vars_ = sa.init(jax.random.key(0), xyz, None, train=True)
        (nxyz, nf), _ = sa.apply(vars_, xyz, None, train=True, mutable=["batch_stats"])
        assert nxyz.shape == (2, 16, 3)
        assert nf.shape == (2, 16, 32)

    def test_feature_abstract(self, rng):
        ffab = pnn.Pointnet2FeatureAbstract(32)
        xyz = cloud(rng, 1, 1200, scale=1.0)
        N = 1200
        vars_ = ffab.init(jax.random.key(0), xyz, train=False)
        out = ffab.apply(vars_, xyz, train=False)
        assert out.shape == (1, N, 32)
        assert np.isfinite(np.asarray(out)).all()

    def test_mid_fused_matches_xla(self, rng, monkeypatch):
        """The sa2..fp2 megakernel (pn2mid_tpu, interpreter mode) vs the
        pure-XLA eval path with the same params — exercises in-kernel
        FPS, ball pad-with-first/empty-row-0, GroupNorm two-pass, slot
        max, and 3-NN eps interpolation in one comparison."""
        ffab = pnn.Pointnet2FeatureAbstract(32)
        # scale ~1: the 0.2..1.6 radii then span sparse to dense
        # neighborhoods, covering shortfall-pad AND full-budget paths
        xyz = cloud(rng, 1, 1200, scale=1.0)
        from pci_tpu.nn import pointnet2 as p2

        vars_ = ffab.init(jax.random.key(0), xyz, train=False)
        want = np.asarray(ffab.apply(vars_, xyz, train=False))
        monkeypatch.setattr(p2, "_pn2mid_ok", lambda train: not train)
        got = np.asarray(ffab.apply(vars_, xyz, train=False))
        # kNN/ball boundary ties can swap under the kernel's VPU
        # distances (XLA uses the HIGHEST-precision matmul form)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=3e-4)


class TestFusedSetConv:
    def _fold(self, variables, n):
        from pci_tpu.ops.pallas_kernels.setconv_tpu import fold_bn_layers

        p = variables["params"]["PointMLP_0"]
        st = variables["batch_stats"]["PointMLP_0"]
        return fold_bn_layers(
            [p[f"Dense_{i}"] for i in range(n)],
            [p[f"BatchNorm_{i}"] for i in range(n)],
            [st[f"BatchNorm_{i}"] for i in range(n)],
        )

    def test_kernel_matches_xla_eval_path(self, rng):
        """setconv_fused (interpret) vs the SetConv XLA eval path with
        the same params — exercises selection, pad-with-first, BN fold,
        and the transposed MLP chain in one comparison."""
        from pci_tpu.ops.pallas_kernels.setconv_tpu import setconv_fused

        sc = pnn.SetConv(64, 0.6, 8, (16, 16, 32))
        xyz = cloud(rng, 2, 512)
        feats = cloud(rng, 2, 512, 5, scale=1.0)
        variables = sc.init(jax.random.key(0), xyz, feats, train=False)
        # non-trivial running stats so the fold is actually tested
        variables = jax.tree_util.tree_map(
            lambda x: x + 0.05 * jnp.arange(x.size, dtype=x.dtype).reshape(x.shape)
            if x.ndim == 1 else x,
            variables,
        )
        new_xyz, ref = sc.apply(variables, xyz, feats, train=False)
        got = setconv_fused(
            xyz, feats, new_xyz, 0.6, 8,
            self._fold(variables, 3), 3, True, True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-4
        )

    def test_empty_neighborhood_takes_row0(self, rng):
        """Queries with no in-radius key must read global row 0
        (ops/ball.py contract: all-empty queries clip to index 0)."""
        from pci_tpu.ops.pallas_kernels.setconv_tpu import setconv_fused

        sc = pnn.SetConv(4, 0.2, 4, (8, 8))
        xyz = cloud(rng, 1, 256, scale=5.0)
        feats = cloud(rng, 1, 256, 2, scale=1.0)
        variables = sc.init(jax.random.key(1), xyz, feats, train=False)
        far = jnp.full((1, 4, 3), 80.0)  # far from every key
        got = setconv_fused(
            xyz, feats, far, 0.2, 4, self._fold(variables, 2), 2,
            True, True,
        )
        # manual: every slot = row 0
        p = variables["params"]["PointMLP_0"]
        st = variables["batch_stats"]["PointMLP_0"]
        h = jnp.concatenate(
            [xyz[:, :1] - far[:, :, None, :][:, :, 0],
             jnp.broadcast_to(feats[:, :1], (1, 4, 2))], -1)
        x = h
        for i in range(2):
            d = p[f"Dense_{i}"]
            b = p[f"BatchNorm_{i}"]
            s = st[f"BatchNorm_{i}"]
            x = x @ d["kernel"] + d["bias"]
            x = (x - s["mean"]) / jnp.sqrt(s["var"] + 1e-3)
            x = jnp.maximum(x * b["scale"] + b["bias"], 0.0)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(x), atol=2e-4, rtol=2e-4
        )


class TestFusedFusionTail:
    @pytest.mark.parametrize("ce", [0, 2])
    def test_tail_parity(self, rng, ce):
        """fusion_attention_tail (interpret) vs the XLA attention head,
        with and without an extra per-neighbor payload."""
        from pci_tpu.nn.fusion import _safe_norm
        from pci_tpu.nn.mlp import PointMLP
        from pci_tpu.ops.pallas_kernels.fusion_tail_tpu import (
            fusion_attention_tail,
        )
        from pci_tpu.ops.pallas_kernels.setconv_tpu import fold_bn_layers

        B, N, k = 2, 96, 8
        resi = jnp.asarray(
            rng.standard_normal((B, N, k, 3)).astype(np.float32)
        )
        combined = cloud(rng, B, N)
        extra = (
            jnp.asarray(rng.standard_normal((B, N, k, ce)).astype(np.float32))
            if ce else None
        )
        mlp = PointMLP((16, 24), norm="batch")
        feats = jnp.concatenate([resi, _safe_norm(resi)], axis=-1)
        v = mlp.init(jax.random.key(0), feats, train=False)
        h = mlp.apply(v, feats, train=False)
        scores = jnp.max(h, axis=-1)
        w = jax.nn.softmax(scores, axis=-1)[..., None]
        ref = combined + jnp.sum(w * resi, axis=2)
        if ce:
            ref = jnp.concatenate(
                [ref, jnp.sum(w * extra, axis=2)], axis=-1
            )

        p, st = v["params"], v["batch_stats"]
        layers = fold_bn_layers(
            [p[f"Dense_{i}"] for i in range(2)],
            [p[f"BatchNorm_{i}"] for i in range(2)],
            [st[f"BatchNorm_{i}"] for i in range(2)],
        )
        got = fusion_attention_tail(combined, resi, extra, layers, 2, True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=3e-4, rtol=3e-4
        )

    def test_oneshot_kernel_parity(self, rng):
        """knn_fusion_attention (kNN + online-softmax tail in ONE kernel,
        interpret) vs the two-step route: knn_fusion_adaptive residuals +
        the XLA attention head.  Same extraction => identical neighbors;
        only the softmax accumulation order differs."""
        from pci_tpu.nn.fusion import _safe_norm
        from pci_tpu.nn.mlp import PointMLP
        from pci_tpu.ops.pallas_kernels import (
            knn_fusion_adaptive,
            knn_fusion_attention,
        )
        from pci_tpu.ops.pallas_kernels.setconv_tpu import fold_bn_layers

        B, N, k, bucket = 2, 96, 8, 16
        combined = cloud(rng, B, N)
        split = jnp.asarray([48, 64], jnp.int32)
        k1 = jnp.asarray([5, 3], jnp.int32)

        resi = knn_fusion_adaptive(
            combined, split, k1, k, bucket, interpret=True
        )
        mlp = PointMLP((16, 24), norm="batch")
        feats = jnp.concatenate([resi, _safe_norm(resi)], axis=-1)
        v = mlp.init(jax.random.key(0), feats, train=False)
        h = mlp.apply(v, feats, train=False)
        scores = jnp.max(h, axis=-1)
        w = jax.nn.softmax(scores, axis=-1)[..., None]
        ref = combined + jnp.sum(w * resi, axis=2)

        p, st = v["params"], v["batch_stats"]
        layers = fold_bn_layers(
            [p[f"Dense_{i}"] for i in range(2)],
            [p[f"BatchNorm_{i}"] for i in range(2)],
            [st[f"BatchNorm_{i}"] for i in range(2)],
        )
        seg_ends = jnp.stack([split, jnp.full_like(split, N)], axis=1)
        budgets = jnp.stack([k1, k - k1], axis=1)
        got = knn_fusion_attention(
            combined, seg_ends, budgets, layers, k, bucket, 1, True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=3e-4, rtol=3e-4
        )

    def test_oneshot_kernel_payload_parity(self, rng):
        """One-shot kernel with payload channels (intensity reduce) vs
        the two-step route: adaptive kNN idx -> payload gather -> XLA
        tail with the same weights."""
        from pci_tpu import ops
        from pci_tpu.nn.fusion import _safe_norm
        from pci_tpu.nn.mlp import PointMLP
        from pci_tpu.ops.pallas_kernels import (
            knn_fusion_adaptive,
            knn_fusion_attention,
        )
        from pci_tpu.ops.pallas_kernels.setconv_tpu import fold_bn_layers

        B, N, k, bucket, cp = 2, 96, 8, 16, 2
        combined = cloud(rng, B, N)
        payload = jnp.asarray(
            rng.standard_normal((B, N, cp)).astype(np.float32))
        split = jnp.asarray([48, 64], jnp.int32)
        k1 = jnp.asarray([5, 3], jnp.int32)

        idx, resi = knn_fusion_adaptive(
            combined, split, k1, k, bucket, emit_idx=True, interpret=True
        )
        nfs = ops.index_points(payload, idx)
        mlp = PointMLP((16, 24), norm="batch")
        feats = jnp.concatenate([resi, _safe_norm(resi)], axis=-1)
        v = mlp.init(jax.random.key(0), feats, train=False)
        h = mlp.apply(v, feats, train=False)
        w = jax.nn.softmax(jnp.max(h, axis=-1), axis=-1)[..., None]
        ref = jnp.concatenate(
            [combined + jnp.sum(w * resi, axis=2),
             jnp.sum(w * nfs, axis=2)], axis=-1,
        )

        p, st = v["params"], v["batch_stats"]
        layers = fold_bn_layers(
            [p[f"Dense_{i}"] for i in range(2)],
            [p[f"BatchNorm_{i}"] for i in range(2)],
            [st[f"BatchNorm_{i}"] for i in range(2)],
        )
        seg_ends = jnp.stack([split, jnp.full_like(split, N)], axis=1)
        budgets = jnp.stack([k1, k - k1], axis=1)
        got = knn_fusion_attention(
            combined, seg_ends, budgets, layers, k, bucket, 1, True,
            payload=payload,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=3e-4, rtol=3e-4
        )

    def test_pointsfusion_oneshot_route(self, monkeypatch):
        """PointsFusion module wiring through the one-shot kernel
        (interpret on CPU) vs the two-kernel route (resi kernel + XLA
        tail) — covers the param folding + seg_ends/budget plumbing.
        Both sides use the kernel kNN: comparing against the pure-XLA
        exact kNN would need N >= 4096 (the _fused_kernel_ok regime —
        at N=256 a 5-point budget consumes ALL 5 bucket winners of its
        segment and recall collapses by construction)."""
        import functools

        import pci_tpu.nn as pnn_mod
        import pci_tpu.ops.pallas_kernels as pk
        from pci_tpu.nn import fusion as fusion_mod

        rng = np.random.default_rng(5)
        fusion = pnn_mod.PointsFusion((16, 24), sampling="random")
        p1 = cloud(rng, 1, 256)
        p2 = p1 + 0.03 * jnp.asarray(
            rng.standard_normal((1, 256, 3)).astype(np.float32)
        )
        t = jnp.asarray([0.4], jnp.float32)
        rngs = {"sample": jax.random.key(3)}
        vars_ = fusion.init(
            {"params": jax.random.key(0), **rngs}, p1, p2, 8, t, train=False
        )
        monkeypatch.setattr(
            fusion_mod, "_fused_kernel_ok", lambda pts, k: True
        )
        monkeypatch.setattr(
            pk, "knn_fusion_adaptive",
            functools.partial(pk.knn_fusion_adaptive, interpret=True),
        )
        monkeypatch.setattr(
            fusion_mod, "_fusion_oneshot_ok", lambda train: False
        )
        ref = fusion.apply(vars_, p1, p2, 8, t, train=False, rngs=rngs)
        monkeypatch.setattr(
            fusion_mod, "_fusion_oneshot_ok", lambda train: not train
        )
        got = fusion.apply(vars_, p1, p2, 8, t, train=False, rngs=rngs)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5
        )

    def test_hash_perm_is_bijection(self, monkeypatch):
        """PCI_TPU_FUSION_PERM=hash: the sort-free permutation must be a
        true bijection on [0, N) per batch row, and differ across rows
        and keys."""
        from pci_tpu.nn.fusion import _random_perms

        monkeypatch.setenv("PCI_TPU_FUSION_PERM", "hash")
        B, N = 4, 1024
        p = np.asarray(_random_perms(jax.random.key(0), B, N))
        for b in range(B):
            assert (np.sort(p[b]) == np.arange(N)).all()
        assert not (p[0] == p[1]).all()
        q = np.asarray(_random_perms(jax.random.key(1), B, N))
        assert not (p[0] == q[0]).all()
        # non-power-of-two N falls back to the exact shuffle
        r = np.asarray(_random_perms(jax.random.key(0), 2, 1000))
        for b in range(2):
            assert (np.sort(r[b]) == np.arange(1000)).all()

    def test_cells_oneshot_kernel_parity(self, rng):
        """knn_fusion_cells in one-shot tail mode (+payload) vs its own
        two-step output (idx/resi + XLA tail + payload gather) —
        identical extraction, so only the softmax accumulation path
        differs."""
        from pci_tpu import ops
        from pci_tpu.nn.fusion import _safe_norm
        from pci_tpu.nn.mlp import PointMLP
        from pci_tpu.ops.pallas_kernels import knn_fusion_cells
        from pci_tpu.ops.pallas_kernels.setconv_tpu import fold_bn_layers

        B, N, k, cp = 1, 512, 8, 2
        combined = cloud(rng, B, N, scale=3.0)
        payload = jnp.asarray(
            rng.standard_normal((B, N, cp)).astype(np.float32))
        split = jnp.asarray([256], jnp.int32)
        k1 = jnp.asarray([5], jnp.int32)
        kw = dict(chunk=128, m_chunks=4, bucket=2, winners=2, tile=128)

        idx, resi = knn_fusion_cells(
            combined, split, k1, k, emit_idx=True, interpret=True, **kw)
        nfs = ops.index_points(payload, idx)
        mlp = PointMLP((16, 24), norm="batch")
        feats = jnp.concatenate([resi, _safe_norm(resi)], axis=-1)
        v = mlp.init(jax.random.key(0), feats, train=False)
        h = mlp.apply(v, feats, train=False)
        w = jax.nn.softmax(jnp.max(h, axis=-1), axis=-1)[..., None]
        ref = jnp.concatenate(
            [combined + jnp.sum(w * resi, axis=2),
             jnp.sum(w * nfs, axis=2)], axis=-1,
        )

        p, st = v["params"], v["batch_stats"]
        layers = fold_bn_layers(
            [p[f"Dense_{i}"] for i in range(2)],
            [p[f"BatchNorm_{i}"] for i in range(2)],
            [st[f"BatchNorm_{i}"] for i in range(2)],
        )
        got = knn_fusion_cells(
            combined, split, k1, k, interpret=True,
            tail_layers=layers, payload=payload, **kw)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=3e-4, rtol=3e-4
        )

    def test_pointsfusion_cells_oneshot_route(self, monkeypatch):
        """PointsFusion wiring through the CELLS one-shot kernel (the
        >=32k eval route, forced on at N=512) vs the cells 2-step route
        (grad wrapper resi + XLA tail) — same extraction config."""
        import pci_tpu.nn as pnn_mod
        from pci_tpu.nn import fusion as fusion_mod
        from pci_tpu.ops.pallas_kernels import fusion_cells_tpu as fc

        rng = np.random.default_rng(8)
        fusion = pnn_mod.PointsFusion((16, 24), sampling="random")
        p1 = cloud(rng, 1, 512, scale=3.0)
        p2 = p1 + 0.03 * jnp.asarray(
            rng.standard_normal((1, 512, 3)).astype(np.float32)
        )
        t = jnp.asarray([0.4], jnp.float32)
        rngs = {"sample": jax.random.key(3)}
        vars_ = fusion.init(
            {"params": jax.random.key(0), **rngs}, p1, p2, 8, t, train=False
        )
        monkeypatch.setattr(
            fusion_mod, "_cells_route_ok", lambda *a, **k: True
        )
        # the 2-step path's grad wrapper runs the kernel un-interpreted
        # (interpret rides POSITIONALLY there); force interpret for CPU
        orig = fc.knn_fusion_cells

        def patched(*a, **k):
            a = list(a)
            if len(a) > 10:
                a[10] = True
            else:
                k["interpret"] = True
            return orig(*a, **k)

        monkeypatch.setattr(fc, "knn_fusion_cells", patched)
        monkeypatch.setattr(
            fusion_mod, "_fusion_oneshot_ok", lambda train: False
        )
        ref = fusion.apply(vars_, p1, p2, 8, t, train=False, rngs=rngs)
        monkeypatch.setattr(
            fusion_mod, "_fusion_oneshot_ok", lambda train: not train
        )
        got = fusion.apply(vars_, p1, p2, 8, t, train=False, rngs=rngs)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5
        )

    def test_pointsfusion_with_features_oneshot_route(self, monkeypatch):
        """PointsFusionWithFeatures (intensity) through the one-shot
        payload kernel vs the two-kernel route (idx kernel + payload
        gather + XLA tail)."""
        import functools

        import pci_tpu.nn as pnn_mod
        import pci_tpu.ops.pallas_kernels as pk
        from pci_tpu.nn import fusion as fusion_mod

        rng = np.random.default_rng(6)
        fusion = pnn_mod.PointsFusionWithFeatures((16, 24))
        p1 = cloud(rng, 1, 256)
        p2 = p1 + 0.03 * jnp.asarray(
            rng.standard_normal((1, 256, 3)).astype(np.float32)
        )
        f1 = jnp.asarray(rng.standard_normal((1, 256, 1)).astype(np.float32))
        f2 = jnp.asarray(rng.standard_normal((1, 256, 1)).astype(np.float32))
        t = jnp.asarray([0.4], jnp.float32)
        rngs = {"sample": jax.random.key(3)}
        vars_ = fusion.init(
            {"params": jax.random.key(0), **rngs}, p1, p2, f1, f2, 8, t,
            train=False,
        )
        monkeypatch.setattr(
            fusion_mod, "_fused_kernel_ok", lambda pts, k: True
        )
        monkeypatch.setattr(
            pk, "knn_fusion_adaptive",
            functools.partial(pk.knn_fusion_adaptive, interpret=True),
        )
        monkeypatch.setattr(
            fusion_mod, "_fusion_oneshot_ok", lambda train: False
        )
        ref = fusion.apply(vars_, p1, p2, f1, f2, 8, t, train=False,
                           rngs=rngs)
        monkeypatch.setattr(
            fusion_mod, "_fusion_oneshot_ok", lambda train: not train
        )
        got = fusion.apply(vars_, p1, p2, f1, f2, 8, t, train=False,
                           rngs=rngs)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5
        )


class TestFusedKnnConv:
    def test_flow_embedding_parity(self):
        """knnconv_fused (interpret) vs the FlowEmbedding XLA eval path.

        Own fixed-seed rng: with the shared module fixture the data
        depended on which tests ran before, and some draws put a kNN
        near-tie at the rank-k boundary where the kernel's quantized
        ranking legitimately picks the other neighbor (CLAUDE.md
        quantization-vs-tests lesson) — the max-pool then differs by
        more than the tolerance."""
        from pci_tpu.nn.layers import _fold_pointmlp
        from pci_tpu.ops.pallas_kernels.knnconv_tpu import knnconv_fused

        rng = np.random.default_rng(12)
        fe = pnn.FlowEmbedding(8, (16, 16, 32))
        a, b = cloud(rng, 2, 96), cloud(rng, 2, 96)
        f1 = cloud(rng, 2, 96, 6, scale=1.0)
        f2 = cloud(rng, 2, 96, 6, scale=1.0)
        variables = fe.init(jax.random.key(0), a, b, f1, f2, train=False)
        ref = fe.apply(variables, a, b, f1, f2, train=False)

        class Shim:
            def __init__(s, v): s.variables = v
        layers = _fold_pointmlp(Shim(variables), "PointMLP_0", 3)
        got = knnconv_fused(a, b, f2, f1, None, 8, layers, (), 3, 0, True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=3e-4, rtol=3e-4
        )

    def test_unaligned_key_count_pad_path(self, rng):
        """N=97 keys exercises the far-away key pad (n_pad=7); results
        must match the XLA path exactly (pad keys rank last)."""
        from pci_tpu.nn.layers import _fold_pointmlp
        from pci_tpu.ops.pallas_kernels.knnconv_tpu import knnconv_fused

        fe = pnn.FlowEmbedding(8, (16,))
        a, b = cloud(rng, 1, 64), cloud(rng, 1, 97)
        f1 = cloud(rng, 1, 64, 4, scale=1.0)
        f2 = cloud(rng, 1, 97, 4, scale=1.0)
        variables = fe.init(jax.random.key(0), a, b, f1, f2, train=False)
        ref = fe.apply(variables, a, b, f1, f2, train=False)

        class Shim:
            def __init__(s, v): s.variables = v
        layers = _fold_pointmlp(Shim(variables), "PointMLP_0", 1)
        got = knnconv_fused(a, b, f2, f1, None, 8, layers, (), 1, 0, True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=3e-4, rtol=3e-4
        )

    def test_interp_only_eps_matches_three_nn(self, rng):
        """MLP-less interp mode (eps reciprocal) == ops.three_nn_interpolate
        — the FeaturePropagationP2 route (GroupNorm MLP stays in XLA)."""
        from pci_tpu import ops
        from pci_tpu.ops.pallas_kernels.knnconv_tpu import knnconv_fused

        sub, dense = cloud(rng, 2, 48), cloud(rng, 2, 160)
        sf = cloud(rng, 2, 48, 12, scale=1.0)
        ref = ops.three_nn_interpolate(dense, sub, sf, "eps")
        got = knnconv_fused(
            dense, sub, sf, None, None, 3, (), (), 0, 0, True, True, "eps"
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5
        )

    def test_feature_propagation_parity(self, rng):
        """knnconv_fused interp mode (interpret) vs the FeaturePropagation
        XLA eval path (3-NN inverse-distance weights, clamp variant)."""
        from pci_tpu.nn.layers import _fold_pointmlp
        from pci_tpu.ops.pallas_kernels.knnconv_tpu import knnconv_fused

        fp = pnn.FeaturePropagation((24, 16))
        sub, dense = cloud(rng, 2, 48), cloud(rng, 2, 160)
        sf = cloud(rng, 2, 48, 12, scale=1.0)
        df = cloud(rng, 2, 160, 5, scale=1.0)
        variables = fp.init(
            jax.random.key(0), sub, dense, sf, df, train=False
        )
        ref = fp.apply(variables, sub, dense, sf, df, train=False)

        class Shim:
            def __init__(s, v): s.variables = v
        layers = _fold_pointmlp(Shim(variables), "PointMLP_0", 2)
        got = knnconv_fused(
            dense, sub, sf, None, df, 3, (), layers, 0, 2, True, True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=3e-4, rtol=3e-4
        )

    @pytest.mark.parametrize("mlp1", [(), (16, 24)])
    def test_setupconv_parity(self, rng, mlp1):
        """knnconv_fused (interpret) vs SetUpConv XLA eval path — both
        the empty-mlp1 identity case (set_upconv1) and the full case."""
        from pci_tpu.nn.layers import _fold_pointmlp
        from pci_tpu.ops.pallas_kernels.knnconv_tpu import knnconv_fused

        up = pnn.SetUpConv(4, mlp1, (24, 16))
        coarse, dense = cloud(rng, 2, 32), cloud(rng, 2, 128)
        cf = cloud(rng, 2, 32, 10, scale=1.0)
        df = cloud(rng, 2, 128, 5, scale=1.0)
        variables = up.init(
            jax.random.key(0), coarse, dense, cf, df, train=False
        )
        ref = up.apply(variables, coarse, dense, cf, df, train=False)

        class Shim:
            def __init__(s, v): s.variables = v
        shim = Shim(variables)
        l1 = _fold_pointmlp(shim, "conv1", len(mlp1)) if mlp1 else ()
        l2 = _fold_pointmlp(shim, "conv2", 2)
        got = knnconv_fused(
            dense, coarse, cf, None, df, 4, l1, l2, len(mlp1), 2, True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=3e-4, rtol=3e-4
        )


class TestCellsFusionRoute:
    """64k cells-route fusion kNN (VERDICT r3 item 4): segment-restricted
    knn_cells passes + budget compaction, interpreter-mode exact configs
    (full chunk coverage, bucket 2, 2 winners => no approximation)."""

    def _reference(self, combined, seg_ends, budgets, k):
        """Exact per-segment kNN + the XLA fallback's budget compaction."""
        from pci_tpu.nn.fusion import _budget_compact

        B, N, _ = combined.shape
        pos = jnp.arange(N, dtype=jnp.int32)[None, :]
        d_full = jnp.sum(
            (combined[:, :, None] - combined[:, None, :, :]) ** 2, -1
        )
        parts_r, parts_i = [], []
        start = jnp.zeros((B, 1), jnp.int32)
        qpos = jnp.broadcast_to(pos[:, :, None], (B, N, k))
        for j in range(seg_ends.shape[1]):
            end = seg_ends[:, j : j + 1]
            valid = (pos >= start) & (pos < end)
            dm = jnp.where(valid[:, None, :], d_full, jnp.inf)
            dk, ik = jax.lax.top_k(-dm, k)
            far = ~jnp.isfinite(-dk)
            ik = jnp.where(far, qpos, ik)
            nn_pts = jax.vmap(lambda p, i: p[i])(combined, ik)
            r = jnp.where(
                far[..., None], 0.0, nn_pts - combined[:, :, None, :]
            )
            parts_r.append(r)
            parts_i.append(ik.astype(jnp.int32))
            start = end
        resi = _budget_compact(parts_r, budgets, k)
        fi = _budget_compact(
            [p[..., None].astype(jnp.float32) for p in parts_i], budgets, k
        )
        return jnp.round(fi[..., 0]).astype(jnp.int32), resi

    def _run(self, rng, seg_ends, budgets, k, N=1024, B=2):
        from pci_tpu.nn.fusion import _cells_fusion_knn

        combined = cloud(rng, B, N, scale=3.0)
        idx, resi = _cells_fusion_knn(
            combined, seg_ends, budgets, k, emit_idx=True,
            chunk=256, m_chunks=8, bucket=2, winners=2, tile=128,
            interpret=True,
        )
        want_i, want_r = self._reference(combined, seg_ends, budgets, k)
        # packed-key extraction quantizes RANKING by ~2^-13 relative, so
        # near-ties may swap order WITHIN a segment's budget block; the
        # neighbor set per block is exact under these settings.  Compare
        # per-block sets, then residuals by self-consistency with idx.
        gi, wi = np.asarray(idx), np.asarray(want_i)
        bud = np.asarray(budgets)
        B = gi.shape[0]
        pts = np.asarray(combined)
        for b in range(B):
            cum = 0
            for j in range(bud.shape[1]):
                bj = int(bud[b, j])
                # extraction ranking is packed-key-quantized: a near-tie
                # at the block boundary may swap indices — compare the
                # neighbor DISTANCE multisets (exact up to quantization)
                q = pts[b][:, None, :]
                dg = np.sort(((pts[b][gi[b, :, cum:cum + bj]] - q) ** 2).sum(-1), -1)
                dr = np.sort(((pts[b][wi[b, :, cum:cum + bj]] - q) ** 2).sum(-1), -1)
                np.testing.assert_allclose(
                    dg, dr, rtol=3e-3, atol=1e-6,
                    err_msg=f"batch {b} segment {j}",
                )
                cum += bj
        nn_pts = jax.vmap(lambda p, i: p[i])(combined, idx)
        want_resi = nn_pts - combined[:, :, None, :]
        np.testing.assert_allclose(
            np.asarray(resi), np.asarray(want_resi), atol=1e-6
        )
        return combined, idx, resi

    def test_two_segments_matches_exact(self, rng):
        B, N, k = 2, 1024, 8
        seg_ends = jnp.asarray([[640, N], [320, N]], jnp.int32)
        budgets = jnp.asarray([[5, 3], [2, 6]], jnp.int32)
        self._run(rng, seg_ends, budgets, k, N=N, B=B)

    def test_three_segments_matches_exact(self, rng):
        B, N, k = 2, 768, 6
        seg_ends = jnp.asarray([[256, 512, N], [128, 640, N]], jnp.int32)
        budgets = jnp.asarray([[2, 2, 2], [1, 3, 2]], jnp.int32)
        self._run(rng, seg_ends, budgets, k, N=N, B=B)

    def test_starved_segment_emits_self_neighbors(self, rng):
        """Budget > available candidates: surplus slots must be zero
        residuals at the query's own index (flat-kernel convention)."""
        B, N, k = 1, 512, 8
        seg_ends = jnp.asarray([[4, N]], jnp.int32)  # segment A: 4 pts
        budgets = jnp.asarray([[6, 2]], jnp.int32)   # but budget 6
        combined, idx, resi = self._run(
            rng, seg_ends, budgets, k, N=N, B=B
        )
        # slots 4..5 of every query row are self-neighbors
        pos = np.arange(N)[None, :, None]
        np.testing.assert_array_equal(
            np.asarray(idx)[:, :, 4:6], np.broadcast_to(pos, (B, N, 2))[:, :, [0, 0]]
        )
        assert float(np.abs(np.asarray(resi)[:, :, 4:6]).max()) == 0.0


class TestFusionKernelWinners:
    """W-winners bucket phase of the fused fusion kNN (VERDICT r3 item 8
    lever: fewer extraction rows at equal recall).  Interpreter mode."""

    def _exact_ref(self, combined, split, k1, k):
        B, N, _ = combined.shape
        pos = jnp.arange(N, dtype=jnp.int32)[None, :]
        d_full = jnp.sum(
            (combined[:, :, None] - combined[:, None, :, :]) ** 2, -1
        )
        out = []
        for lo, hi, kk in ((0, split, k1), (split, N, k - k1)):
            valid = (pos >= lo) & (pos < hi)
            dm = jnp.where(valid[:, None, :], d_full, jnp.inf)
            _, ik = jax.lax.top_k(-dm, k)
            out.append(np.asarray(ik))
        return out

    def test_two_winners_exact_config(self, rng):
        """bucket=2 + winners=2 keeps EVERY key as a candidate.  The
        extraction RANKING is still packed-key-quantized (~2^-12 rel
        here), so a near-tie at the k-th boundary may swap in a neighbor
        whose distance matches the true k-th to quantization — assert
        distance-level correctness, not index identity."""
        from pci_tpu.ops.pallas_kernels import knn_fusion_adaptive

        B, N, k = 1, 2048, 8
        split, k1 = 1024, 5
        combined = cloud(rng, B, N, scale=3.0)
        idx, resi = knn_fusion_adaptive(
            combined, jnp.asarray([split], jnp.int32),
            jnp.asarray([k1], jnp.int32), k, 2, False, True,
            winners=2, interpret=True,
        )
        refA, refB = self._exact_ref(combined, split, k1, k)
        gi = np.asarray(idx)
        pts = np.asarray(combined)[0]

        def seg_dists(ref_idx, got_idx, kk):
            q = pts[:, None, :]
            dr = np.sort(((pts[ref_idx[0, :, :kk]] - q) ** 2).sum(-1), -1)
            dg = np.sort(((pts[got_idx] - q) ** 2).sum(-1), -1)
            np.testing.assert_allclose(dg, dr, rtol=3e-3, atol=1e-6)

        seg_dists(refA, gi[0, :, :k1], k1)
        seg_dists(refB, gi[0, :, k1:], k - k1)
        # segment membership is exact (masking is not quantized)
        assert (gi[:, :, :k1] < split).all()
        assert (gi[:, :, k1:] >= split).all()
        nn_pts = jax.vmap(lambda p, i: p[i])(combined, idx)
        np.testing.assert_allclose(
            np.asarray(resi),
            np.asarray(nn_pts - combined[:, :, None, :]), atol=1e-6,
        )

    def test_two_winners_beats_one_at_same_rows(self, rng):
        """(l=32, W=2) must not lose recall vs (l=16, W=1) — same
        extraction row count, better collision tolerance."""
        from pci_tpu.ops.pallas_kernels import knn_fusion_adaptive

        B, N, k = 1, 2048, 16
        split, k1 = 1024, 8
        # clustered cloud: collisions actually happen
        centers = rng.standard_normal((32, 3)) * 5
        pts = (
            centers[rng.integers(0, 32, N)]
            + rng.standard_normal((N, 3)) * 0.3
        ).astype(np.float32)
        combined = jnp.asarray(pts)[None]
        refA, refB = self._exact_ref(combined, split, k1, k)
        ref = np.concatenate([refA[:, :, :k1], refB[:, :, : k - k1]], -1)

        def recall(bucket, winners):
            idx = knn_fusion_adaptive(
                combined, jnp.asarray([split], jnp.int32),
                jnp.asarray([k1], jnp.int32), k, bucket, False, True,
                winners=winners, interpret=True,
            )[0]
            hits = 0
            gi = np.asarray(idx)
            for q in range(N):
                hits += len(set(gi[0, q]) & set(ref[0, q]))
            return hits / (N * k)

        r1 = recall(16, 1)
        r2 = recall(32, 2)
        assert r2 >= r1 - 0.005, (r1, r2)

    def test_far_tiny_segment_force_included(self, rng):
        """A tiny far-away segment must not be pruned out of the chunk
        scan (force-include of each segment's best chunk): its budget
        slots hold its ACTUAL points, not self-neighbor fallbacks."""
        from pci_tpu.ops.pallas_kernels import knn_fusion_cells

        B, N, k = 1, 1024, 8
        pts = (rng.standard_normal((N, 3)) * 2).astype(np.float32)
        # segment B = last 64 rows, placed far away in a tight clump
        pts[960:] = pts[960:] * 0.1 + 80.0
        combined = jnp.asarray(pts)[None]
        split = jnp.asarray([960], jnp.int32)
        k1 = jnp.asarray([5], jnp.int32)
        idx, resi = knn_fusion_cells(
            combined, split, k1, k, chunk=128, m_chunks=2, bucket=2,
            winners=2, tile=128, emit_idx=True, interpret=True,
        )
        gi = np.asarray(idx)
        # segment-B slots [5,8) must come from rows >= 960 for EVERY
        # query, including queries whose M=2 nearest chunks are all in
        # the near clump
        assert (gi[:, :, 5:] >= 960).all()
        # and they are real neighbors (nonzero residuals for far queries)
        far_resi = np.asarray(resi)[0, :960, 5:]
        assert float(np.abs(far_resi).max()) > 10.0

    def test_empty_segment_extremes_no_duplicates(self, rng):
        """split=0 / split=N (t extremes): the empty segment must not
        cause duplicate chunk scans — every emitted block is k DISTINCT
        in-segment neighbors."""
        from pci_tpu.ops.pallas_kernels import knn_fusion_cells

        B, N, k = 1, 512, 8
        combined = cloud(rng, B, N, scale=3.0)
        for split, k1 in ((0, 0), (N, k)):
            idx, resi = knn_fusion_cells(
                combined, jnp.asarray([split], jnp.int32),
                jnp.asarray([k1], jnp.int32), k, chunk=128, m_chunks=4,
                bucket=2, winners=2, tile=128, emit_idx=True,
                interpret=True,
            )
            gi = np.asarray(idx)[0]
            # all slots from the non-empty segment
            if split == 0:
                assert (gi >= 0).all() and (gi < N).all()
            # no duplicate neighbors within any query row
            for q in range(0, N, 7):
                assert len(set(gi[q])) == k, (split, q, gi[q])


class TestInterpreterKernelTwins:
    """Interpreter-mode twins for the r1/r2 kernels that previously only
    had TPU tests (VERDICT r3 weak 6: the 26 TPU-only tests can never
    gate a CPU run — these cover the kernel math on every run)."""

    def test_knn_pallas_recall_and_nearest(self, rng):
        from pci_tpu.ops.pallas_kernels.knn_tpu import knn_pallas

        q = cloud(rng, 1, 256, scale=3.0)
        p = cloud(rng, 1, 2048, scale=3.0)
        d, i = knn_pallas(q, p, 8, None, 16, True)
        dref = jnp.sum((q[:, :, None] - p[:, None]) ** 2, -1)
        _, iref = jax.lax.top_k(-dref, 8)
        i, iref = np.asarray(i), np.asarray(iref)
        assert (i[..., 0] == iref[..., 0]).all()  # nearest exact
        rec = np.mean([
            len(set(i[0, r]) & set(iref[0, r])) / 8 for r in range(256)
        ])
        assert rec >= 0.93, rec

    def test_knn_pallas_prefix_mask(self, rng):
        from pci_tpu.ops.pallas_kernels.knn_tpu import knn_pallas

        q = cloud(rng, 1, 128, scale=3.0)
        p = cloud(rng, 1, 2048, scale=3.0)
        _, i = knn_pallas(q, p, 8, jnp.asarray([700], jnp.int32), 16, True)
        assert (np.asarray(i) < 700).all()

    def test_fps_pallas_matches_greedy(self, rng):
        from pci_tpu import ops
        from pci_tpu.ops.pallas_kernels.fps_tpu import fps_pallas

        p = cloud(rng, 2, 512, scale=3.0)
        sel = np.asarray(fps_pallas(p, 32, 0, True))
        want = np.asarray(ops.fps(p, 32, 0))[:, :32]
        np.testing.assert_array_equal(sel, want)


class TestTrainableAttentionVJP:
    """Flash-style fused attention backward (attention_tpu
    vector_attention_trainable): gradients vs jax.grad of the XLA tail,
    interpreter mode."""

    def _setup(self, rng, B=1, N=300, k=4, d=16):
        f32 = np.float32
        mk = lambda *s, sc=1.0: jnp.asarray(  # noqa: E731
            rng.standard_normal(s).astype(f32) * sc)
        args = (
            mk(B, N, d), mk(B, N, k, 2 * d), mk(B, N, k, 3),
            mk(3, d, sc=0.4), mk(d, sc=0.1), mk(d, d, sc=0.4),
            mk(d, sc=0.1), mk(d, d, sc=0.4), mk(d, sc=0.1),
            mk(d, d, sc=0.4), mk(d, sc=0.1),
        )
        return args, d

    def test_grads_match_xla_tail(self, rng):
        from pci_tpu.ops.pallas_kernels.attention_tpu import (
            vector_attention_trainable,
        )

        args, d = self._setup(rng)

        def xla_tail(q, g, delta, wd0, bd0, wd1, bd1, wg0, bg0, wg1, bg1):
            pos = jnp.maximum(delta @ wd0 + bd0, 0.0) @ wd1 + bd1
            kf, vf = g[..., :d], g[..., d:]
            attn = q[:, :, None, :] - kf + pos
            attn = jnp.maximum(attn @ wg0 + bg0, 0.0) @ wg1 + bg1
            s = jax.nn.softmax(attn / jnp.sqrt(jnp.float32(d)), axis=-2)
            return jnp.sum(s * (vf + pos), axis=2)

        out_x = xla_tail(*args)
        out_k = vector_attention_trainable(*args, True)
        np.testing.assert_allclose(
            np.asarray(out_k), np.asarray(out_x), rtol=1e-5, atol=1e-5)

        cot = jnp.asarray(
            np.random.default_rng(7).standard_normal(out_x.shape)
            .astype(np.float32))
        gx = jax.grad(lambda *a: jnp.sum(xla_tail(*a) * cot),
                      argnums=tuple(range(11)))(*args)
        gk = jax.grad(
            lambda *a: jnp.sum(vector_attention_trainable(*a, True) * cot),
            argnums=tuple(range(11)))(*args)
        for name, a, b in zip(
            "q g delta wd0 bd0 wd1 bd1 wg0 bg0 wg1 bg1".split(), gx, gk
        ):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5,
                err_msg=name)

    def test_bf16_primal_cotangent_dtypes(self, rng):
        """bf16-policy callers pass bf16 q/g: cotangents must come back
        in the primal dtypes (jax enforces aval equality)."""
        from pci_tpu.ops.pallas_kernels.attention_tpu import (
            vector_attention_trainable,
        )

        args, d = self._setup(rng, N=128)
        q16 = args[0].astype(jnp.bfloat16)
        g16 = args[1].astype(jnp.bfloat16)
        rest = args[2:]
        grads = jax.grad(
            lambda q, g: jnp.sum(
                vector_attention_trainable(q, g, *rest, True)),
            argnums=(0, 1))(q16, g16)
        assert grads[0].dtype == jnp.bfloat16
        assert grads[1].dtype == jnp.bfloat16


class TestAuctionInterpreter:
    """CPU interpreter gate for the Gauss-Seidel auction kernel (was
    TPU-only; emd_auction_tpu auto-interprets off-TPU)."""

    def test_converges_near_scipy_optimum(self, rng):
        from scipy.optimize import linear_sum_assignment

        from pci_tpu.ops.pallas_kernels.auction_tpu import emd_auction_tpu

        n = 256
        a = (rng.standard_normal((n, 3))).astype(np.float32)
        b = (rng.standard_normal((n, 3)) + 0.2).astype(np.float32)
        d, idx, conv = emd_auction_tpu(
            jnp.asarray(a), jnp.asarray(b), eps=1e-3, max_passes=128
        )
        assert bool(conv)
        gi = np.asarray(idx)
        assert len(set(gi.tolist())) == n  # a permutation
        cost = float(np.asarray(d).sum())
        dm = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
        r, c = linear_sum_assignment(dm)
        opt = float(dm[r, c].sum())
        assert cost <= opt * 1.05 + 1e-6, (cost, opt)

class TestCellsFusionGrad:
    def test_grad_matches_fixed_neighbor_gather(self, rng):
        """knn_fusion_cells_grad's backward == differentiating the
        fixed-neighbor gather resi = combined[idx] - combined[:,None]."""
        from pci_tpu.ops.pallas_kernels.fusion_cells_tpu import (
            knn_fusion_cells_grad,
        )

        B, N, k = 1, 512, 8
        combined = cloud(rng, B, N, scale=3.0)
        split = jnp.asarray([256], jnp.int32)
        k1 = jnp.asarray([5], jnp.int32)
        cot = jnp.asarray(
            np.random.default_rng(3).standard_normal((B, N, k, 3))
            .astype(np.float32))

        def loss_kernel(c):
            idx, resi = knn_fusion_cells_grad(
                c, split, k1, k, 128, 4, 2, 2, 128, True)
            return jnp.sum(resi * cot)

        idx, _ = knn_fusion_cells_grad(
            combined, split, k1, k, 128, 4, 2, 2, 128, True)
        idx = jax.lax.stop_gradient(idx)

        def loss_ref(c):
            nn_pts = jax.vmap(lambda p, i: p[i])(c, idx)
            resi = nn_pts - c[:, :, None, :]
            return jnp.sum(resi * cot)

        gk = jax.grad(loss_kernel)(combined)
        gr = jax.grad(loss_ref)(combined)
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(gr), rtol=1e-5, atol=1e-6)
