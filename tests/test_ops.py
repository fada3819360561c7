"""Unit tests for the primitive op layer vs brute-force numpy oracles."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pci_tpu import ops
from tests import reference_impls as ref


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def make_cloud(rng, B=2, N=128, C=3, scale=5.0):
    return (rng.standard_normal((B, N, C)) * scale).astype(np.float32)


class TestSquareDistance:
    def test_matches_numpy(self, rng):
        a = make_cloud(rng, 2, 64)
        b = make_cloud(rng, 2, 96)
        got = np.asarray(ops.square_distance(jnp.asarray(a), jnp.asarray(b)))
        want = ref.square_distance_np(a, b)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)

    def test_pdist2squared_channels_first(self, rng):
        a = make_cloud(rng, 2, 64)
        b = make_cloud(rng, 2, 64)
        got = np.asarray(
            ops.pdist2squared(
                jnp.asarray(a).swapaxes(-1, -2), jnp.asarray(b).swapaxes(-1, -2)
            )
        )
        want = np.maximum(ref.square_distance_np(a, b), 0.0)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


class TestKnn:
    def test_direct(self, rng):
        q = make_cloud(rng, 2, 50)
        p = make_cloud(rng, 2, 200)
        d, i = ops.knn(jnp.asarray(q), jnp.asarray(p), 8)
        dn, in_ = ref.knn_np(q, p, 8)
        np.testing.assert_allclose(np.asarray(d), dn, rtol=1e-4, atol=1e-3)
        # indices may differ on exact ties; compare gathered distances instead
        got_pts = np.take_along_axis(
            p[:, :, None, :], np.asarray(i)[..., None], axis=1
        )
        assert np.asarray(i).shape == (2, 50, 8)

    def test_tiled_matches_direct(self, rng):
        from pci_tpu.ops.knn import _knn_direct, _knn_tiled

        q = jnp.asarray(make_cloud(rng, 1, 64))
        p = jnp.asarray(make_cloud(rng, 1, 512))
        d0, i0 = _knn_direct(q, p, 16, True)
        d1, i1 = _knn_tiled(q, p, 16, 128, True)
        np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), rtol=1e-5, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))

    def test_knn_points_gather_grad(self, rng):
        q = jnp.asarray(make_cloud(rng, 1, 16))
        p = jnp.asarray(make_cloud(rng, 1, 64))

        def f(p_):
            _, _, nn = ops.knn_points(q, p_, 4)
            return jnp.sum(nn**2)

        g = jax.grad(f)(p)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0


class TestFps:
    def test_matches_sequential_oracle(self, rng):
        x = make_cloud(rng, 2, 100)
        got = np.asarray(ops.fps(jnp.asarray(x), 16, 0))
        want = ref.fps_np(x, 16, 0)
        np.testing.assert_array_equal(got, want)

    def test_prefix_property(self, rng):
        x = jnp.asarray(make_cloud(rng, 1, 80))
        full = np.asarray(ops.fps(x, 40, 0))
        small = np.asarray(ops.fps(x, 10, 0))
        np.testing.assert_array_equal(full[:, :10], small)

    def test_spread(self, rng):
        # FPS should cover space better than the first-k prefix
        x = make_cloud(rng, 1, 256)
        idx = np.asarray(ops.fps(jnp.asarray(x), 32, 0))[0]
        sel = x[0][idx]
        d = ref.square_distance_np(x, sel[None])[0]  # [N, 32]
        assert d.min(axis=-1).max() < ref.square_distance_np(x, x[0][:32][None])[
            0
        ].min(axis=-1).max()


class TestBallQuery:
    def test_matches_oracle(self, rng):
        x = make_cloud(rng, 2, 128, scale=1.0)
        centers = x[:, :16]
        got = np.asarray(ops.ball_query(0.8, 8, jnp.asarray(x), jnp.asarray(centers)))
        want = ref.ball_query_np(0.8, 8, x, centers)
        np.testing.assert_array_equal(got, want)

    def test_hits_are_in_radius_and_index_ordered(self, rng):
        x = make_cloud(rng, 1, 64, scale=1.0)
        idx = np.asarray(ops.ball_query(0.5, 4, jnp.asarray(x), jnp.asarray(x)))
        d = ref.square_distance_np(x, x)[0]
        for s in range(64):
            hits = idx[0, s]
            # every returned index is within the radius of the query
            assert (d[s, hits] <= 0.5**2 + 1e-6).all()
            # self-query always has at least one hit: itself
            assert s in hits or (d[s, hits[0]] <= 0.5**2 + 1e-6)


class TestBallPallas:
    """Interpret-mode checks of the streamed kernel (ball_tpu.py) against
    the exact XLA path — same first-K-in-index-order semantics."""

    def test_multi_scale_matches_exact(self, rng):
        from pci_tpu.ops.pallas_kernels.ball_tpu import (
            ball_query_pallas,
            finish_ball_idx,
        )

        B, N, S = 2, 512, 128
        x = jnp.asarray(make_cloud(rng, B, N, scale=1.0))
        c = jnp.asarray(make_cloud(rng, B, S, scale=1.0))
        radii, ks = (0.3, 0.6), (4, 8)
        outs = ball_query_pallas(
            x, c, jnp.asarray(radii), ks, interpret=True
        )
        for r, K, raw in zip(radii, ks, outs):
            got = np.asarray(finish_ball_idx(raw, N))
            want = np.asarray(ops.ball_query(r, K, x, c, exact=True))
            np.testing.assert_array_equal(got, want)

    def test_unaligned_shapes_padded(self, rng):
        """Real protocol sizes (16000 pts) are not tile-aligned — the
        wrapper pads keys with far rows and queries by repetition."""
        from pci_tpu.ops.pallas_kernels.ball_tpu import (
            ball_query_pallas,
            finish_ball_idx,
        )

        B, N, S = 1, 500, 100
        x = jnp.asarray(make_cloud(rng, B, N, scale=1.0))
        c = jnp.asarray(make_cloud(rng, B, S, scale=1.0))
        (raw,) = ball_query_pallas(x, c, jnp.asarray([0.5]), (8,),
                                   interpret=True)
        got = np.asarray(finish_ball_idx(raw, N))
        want = np.asarray(ops.ball_query(0.5, 8, x, c, exact=True))
        np.testing.assert_array_equal(got, want)

    def test_no_hit_and_overflow_slots(self, rng):
        from pci_tpu.ops.pallas_kernels.ball_tpu import (
            ball_query_pallas,
            finish_ball_idx,
        )

        B, N, S = 1, 256, 128
        x = jnp.asarray(make_cloud(rng, B, N, scale=1.0))
        # half the queries far away (no hits), half at the origin cluster
        c = np.asarray(make_cloud(rng, B, S, scale=0.05))
        c[0, :64] += 100.0
        c = jnp.asarray(c)
        (raw,) = ball_query_pallas(x, c, jnp.asarray([2.0]), (8,),
                                   interpret=True)
        got = np.asarray(finish_ball_idx(raw, N))
        want = np.asarray(ops.ball_query(2.0, 8, x, c, exact=True))
        np.testing.assert_array_equal(got, want)


class TestChamfer:
    def test_matches_numpy(self, rng):
        a = make_cloud(rng, 3, 100)
        b = make_cloud(rng, 3, 120)
        got = float(ops.chamfer_distance(jnp.asarray(a), jnp.asarray(b)))
        want = ref.chamfer_np(a, b)
        assert got == pytest.approx(want, rel=1e-4)

    def test_tiled_matches_direct(self, rng):
        from pci_tpu.ops.chamfer import _min_sqdist_direct, _min_sqdist_tiled

        a = jnp.asarray(make_cloud(rng, 1, 64))
        b = jnp.asarray(make_cloud(rng, 1, 512))
        i0 = _min_sqdist_direct(a, b)
        i1 = _min_sqdist_tiled(a, b, 128)
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))

    def test_zero_for_identical(self, rng):
        a = jnp.asarray(make_cloud(rng, 2, 64))
        assert float(ops.chamfer_distance(a, a)) == pytest.approx(0.0, abs=1e-5)

    def test_grad(self, rng):
        a = jnp.asarray(make_cloud(rng, 1, 32))
        b = jnp.asarray(make_cloud(rng, 1, 32))
        g = jax.grad(lambda x: ops.chamfer_distance(x, b))(a)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0

    def test_channels_first_wrapper(self, rng):
        a = make_cloud(rng, 2, 50)
        b = make_cloud(rng, 2, 50)
        got = float(
            ops.chamfer_loss_cf(
                jnp.asarray(a).swapaxes(-1, -2), jnp.asarray(b).swapaxes(-1, -2)
            )
        )
        assert got == pytest.approx(ref.chamfer_np(a, b), rel=1e-4)


class TestInterpolate:
    @pytest.mark.parametrize("mode", ["clamp", "eps"])
    def test_matches_numpy(self, rng, mode):
        q = make_cloud(rng, 2, 64)
        r = make_cloud(rng, 2, 16)
        f = rng.standard_normal((2, 16, 8)).astype(np.float32)
        got = np.asarray(
            ops.three_nn_interpolate(
                jnp.asarray(q), jnp.asarray(r), jnp.asarray(f), mode
            )
        )
        want = ref.three_nn_interp_np(q, r, f, mode)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    def test_exact_at_ref_points(self, rng):
        r = make_cloud(rng, 1, 32)
        f = rng.standard_normal((1, 32, 4)).astype(np.float32)
        out = np.asarray(
            ops.three_nn_interpolate(jnp.asarray(r), jnp.asarray(r), jnp.asarray(f))
        )
        np.testing.assert_allclose(out, f, rtol=1e-4, atol=1e-4)


class TestEmd:
    def test_near_optimal_vs_scipy(self, rng):
        from scipy.optimize import linear_sum_assignment

        a = make_cloud(rng, 1, 64, scale=1.0)[0]
        b = make_cloud(rng, 1, 64, scale=1.0)[0]
        dist, assign, converged = ops.emd_assignment_dist(
            jnp.asarray(a), jnp.asarray(b), eps=1e-4, iters=4096
        )
        got = float(jnp.sum(dist))
        D = ref.square_distance_np(a[None], b[None])[0]
        ri, ci = linear_sum_assignment(D)
        want = float(D[ri, ci].sum())
        assert bool(converged)
        assert got <= want * 1.05 + 1e-3
        assert got >= want - 1e-3  # can't beat the optimum
        # assignment must be a permutation
        assert len(set(np.asarray(assign).tolist())) == 64

    def test_identical_clouds_zero(self, rng):
        a = make_cloud(rng, 1, 32, scale=1.0)[0]
        dist, assign, _ = ops.emd_assignment_dist(
            jnp.asarray(a), jnp.asarray(a), eps=1e-5, iters=4096
        )
        assert float(jnp.sum(dist)) == pytest.approx(0.0, abs=1e-4)

    def test_metric_scale(self, rng):
        a = jnp.asarray(make_cloud(rng, 2, 32, scale=1.0))
        v = float(ops.emd(a, a, eps=1e-5, iters=1024))
        assert v == pytest.approx(0.0, abs=1e-3)

    def test_sparse_matches_scipy_at_1024(self, rng):
        """kNN-restricted auction: same n*eps certificate at 1024 pts."""
        from scipy.optimize import linear_sum_assignment

        a = make_cloud(rng, 1, 1024, scale=1.0)[0]
        b = (a + 0.05 * rng.standard_normal((1024, 3))).astype(np.float32)
        dist, assign, converged = ops.emd_assignment_sparse(
            jnp.asarray(a), jnp.asarray(b), eps=1e-5, iters=16384, k=16
        )
        got = float(jnp.sum(dist))
        D = ref.square_distance_np(a[None], b[None])[0]
        ri, ci = linear_sum_assignment(D)
        want = float(D[ri, ci].sum())
        assert bool(converged)
        assert got <= want * 1.03 + 1e-3
        assert got >= want - 1e-3
        assert len(set(np.asarray(assign).tolist())) == 1024

    def test_sparse_independent_clouds(self, rng):
        """Independent (non-drifted) clouds need the validation/expansion
        rounds — the optimal partner is often outside the initial kNN."""
        from scipy.optimize import linear_sum_assignment

        a = make_cloud(rng, 1, 256, scale=1.0)[0]
        b = make_cloud(rng, 1, 256, scale=1.0)[0]
        dist, _, converged = ops.emd_assignment_sparse(
            jnp.asarray(a), jnp.asarray(b), eps=1e-4, iters=16384,
            k=16, rounds=16,
        )
        got = float(jnp.sum(dist))
        D = ref.square_distance_np(a[None], b[None])[0]
        ri, ci = linear_sum_assignment(D)
        want = float(D[ri, ci].sum())
        assert bool(converged)
        assert got <= want * 1.05 + 1e-3
        assert got >= want - 1e-3

    def test_sparse_grad_fixed_assignment(self, rng):
        a = jnp.asarray(make_cloud(rng, 1, 128, scale=1.0)[0])
        b = jnp.asarray(make_cloud(rng, 1, 128, scale=1.0)[0])

        def f(x):
            d, _, _ = ops.emd_assignment_sparse(x, b, 1e-3, 4096, 16, 8)
            return jnp.sum(d)

        g = jax.grad(f)(a)
        assert np.isfinite(np.asarray(g)).all()

    def test_grad_fixed_assignment(self, rng):
        a = jnp.asarray(make_cloud(rng, 1, 16, scale=1.0)[0])
        b = jnp.asarray(make_cloud(rng, 1, 16, scale=1.0)[0])

        def f(x):
            d, _, _ = ops.emd_assignment_dist(x, b, 1e-3, 512)
            return jnp.sum(d)

        g = jax.grad(f)(a)
        assert np.isfinite(np.asarray(g)).all()


class TestPolyfit:
    def test_matches_numpy_polyfit(self, rng):
        B, F, N, deg = 2, 7, 20, 3
        T = np.sort(rng.uniform(-3, 3, (B, F)).astype(np.float32), axis=1)
        Y = rng.standard_normal((B, F, N)).astype(np.float32)
        t = rng.uniform(-1, 1, (B,)).astype(np.float32)
        got = np.asarray(ops.polyfit_eval(jnp.asarray(T), jnp.asarray(Y), deg, jnp.asarray(t)))
        want = np.stack(
            [
                np.polyval(np.polyfit(T[b], Y[b], deg), t[b])
                for b in range(B)
            ]
        )
        np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-2)

    def test_exact_through_points(self, rng):
        # degree F-1 polynomial passes through all sample points
        B, F, N = 1, 4, 8
        T = np.linspace(-1, 1, F)[None].repeat(B, 0).astype(np.float32)
        Y = rng.standard_normal((B, F, N)).astype(np.float32)
        t = T[:, 1]
        got = np.asarray(ops.polyfit_eval(jnp.asarray(T), jnp.asarray(Y), F - 1, jnp.asarray(t)))
        np.testing.assert_allclose(got, Y[:, 1], rtol=1e-3, atol=1e-3)

    def test_xyz_wrapper(self, rng):
        B, F, N = 2, 5, 16
        T = np.linspace(0, 1, F)[None].repeat(B, 0).astype(np.float32)
        trajs = rng.standard_normal((B, F, N, 3)).astype(np.float32)
        t = np.full((B,), 0.5, np.float32)
        out = ops.polyfit_eval_xyz(jnp.asarray(T), jnp.asarray(trajs), 2, jnp.asarray(t))
        assert out.shape == (B, N, 3)


class TestGather:
    def test_index_points(self, rng):
        pts = make_cloud(rng, 2, 32, C=5)
        idx = rng.integers(0, 32, (2, 7, 3))
        got = np.asarray(ops.index_points(jnp.asarray(pts), jnp.asarray(idx)))
        want = np.stack([pts[b][idx[b]] for b in range(2)])
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("method", ["scatter", "sort"])
    def test_scatter_add_rows(self, rng, method):
        from pci_tpu.ops.gather import scatter_add_rows

        B, Q, N, C = 3, 257, 41, 3
        # heavy duplication (the kNN-transpose regime) + some empty rows
        idx = rng.integers(0, N - 5, (B, Q)).astype(np.int32)
        g = rng.normal(size=(B, Q, C)).astype(np.float32)
        got = np.asarray(
            scatter_add_rows(jnp.asarray(idx), jnp.asarray(g), N,
                             method=method))
        want = np.zeros((B, N, C), np.float32)
        for b in range(B):
            np.add.at(want[b], idx[b], g[b])
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_scatter_add_rows_env_route(self, rng, monkeypatch):
        from pci_tpu.ops.gather import scatter_add_rows

        idx = jnp.asarray(rng.integers(0, 8, (1, 64)).astype(np.int32))
        g = jnp.asarray(rng.normal(size=(1, 64, 3)).astype(np.float32))
        monkeypatch.setenv("PCI_TPU_KNN_BWD", "sort")
        a = np.asarray(scatter_add_rows(idx, g, 8))
        b = np.asarray(scatter_add_rows(idx, g, 8, method="scatter"))
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


class TestSinkhornEmd:
    @pytest.mark.parametrize("n", [256, 1024])
    def test_within_5pct_of_exact(self, rng, n):
        """Eval-grade accuracy: annealed Sinkhorn + feasible-plan rounding
        lands within 5% of the exact assignment EMD (VERDICT item 6)."""
        from scipy.optimize import linear_sum_assignment

        a = make_cloud(rng, 1, n, scale=1.0)
        # realistic eval pair: same scene, small drift
        b = a + 0.05 * rng.standard_normal(a.shape).astype(np.float32)
        got = float(ops.sinkhorn_emd(jnp.asarray(a), jnp.asarray(b)))
        D = ref.square_distance_np(a[0][None], b[0][None])[0]
        ri, ci = linear_sum_assignment(D)
        exact = 36.0 * D[ri, ci].mean()
        # rounded primal cost: a true upper bound, within 5%
        assert exact * 0.999 <= got <= exact * 1.05, (got, exact)

    def test_within_5pct_independent_clouds(self, rng):
        from scipy.optimize import linear_sum_assignment

        a = make_cloud(rng, 1, 256, scale=1.0)
        b = make_cloud(rng, 1, 256, scale=1.0)
        got = float(ops.sinkhorn_emd(jnp.asarray(a), jnp.asarray(b)))
        D = ref.square_distance_np(a[0][None], b[0][None])[0]
        ri, ci = linear_sum_assignment(D)
        exact = 36.0 * D[ri, ci].mean()
        assert exact * 0.999 <= got <= exact * 1.05, (got, exact)

    def test_identical_clouds_near_zero(self, rng):
        a = jnp.asarray(make_cloud(rng, 1, 32, scale=1.0))
        v = float(ops.sinkhorn_emd(a, a))
        # rounding + tiny final eps leave only a small positive floor
        assert v < 36.0 * 0.01


class TestKnnSelfResi:
    def test_matches_knn_plus_gather(self, rng):
        from pci_tpu import ops

        pts = jnp.asarray(rng.standard_normal((2, 256, 3)).astype(np.float32))
        idx, resi = ops.knn_self_resi(pts, 8)
        _, i_ref = ops.knn(pts, pts, 8)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(i_ref))
        nn = np.asarray(ops.index_points(pts, idx))
        np.testing.assert_allclose(
            np.asarray(resi), nn - np.asarray(pts)[:, :, None, :], atol=1e-6
        )
        # self is always slot 0 with zero residual
        assert (np.asarray(idx)[..., 0] == np.arange(256)[None]).all()
        np.testing.assert_allclose(np.asarray(resi)[..., 0, :], 0.0, atol=1e-6)


class TestMortonCells:
    """CPU-side helpers of the cell-pruned kNN kernel
    (ops/pallas_kernels/knn_cells_tpu.py)."""

    def test_morton_codes_locality(self, rng):
        from pci_tpu.ops.pallas_kernels.knn_cells_tpu import morton_codes

        pts = jnp.asarray(rng.uniform(-10, 10, (2, 512, 3)).astype(np.float32))
        codes = np.asarray(morton_codes(pts))
        assert codes.min() >= 0  # int32-positive (30-bit codes)
        # points quantized to the same cell share a code
        same = jnp.tile(pts[:, :1], (1, 4, 1))
        c2 = np.asarray(morton_codes(same))
        assert (c2 == c2[:, :1]).all()
        # sorted-by-code neighbors are spatially closer than random pairs
        order = np.argsort(codes[0])
        sorted_pts = np.asarray(pts[0])[order]
        adj = np.linalg.norm(np.diff(sorted_pts, axis=0), axis=1).mean()
        rand = np.linalg.norm(
            sorted_pts - sorted_pts[rng.permutation(512)], axis=1
        ).mean()
        assert adj < 0.5 * rand

    def test_sort_chunks_and_lower_bounds(self, rng):
        from pci_tpu.ops.pallas_kernels.knn_cells_tpu import (
            _box_lb,
            _chunk_boxes,
            _sort_by_morton,
        )

        pts = jnp.asarray(rng.uniform(-5, 5, (1, 300, 3)).astype(np.float32))
        sorted_pts, perm = _sort_by_morton(pts, n_pad=212)  # pad to 2 x 256
        assert sorted_pts.shape == (1, 512, 3) and perm.shape == (1, 512)
        # permutation covers all original rows; padding ids == N
        assert set(np.asarray(perm[0, :300])) == set(range(300))
        assert (np.asarray(perm[0, 300:]) == 300).all()
        lo, hi = _chunk_boxes(sorted_pts, 256)
        assert (np.asarray(lo) <= np.asarray(hi)).all()
        lb = np.asarray(_box_lb(lo, hi, lo, hi))  # chunk-vs-self grid
        assert lb.shape == (1, 2, 2)
        assert (np.diag(lb[0]) == 0).all()  # self lower bound is 0
        # lower bound never exceeds any true pairwise distance
        d01 = ((np.asarray(sorted_pts[0, :256, None])
                - np.asarray(sorted_pts[0, None, 256:])) ** 2).sum(-1)
        assert lb[0, 0, 1] <= d01.min() + 1e-4
