"""Edge-case hardening for the op layer (hermetic CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pci_tpu import ops


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(5)


def cloud(rng, B=1, N=64):
    return jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))


class TestKnnEdges:
    def test_k_equals_n(self, rng):
        p = cloud(rng, 1, 16)
        d, i = ops.knn(p, p, 16)
        # all points found, each exactly once per row
        assert all(len(set(np.asarray(i)[0, r])) == 16 for r in range(16))

    def test_knn_prefix_valid_smaller_than_k(self, rng):
        """Valid neighbors sort first; slots beyond valid_n carry the
        sentinel distance (callers consume at most valid_n slots)."""
        q = cloud(rng, 1, 8)
        p = cloud(rng, 1, 64)
        d, i = ops.knn_prefix(q, p, 8, jnp.asarray([3]))
        d, i = np.asarray(d), np.asarray(i)
        # first 3 slots: real in-prefix neighbors with finite distances
        assert set(i[0, :, :3].flatten()) <= {0, 1, 2}
        assert (d[0, :, :3] < 1e29).all()
        # remaining slots: sentinel distance
        assert (d[0, :, 3:] >= 1e29).all()

    def test_knn_prefix_valid_one(self, rng):
        q = cloud(rng, 1, 8)
        p = cloud(rng, 1, 64)
        d, i = ops.knn_prefix(q, p, 4, jnp.asarray([1]))
        assert (np.asarray(i)[0, :, 0] == 0).all()
        assert (np.asarray(d)[0, :, 1:] >= 1e29).all()

    def test_single_query(self, rng):
        q = cloud(rng, 1, 1)
        p = cloud(rng, 1, 32)
        d, i = ops.knn(q, p, 4)
        assert i.shape == (1, 1, 4)


class TestFpsEdges:
    def test_npoint_exceeds_n_repeats(self, rng):
        x = cloud(rng, 1, 8)
        idx = np.asarray(ops.fps(x, 16, 0))
        assert idx.shape == (1, 16)
        # after exhausting all 8 points, argmax of all-zero dists repeats 0
        assert set(idx[0, :8]) == set(range(8))

    def test_duplicate_points(self, rng):
        x = jnp.asarray(np.zeros((1, 32, 3), np.float32))
        idx = np.asarray(ops.fps(x, 4, 0))
        assert idx.shape == (1, 4)  # no crash on degenerate cloud


class TestBallQueryEdges:
    def test_zero_radius_self_query(self, rng):
        x = cloud(rng, 1, 32)
        idx = np.asarray(ops.ball_query(0.0, 4, x, x))
        # only the point itself is within radius 0 -> all slots repeat self
        np.testing.assert_array_equal(idx[0, :, 0], np.arange(32))
        np.testing.assert_array_equal(idx[0, :, 1], np.arange(32))

    def test_no_hits_returns_valid_indices(self, rng):
        x = cloud(rng, 1, 16)
        far = x + 1000.0
        idx = np.asarray(ops.ball_query(0.1, 4, x, far))
        assert ((idx >= 0) & (idx < 16)).all()


class TestChamferEdges:
    def test_asymmetric_sizes(self, rng):
        a = cloud(rng, 2, 100)
        b = cloud(rng, 2, 7)
        v = float(ops.chamfer_distance(a, b))
        assert np.isfinite(v) and v > 0

    def test_single_point_clouds(self, rng):
        a = cloud(rng, 1, 1)
        b = cloud(rng, 1, 1)
        want = float(jnp.sum((a - b) ** 2)) * 2
        assert float(ops.chamfer_distance(a, b)) == pytest.approx(want, rel=1e-5)


class TestPolyfitEdges:
    def test_degree_zero_is_mean(self, rng):
        T = jnp.asarray([[0.0, 1.0, 2.0]])
        Y = jnp.asarray([[[1.0], [2.0], [3.0]]])
        out = ops.polyfit_eval(T, Y, 0, jnp.asarray([5.0]))
        assert float(out[0, 0]) == pytest.approx(2.0, rel=1e-4)

    def test_duplicate_times_regularized(self, rng):
        # degenerate design matrix must not produce NaNs (Tikhonov term)
        T = jnp.asarray([[1.0, 1.0, 1.0]])
        Y = jnp.asarray(rng.standard_normal((1, 3, 4)).astype(np.float32))
        out = ops.polyfit_eval(T, Y, 1, jnp.asarray([1.0]))
        assert np.isfinite(np.asarray(out)).all()


class TestFusionEdges:
    def test_t_exactly_one(self, rng):
        """t=1: all sampled points and neighbors come from cloud2."""
        from pci_tpu.nn.fusion import PointsFusion

        fusion = PointsFusion((8,), sampling="random")
        p1 = cloud(rng, 1, 32) + 100.0  # far away
        p2 = cloud(rng, 1, 32)
        t = jnp.asarray([1.0])
        vars_ = fusion.init(
            {"params": jax.random.key(0), "sample": jax.random.key(1)},
            p1, p2, 4, t, train=False,
        )
        out = fusion.apply(
            vars_, p1, p2, 4, t, train=False, rngs={"sample": jax.random.key(2)}
        )
        assert float(jnp.abs(out).max()) < 50.0  # ignores cloud1 entirely
