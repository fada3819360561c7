"""Multi-device ring-kernel tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pci_tpu import ops
from pci_tpu.parallel import (
    chamfer_distance_sharded,
    knn_sharded,
    make_mesh,
    shard_batch_pytree,
)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(11)


def cloud(rng, B=2, N=256):
    return jnp.asarray((rng.standard_normal((B, N, 3)) * 3).astype(np.float32))


class TestRingChamfer:
    def test_matches_single_device(self, rng):
        mesh = make_mesh(n_data=2, n_points=4)
        a, b = cloud(rng), cloud(rng)
        want = float(ops.chamfer_distance(a, b))
        got = float(chamfer_distance_sharded(a, b, mesh))
        assert got == pytest.approx(want, rel=1e-5)

    def test_gradient_matches(self, rng):
        mesh = make_mesh(n_data=2, n_points=4)
        a, b = cloud(rng), cloud(rng)
        g1 = jax.grad(lambda x: ops.chamfer_distance(x, b))(a)
        g2 = jax.grad(lambda x: chamfer_distance_sharded(x, b, mesh))(a)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-6)

    def test_points_only_mesh(self, rng):
        mesh = make_mesh(n_data=1, n_points=8)
        a, b = cloud(rng, B=1), cloud(rng, B=1)
        want = float(ops.chamfer_distance(a, b))
        got = float(chamfer_distance_sharded(a, b, mesh))
        assert got == pytest.approx(want, rel=1e-5)


class TestRingKnn:
    def test_matches_single_device(self, rng):
        mesh = make_mesh(n_data=1, n_points=8)
        q, p = cloud(rng, B=1, N=256), cloud(rng, B=1, N=256)
        d_ref, i_ref = ops.knn(q, p, 8, True)
        d_got, i_got = knn_sharded(q, p, 8, mesh)
        np.testing.assert_allclose(
            np.asarray(d_got), np.asarray(d_ref), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(i_got), np.asarray(i_ref))
