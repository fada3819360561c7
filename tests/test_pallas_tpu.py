"""Pallas kernel tests — require real TPU hardware (skipped on CPU CI).

Run manually: JAX_PLATFORMS=axon python -m pytest tests/test_pallas_tpu.py
(or any TPU-backed python; the hermetic CPU conftest pins these to skip).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs TPU hardware"
)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


@requires_tpu
class TestKnnPallas:
    def test_recall_and_nearest_exactness(self, rng):
        from pci_tpu import ops
        from pci_tpu.ops.pallas_kernels import knn_pallas

        q = jnp.asarray(rng.standard_normal((2, 500, 3)).astype(np.float32) * 5)
        p = jnp.asarray(rng.standard_normal((2, 3000, 3)).astype(np.float32) * 5)
        d_ref, i_ref = ops.knn(q, p, 16, True)
        d_pal, i_pal = knn_pallas(q, p, 16)
        d_ref, d_pal = np.asarray(d_ref), np.asarray(d_pal)
        i_ref, i_pal = np.asarray(i_ref), np.asarray(i_pal)
        # nearest neighbor is exact under bucketing
        assert (i_ref[..., 0] == i_pal[..., 0]).all()
        np.testing.assert_allclose(d_ref[..., 0], d_pal[..., 0], atol=1e-3)
        recall = np.mean(
            [
                len(set(i_pal[b, i]) & set(i_ref[b, i])) / 16
                for b in range(2)
                for i in range(500)
            ]
        )
        assert recall > 0.93

    def test_prefix_masking(self, rng):
        from pci_tpu.ops.pallas_kernels import knn_pallas

        q = jnp.asarray(rng.standard_normal((1, 8192, 3)).astype(np.float32))
        p = jnp.asarray(rng.standard_normal((1, 8192, 3)).astype(np.float32))
        _, idx = knn_pallas(q, p, 8, jnp.asarray([4000]))
        assert (np.asarray(idx) < 4000).all()


@requires_tpu
class TestFpsPallas:
    def test_matches_fori_loop(self, rng):
        import importlib

        from pci_tpu.ops.pallas_kernels import fps_pallas

        fps_mod = importlib.import_module("pci_tpu.ops.fps")
        x = jnp.asarray(rng.standard_normal((2, 4000, 3)).astype(np.float32) * 10)
        i_ref = np.asarray(fps_mod.fps(x, 64, 0))  # below pallas threshold
        i_pal = np.asarray(fps_pallas(x, 64, 0))
        np.testing.assert_array_equal(i_ref, i_pal)
