"""Serving API tests (small shapes, hermetic CPU)."""

import numpy as np

from pci_tpu.serving import Interpolator


def test_pointinet_pair_and_upsample():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((300, 4)).astype(np.float32)  # intensity col ignored
    b = rng.standard_normal((250, 3)).astype(np.float32)
    interp = Interpolator.pointinet(npoints=128)
    mid = interp(a, b, 0.5)
    assert mid.shape == (128, 3)
    frames = interp.upsample(a, b, factor=3)
    assert len(frames) == 2
    assert all(f.shape == (128, 3) for f in frames)


def test_isapci_window():
    rng = np.random.default_rng(1)
    mk = lambda: rng.standard_normal((200, 3)).astype(np.float32)
    interp = Interpolator.isapci(field=1, npoints=96, ff_out_c=16, tr_out_c=16)
    out = interp(mk(), mk(), 0.3, context=([mk()], [mk()]))
    assert out.shape == (96, 3)
    assert np.isfinite(out).all()


def test_isapci_context_required():
    rng = np.random.default_rng(2)
    mk = lambda: rng.standard_normal((64, 3)).astype(np.float32)
    interp = Interpolator.isapci(field=1, npoints=64, ff_out_c=16, tr_out_c=16)
    import pytest

    with pytest.raises(AssertionError, match="context"):
        interp(mk(), mk(), 0.5)  # field=1 but no context frames


def test_prep_branches():
    """_prep: subsample when too big, pad when too small, passthrough at
    exact size and for pre-batched [1, N, 3] input."""
    rng = np.random.default_rng(3)
    interp = Interpolator.pointinet(npoints=64)

    big = rng.standard_normal((100, 3)).astype(np.float32)
    small = rng.standard_normal((40, 5)).astype(np.float32)
    exact = rng.standard_normal((64, 3)).astype(np.float32)
    batched = exact[None]

    for cloud in (big, small, exact, batched):
        out = np.asarray(interp._prep(cloud))
        assert out.shape == (1, 64, 3)
        assert np.isfinite(out).all()
    # exact-size input must pass through unsampled
    np.testing.assert_array_equal(np.asarray(interp._prep(exact))[0], exact)
    # the pad branch keeps every original point at least once
    padded = np.asarray(interp._prep(small))[0]
    for row in small[:, :3]:
        assert (np.abs(padded - row).sum(-1) < 1e-6).any()


def test_checkpoint_compose_constructors():
    """ckpt= and flow_ckpt= loading paths against the committed trained
    checkpoints (weights are point-count independent)."""
    rng = np.random.default_rng(4)
    a = rng.standard_normal((128, 3)).astype(np.float32)
    b = a + 0.1 * rng.standard_normal((128, 3)).astype(np.float32)

    plain = Interpolator.pointinet(npoints=128)
    composed = Interpolator.pointinet(
        npoints=128,
        ckpt="results/checkpoints/pointinet_synth16k",
        flow_ckpt="results/checkpoints/flownet3d_synth16k",
    )
    # loaded weights must differ from random init...
    p0 = plain.variables["params"]["fusion"]
    p1 = composed.variables["params"]["fusion"]
    import jax

    diffs = jax.tree_util.tree_map(
        lambda x, y: float(np.abs(np.asarray(x) - np.asarray(y)).max()), p0, p1
    )
    assert max(jax.tree_util.tree_leaves(diffs)) > 1e-3
    # ...and still produce a finite interpolation
    out = composed(a, b, 0.5)
    assert out.shape == (128, 3) and np.isfinite(out).all()


def test_t_extremes_through_serving():
    """t=0 / t=1 drive the adaptive fusion budgets to k1=k / k1=0."""
    rng = np.random.default_rng(5)
    a = rng.standard_normal((96, 3)).astype(np.float32)
    b = a + 0.05 * rng.standard_normal((96, 3)).astype(np.float32)
    interp = Interpolator.pointinet(npoints=96)
    for t in (0.0, 1.0):
        out = interp(a, b, t)
        assert out.shape == (96, 3) and np.isfinite(out).all()


def test_stream_batch_matches_single_calls_and_shards():
    """stream_batch over a data mesh == per-stream single calls (modulo
    the rng key each call draws — pin keys by reusing one engine per
    path with the same seed)."""
    from pci_tpu.parallel import make_mesh

    N = 128
    rng = np.random.default_rng(0)
    clouds = [rng.standard_normal((N, 3)).astype(np.float32) * 3 for _ in range(8)]
    pairs = [(clouds[i], clouds[i + 1]) for i in range(0, 8, 2)]
    ts = [0.2, 0.4, 0.6, 0.8]

    eng1 = Interpolator.pointinet(npoints=N, seed=3)
    batched = eng1.stream_batch(pairs, ts)

    mesh = make_mesh(n_data=4, n_points=2)
    eng2 = Interpolator.pointinet(npoints=N, seed=3)
    sharded = eng2.stream_batch(pairs, ts, mesh=mesh)

    assert len(batched) == len(sharded) == 4
    for x, y in zip(batched, sharded):
        assert x.shape == (N, 3)
        np.testing.assert_allclose(x, y, rtol=1e-4, atol=1e-5)
