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
