"""Shared fixed-seed model forward cases for golden-output pinning.

Used by tests/test_golden.py (assert) and ``python -m tests.gen_golden``
(regenerate tests/golden/model_outputs.npz after an INTENTIONAL numeric
change — the diff then documents the change for review).

Mirrors the reference's de-facto practice of committing result artifacts
(SURVEY.md §4); here the artifact pins every model family's forward pass
so a silent numeric regression (e.g. a kernel change reordering neighbors)
breaks a test instead of shipping.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

B, N = 1, 96


def _clouds(seed, count, c=3):
    rng = np.random.default_rng(seed)
    return [
        jnp.asarray((rng.standard_normal((B, N, c)) * 2).astype(np.float32))
        for _ in range(count)
    ]


def _z():
    return jnp.zeros((B, N, 3), jnp.float32)


def model_outputs():
    """name -> forward output [B, N, 3] for fixed seeds and tiny clouds."""
    from pci_tpu.models import (
        FlowNet3D,
        ISAPCInet,
        ISAPCInetAsym,
        PointINet,
        PointINet2,
        PolyPCI,
    )

    out = {}

    x1, x2 = _clouds(1, 2)
    net = FlowNet3D()
    vars_ = net.init(jax.random.key(0), x1, x2, _z(), _z(), train=False)
    out["flownet3d"] = net.apply(vars_, x1, x2, _z(), _z(), train=False)

    p1, p2 = _clouds(2, 2)
    t = jnp.asarray([0.4], jnp.float32)
    net = PointINet(freeze_flow=True)
    rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}
    vars_ = net.init(rngs, p1, p2, _z(), _z(), t, train=False)
    out["pointinet"] = net.apply(
        vars_, p1, p2, _z(), _z(), t, train=False,
        rngs={"sample": jax.random.key(2)},
    )

    f1, k1, k2, b1 = _clouds(3, 4)
    net = ISAPCInet(field=1, ff_out_c=32, tr_out_c=32)
    vars_ = net.init(rngs, [f1], [k1, k2], [b1], t, _z(), train=False)
    out["isapci_f1"] = net.apply(
        vars_, [f1], [k1, k2], [b1], t, _z(), train=False,
        rngs={"sample": jax.random.key(2)},
    )

    f1, k, b1 = _clouds(4, 3)
    net = ISAPCInetAsym(forward_field=1, backward_field=1)
    vars_ = net.init(jax.random.key(0), [f1], k, [b1], t, _z(), train=False)
    out["isapci_asym"] = net.apply(vars_, [f1], k, [b1], t, _z(), train=False)

    f1, k1, k2, b1 = _clouds(5, 4)
    net = PointINet2(field=1)
    vars_ = net.init(rngs, [f1], [k1, k2], [b1], t, _z(), train=False)
    out["pointinet2"] = net.apply(
        vars_, [f1], [k1, k2], [b1], t, _z(), train=False,
        rngs={"sample": jax.random.key(2)},
    )

    f1, f2, k, b1, b2 = _clouds(6, 5)
    net = PolyPCI(field=2, degree=2)
    T = jnp.asarray([[0.0, -1.0, 1.0, -2.0, 2.0]], jnp.float32)
    vars_ = net.init(
        jax.random.key(0), [f1, f2], k, [b1, b2], t, T, _z(), train=False
    )
    out["polypci"] = net.apply(
        vars_, [f1, f2], k, [b1, b2], t, T, _z(), train=False
    )

    return {name: np.asarray(v) for name, v in out.items()}
