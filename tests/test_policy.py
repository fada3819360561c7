"""bf16 activation-policy tests (CPU; the TPU speed claim lives in
benchmarks and tests/test_pallas_tpu.py).

Contract (pci_tpu/nn/policy.py): params always fp32, model outputs
always fp32, geometry/softmax/norm-stats fp32; only activations ride
bf16.  The accuracy gate: bf16 outputs stay within a small CD drift of
the fp32 path on the same weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pci_tpu import ops
from pci_tpu.nn import policy


def _clouds(n=512, seed=0):
    rng = np.random.default_rng(seed)
    a = jnp.asarray(rng.standard_normal((1, n, 3)).astype(np.float32) * 5)
    b = a + 0.3 * jnp.asarray(rng.standard_normal((1, n, 3)).astype(np.float32))
    return a, b


def test_policy_default_fp32():
    assert policy.compute_dtype() == jnp.float32
    with policy.compute_dtype_scope("bfloat16"):
        assert policy.compute_dtype() == jnp.bfloat16
    assert policy.compute_dtype() == jnp.float32


def test_cast_concat_identity_under_fp32():
    x = jnp.ones((2, 3), jnp.float32)
    y = policy.cast_concat([x, 2 * x])
    assert y.dtype == jnp.float32 and y.shape == (2, 6)


def test_pointinet_bf16_params_fp32_outputs_fp32_and_cd_close():
    from pci_tpu.models import PointINet

    p1, p2 = _clouds()
    z = jnp.zeros_like(p1)
    t = jnp.asarray([0.5], jnp.float32)
    rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}

    model = PointINet(freeze_flow=True)
    variables = model.init(rngs, p1, p2, z, z, t, train=False)

    def run():
        return model.apply(
            variables, p1, p2, z, z, t, train=False,
            rngs={"sample": jax.random.key(7)},
        )

    out32 = run()
    with policy.compute_dtype_scope("bfloat16"):
        # params created under a bf16 policy must still be fp32
        vars16 = model.init(rngs, p1, p2, z, z, t, train=False)
        leaves = jax.tree_util.tree_leaves(vars16["params"])
        assert all(l.dtype == jnp.float32 for l in leaves)
        out16 = run()  # same fp32 weights, bf16 activations

    assert out16.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(out16)))
    # same-weights output drift: the fused clouds must be nearly identical
    cd = float(ops.chamfer_distance(out16, out32))
    assert cd < 5e-3, cd
    # and both must interpolate (beat staying on an input cloud is not
    # guaranteed untrained; just pin that bf16 doesn't collapse the cloud)
    spread32 = float(jnp.std(out32))
    spread16 = float(jnp.std(out16))
    assert abs(spread16 - spread32) / spread32 < 0.05


def test_isapci_bf16_grad_train_step_finite():
    """Training under bf16: grads flow, BN stats stay fp32-finite."""
    from pci_tpu.models import ISAPCInet

    p1, p2 = _clouds(256)
    z = jnp.zeros_like(p1)
    t = jnp.asarray([0.4], jnp.float32)
    rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}

    with policy.compute_dtype_scope("bfloat16"):
        model = ISAPCInet(field=1, ff_out_c=16, tr_out_c=16)
        variables = model.init(
            rngs, [p1], [p1, p2], [p2], t, z, train=True
        )

        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                [p1], [p1, p2], [p2], t, z,
                train=True, momentum=0.1, rngs={"sample": jax.random.key(2)},
                mutable=["batch_stats"],
            )
            return ops.chamfer_distance(out, 0.5 * (p1 + p2)), updates

        (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"]
        )

    assert np.isfinite(float(loss))
    gleaves = jax.tree_util.tree_leaves(grads)
    assert all(l.dtype == jnp.float32 for l in gleaves)
    assert any(float(jnp.max(jnp.abs(l))) > 0 for l in gleaves)
    sleaves = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert all(l.dtype == jnp.float32 for l in sleaves)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in sleaves)


def test_transformer_bf16_attn_softmax_fp32():
    from pci_tpu.nn import TransformerLayer

    xyz, _ = _clouds(256)
    feats = jnp.tile(xyz, (1, 1, 8))  # [1,256,24]
    with policy.compute_dtype_scope("bfloat16"):
        layer = TransformerLayer(d_model=32, k=8)
        variables = layer.init(jax.random.key(0), xyz, feats)
        out, attn = layer.apply(variables, xyz, feats)
    assert out.dtype == jnp.float32
    assert attn.dtype == jnp.float32  # softmax boundary is fp32
    s = jnp.sum(attn, axis=-2)
    assert bool(jnp.all(jnp.abs(s - 1.0) < 1e-3))


def test_train_cli_compute_dtype_flag():
    """--compute_dtype on the shared train flags drives nn.policy
    (VERDICT r3 item 6: bf16 training must be reachable from the CLI)."""
    import argparse

    from pci_tpu.cli.common import add_common_train_flags, apply_compute_dtype
    from pci_tpu.nn import policy

    p = argparse.ArgumentParser()
    add_common_train_flags(p)
    args = p.parse_args(["--compute_dtype", "bfloat16"])
    try:
        apply_compute_dtype(args)
        assert policy.compute_dtype() == jnp.bfloat16
    finally:
        policy.set_compute_dtype("float32")
