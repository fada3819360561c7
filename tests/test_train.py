"""Training-loop tests: loss decreases, freeze semantics, schedules,
multi-device sharded step on the virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pci_tpu.models import ISAPCInet, FlowNet3D
from pci_tpu.train import (
    bn_momentum_schedule,
    clipped_step_lr,
    create_train_state,
    make_interp_eval_step,
    make_interp_train_step,
    make_optimizer,
    make_sceneflow_train_step,
)

N, B, FIELD = 96, 2, 1


def make_batch(seed=0, n=N, b=B, field=FIELD):
    rng = np.random.default_rng(seed)

    def cloud():
        return jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))

    return {
        "forward": [cloud() for _ in range(field)],
        "keys": [cloud(), cloud()],
        "backward": [cloud() for _ in range(field)],
        "t": jnp.asarray(np.full((b,), 0.5, np.float32)),
        "gt": cloud(),
        "ini": jnp.zeros((b, n, 3), jnp.float32),
    }


@pytest.fixture(scope="module")
def setup():
    model = ISAPCInet(field=FIELD, ff_out_c=16, tr_out_c=16)
    batch = make_batch()
    rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}
    variables = model.init(
        rngs, batch["forward"], batch["keys"], batch["backward"],
        batch["t"], batch["ini"], train=True,
    )
    optimizer = make_optimizer(1e-3, variables["params"], freeze_subtrees=("flow",))
    state = create_train_state(
        variables["params"], variables["batch_stats"], optimizer
    )
    step = jax.jit(make_interp_train_step(model, optimizer))
    return model, optimizer, state, step, batch


class TestSchedules:
    def test_clipped_step_lr(self):
        sched = clipped_step_lr(0.01, 100, 0.9, 1e-6)
        assert float(sched(0)) == pytest.approx(0.01)
        assert float(sched(99)) == pytest.approx(0.01)
        assert float(sched(100)) == pytest.approx(0.009)
        assert float(sched(100000)) == pytest.approx(1e-6)

    def test_bn_momentum(self):
        sched = bn_momentum_schedule(0.5, 0.5, 100, 0.01)
        assert float(sched(0)) == pytest.approx(0.5)
        assert float(sched(100)) == pytest.approx(0.25)
        assert float(sched(10000)) == pytest.approx(0.01)


class TestTrainStep:
    def test_loss_decreases(self, setup):
        model, optimizer, state, step, batch = setup
        rng = jax.random.key(2)
        losses = []
        for i in range(8):
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, batch, sub, jnp.asarray(0.5))
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses

    def test_frozen_flow_params_unchanged(self, setup):
        model, optimizer, state, step, batch = setup
        flow_before = jax.tree_util.tree_leaves(state.params["flow"])
        state2, _ = step(state, batch, jax.random.key(3), jnp.asarray(0.5))
        flow_after = jax.tree_util.tree_leaves(state2.params["flow"])
        for a, b in zip(flow_before, flow_after):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # but the heads moved
        head_before = jax.tree_util.tree_leaves(state.params["outputer"])
        head_after = jax.tree_util.tree_leaves(state2.params["outputer"])
        moved = any(
            float(jnp.abs(a - b).sum()) > 0 for a, b in zip(head_before, head_after)
        )
        assert moved

    def test_remat_matches(self, setup):
        """Rematerialized step computes the same loss/gradients."""
        model, optimizer, state, step, batch = setup
        step_r = jax.jit(make_interp_train_step(model, optimizer, remat=True))
        _, m_plain = step(state, batch, jax.random.key(9), jnp.asarray(0.5))
        _, m_remat = step_r(state, batch, jax.random.key(9), jnp.asarray(0.5))
        assert float(m_remat["loss"]) == pytest.approx(
            float(m_plain["loss"]), rel=1e-5
        )

    def test_eval_step(self, setup):
        model, optimizer, state, step, batch = setup
        eval_step = jax.jit(make_interp_eval_step(model))
        cds, out = eval_step(state, batch, jax.random.key(4))
        assert cds.shape == (B,)
        assert out.shape == (B, N, 3)


class TestSceneflowStep:
    def test_supervised_and_unsupervised(self):
        rng = np.random.default_rng(0)
        model = FlowNet3D()
        batch = {
            "points1": jnp.asarray(rng.standard_normal((1, N, 3)).astype(np.float32)),
            "points2": jnp.asarray(rng.standard_normal((1, N, 3)).astype(np.float32)),
            "feats1": jnp.zeros((1, N, 3), jnp.float32),
            "feats2": jnp.zeros((1, N, 3), jnp.float32),
            "flow": jnp.asarray(rng.standard_normal((1, N, 3)).astype(np.float32)),
            "mask": jnp.ones((1, N), jnp.float32),
        }
        variables = model.init(
            jax.random.key(0), batch["points1"], batch["points2"],
            batch["feats1"], batch["feats2"], train=True,
        )
        opt = make_optimizer(1e-3, variables["params"])
        state = create_train_state(variables["params"], variables["batch_stats"], opt)
        for supervised in (True, False):
            step = jax.jit(make_sceneflow_train_step(model, opt, supervised))
            new_state, metrics = step(state, batch, jnp.asarray(0.5))
            assert np.isfinite(float(metrics["loss"]))


class TestMultiDevice:
    def test_dryrun_multichip(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        import __graft_entry__ as g

        g.dryrun_multichip(8)

    def test_data_parallel_matches_single_device(self, setup):
        """Sharded and unsharded training steps produce the same loss."""
        model, optimizer, state, step, batch = setup
        from pci_tpu.parallel import make_mesh, shard_batch_pytree
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = make_mesh(n_data=2, n_points=1)
        sharded_batch = shard_batch_pytree(batch, mesh)
        sharded_state = jax.device_put(state, NamedSharding(mesh, P()))
        _, m_sharded = step(sharded_state, sharded_batch, jax.random.key(5), jnp.asarray(0.5))
        _, m_single = step(state, batch, jax.random.key(5), jnp.asarray(0.5))
        assert float(m_sharded["loss"]) == pytest.approx(
            float(m_single["loss"]), rel=1e-4
        )


def test_freeze_params_stops_gradients():
    """freeze_params stop-grads frozen subtrees at any nesting level
    (same matching as make_optimizer), zeroing their grads at the
    source — and keeping no-VJP eval kernels routable under grad."""
    from pci_tpu.train import freeze_params

    params = {
        "flow": {"w": jnp.ones((3,))},
        "nested": {"flow": {"w": jnp.ones((2,))}, "live": jnp.ones((2,))},
        "head": {"w": jnp.ones((3,))},
    }

    def loss(p):
        p = freeze_params(p, ("flow",))
        return sum(
            jnp.sum(leaf) for leaf in jax.tree_util.tree_leaves(p)
        )

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["flow"]["w"]).sum()) == 0.0
    assert float(jnp.abs(g["nested"]["flow"]["w"]).sum()) == 0.0
    np.testing.assert_array_equal(np.asarray(g["nested"]["live"]), 1.0)
    np.testing.assert_array_equal(np.asarray(g["head"]["w"]), 1.0)
