"""High-level inference API: load a model + checkpoint once, synthesize
frames at arbitrary timestamps.

The reference has no serving layer (its demos rebuild everything per
script); this is the "switch from the reference and find everything"
convenience: one object, jitted once, reusable across t values and frame
pairs/windows.

Example::

    interp = Interpolator.pointinet(npoints=16384)          # random init
    interp = Interpolator.pointinet(ckpt="interp_0.51")     # or checkpoint
    mid = interp(cloud_a, cloud_b, t=0.5)                   # [N, 3]
    frames = interp.upsample(cloud_a, cloud_b, factor=5)    # 4 in-betweens
"""

from __future__ import annotations


import numpy as np

import jax
import jax.numpy as jnp

from .data.lidar import random_subsample
from .models import ISAPCInet, PointINet
from .train.checkpoints import load_flow_into, load_params


class Interpolator:
    """Jitted frame-interpolation engine around PointINet / ISAPCInet."""

    def __init__(self, model, variables, npoints: int, field: int = 0, seed: int = 0):
        self.model = model
        self.variables = variables
        self.npoints = npoints
        self.field = field
        self._rng = np.random.default_rng(seed)
        self._key = jax.random.key(seed)
        self._fwd = jax.jit(self._apply)

    # -- constructors ------------------------------------------------------
    @classmethod
    def pointinet(
        cls, npoints: int = 16384, ckpt: str | None = None,
        flow_ckpt: str | None = None, seed: int = 0,
    ) -> "Interpolator":
        model = PointINet(freeze_flow=True)
        z = jnp.zeros((1, npoints, 3), jnp.float32)
        t = jnp.asarray([0.5], jnp.float32)
        rngs = {"params": jax.random.key(seed), "sample": jax.random.key(seed + 1)}
        variables = model.init(rngs, z, z, z, z, t, train=False)
        if flow_ckpt:
            variables = load_flow_into(variables, flow_ckpt)
        if ckpt:
            variables = load_params(ckpt, variables)
        obj = cls(model, variables, npoints)
        obj._apply_kind = "pair"
        return obj

    @classmethod
    def isapci(
        cls, field: int = 2, npoints: int = 16000, ckpt: str | None = None,
        flow_ckpt: str | None = None, seed: int = 0, **model_kw,
    ) -> "Interpolator":
        model = ISAPCInet(field=field, **model_kw)
        z = jnp.zeros((1, npoints, 3), jnp.float32)
        t = jnp.asarray([0.5], jnp.float32)
        rngs = {"params": jax.random.key(seed), "sample": jax.random.key(seed + 1)}
        variables = model.init(
            rngs, [z] * field, [z, z], [z] * field, t, z, train=False
        )
        if flow_ckpt:
            variables = load_flow_into(variables, flow_ckpt)
        if ckpt:
            variables = load_params(ckpt, variables)
        obj = cls(model, variables, npoints, field=field)
        obj._apply_kind = "window"
        return obj

    # -- internals ---------------------------------------------------------
    def _apply(self, variables, args, t, key):
        if self._apply_kind == "pair":
            a, b = args
            z = jnp.zeros_like(a)
            return self.model.apply(
                variables, a, b, z, z, t, train=False, rngs={"sample": key}
            )
        forward, keys, backward = args
        z = jnp.zeros_like(keys[0])
        return self.model.apply(
            variables, forward, keys, backward, t, z,
            train=False, rngs={"sample": key},
        )

    def _prep(self, cloud):
        pts = np.asarray(cloud, np.float32)[..., :3]
        if pts.ndim == 2:
            if pts.shape[0] != self.npoints:
                pts = random_subsample(pts, self.npoints, self._rng)
            pts = pts[None]
        return jnp.asarray(pts)

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    # -- public API --------------------------------------------------------
    def __call__(self, cloud_a, cloud_b, t: float, context=None):
        """Synthesize the frame at ``t`` between two scans.

        cloud_a/cloud_b: ``[N, >=3]`` numpy or jax arrays (subsampled or
        padded to the engine's npoints automatically).
        context: for ISAPCInet — (forward_frames, backward_frames) lists.
        Returns ``[npoints, 3]`` numpy.
        """
        a, b = self._prep(cloud_a), self._prep(cloud_b)
        tt = jnp.asarray([float(t)], jnp.float32)
        if self._apply_kind == "pair":
            out = self._fwd(self.variables, (a, b), tt, self._next_key())
        else:
            fwd_frames, bwd_frames = context if context is not None else ([], [])
            forward = [self._prep(c) for c in fwd_frames]
            backward = [self._prep(c) for c in bwd_frames]
            assert len(forward) == self.field and len(backward) == self.field, (
                f"ISAPCInet field={self.field} needs {self.field} context "
                "frames each side via context=(forward, backward)"
            )
            out = self._fwd(self.variables, (forward, [a, b], backward), tt, self._next_key())
        return np.asarray(out[0])

    def upsample(self, cloud_a, cloud_b, factor: int = 5, context=None):
        """Temporal upsampling: ``factor - 1`` in-between frames
        (the reference's demo protocol, PointINet20230424/demo.py:62)."""
        return [
            self(cloud_a, cloud_b, i / factor, context)
            for i in range(1, factor)
        ]

    def stream_batch(self, pairs, ts, mesh=None):
        """One jitted forward for B independent ``(cloud_a, cloud_b)``
        streams at per-stream times ``ts`` — the aggregate-throughput
        serving shape (BASELINE.md north star: PointINet is latency-
        bound per stream, so throughput scales by running independent
        streams, one per data-mesh row).

        With ``mesh``, the stream batch is sharded over its ``data``
        axis (``len(pairs)`` must divide it); without, it's one wide
        batch on the local device.  Pair-mode engines only.

        Returns a list of ``[npoints, 3]`` numpy frames.
        """
        assert self._apply_kind == "pair", "stream_batch is pair-mode only"
        assert len(pairs) == len(ts) and pairs
        a = jnp.concatenate([self._prep(x) for x, _ in pairs], axis=0)
        b = jnp.concatenate([self._prep(y) for _, y in pairs], axis=0)
        t = jnp.asarray([float(v) for v in ts], jnp.float32)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_data = mesh.shape["data"]
            assert len(pairs) % n_data == 0, (
                f"{len(pairs)} streams do not divide the data axis "
                f"({n_data})"
            )
            data_sh = NamedSharding(mesh, P("data"))
            rep = NamedSharding(mesh, P())
            a, b, t = (jax.device_put(x, data_sh) for x in (a, b, t))
            variables = jax.device_put(self.variables, rep)
        else:
            variables = self.variables
        out = self._fwd(variables, (a, b), t, self._next_key())
        out = np.asarray(out)
        return [out[i] for i in range(len(pairs))]
