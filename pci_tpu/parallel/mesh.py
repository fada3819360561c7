"""Device mesh construction and sharding helpers.

The reference has no multi-device story at all (SURVEY.md section 2.7) —
this is new capability.  Axes:

  * ``data``   — batch-parallel axis: samples, and ISAPCInet's 4*field
    flow-pair fan-out once folded into the batch dim, are embarrassingly
    parallel.
  * ``points`` — the domain analog of sequence parallelism: shard the
    N-point axis of clouds; XLA inserts the collectives for the O(N^2)
    kernels (the ring-exchange Pallas path lives in ``parallel.ring``).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host (DCN) entry: initialize jax.distributed so that
    ``jax.devices()`` spans all hosts and ``make_mesh`` can lay the
    ``data`` axis across DCN while ``points`` stays on intra-slice ICI.

    No-args form auto-detects from the cluster environment (TPU pod
    metadata / SLURM); explicit args mirror jax.distributed.initialize.
    Safe to call once per process before any other jax API.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(n_data: int | None = None, n_points: int = 1, devices=None) -> Mesh:
    """Build a ``(data, points)`` mesh.

    Defaults to all available devices on the data axis.
    """
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_points
    use = np.asarray(devices[: n_data * n_points]).reshape(n_data, n_points)
    return Mesh(use, ("data", "points"))


def batch_sharding(mesh: Mesh, shard_points: bool = False) -> NamedSharding:
    """Sharding for ``[B, N, ...]`` cloud tensors."""
    spec = P("data", "points") if shard_points else P("data")
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_pytree(batch, mesh: Mesh, shard_points: bool = False):
    """Device-put a batch pytree: cloud tensors ([B, N, C]) sharded over
    (data[, points]), per-sample scalars ([B]) over data."""
    cloud_s = batch_sharding(mesh, shard_points)
    scalar_s = NamedSharding(mesh, P("data"))

    def place(x):
        if x.ndim >= 2:
            return jax.device_put(x, cloud_s)
        return jax.device_put(x, scalar_s)

    return jax.tree_util.tree_map(place, batch)
