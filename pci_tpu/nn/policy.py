"""Mixed-precision activation policy (module-level, trace-time).

The models here are HBM-bandwidth-bound, not MXU-bound: the dominant
cost is moving ``[B, N, k, C]`` neighbor/feature tensors between matmuls
(BASELINE.md round-2 breakdown — every FlowNet3D stage is sub-ms, the
attention body is tensor traffic).  Casting *activations* to bfloat16
halves that traffic; measured on v5e it takes the standalone attention
block 5.19 -> 3.91 ms.

Policy (what is and is not cast):
  * MLP / attention activations, neighbor feature tensors — bf16.
  * Parameters — ALWAYS stored fp32 (checkpoints are dtype-agnostic);
    flax casts per-matmul via the ``dtype`` argument.
  * Geometry (point coords, offsets fed to kNN/ball/FPS, warps, model
    outputs), softmax, norm statistics, inverse-distance weights — fp32.
    Mirrors the reference's fp32 geometry contract; the |p|^2+|q|^2-2pq
    cancellation in distance kernels is catastrophic in bf16.

The active dtype is read at TRACE time: set it before ``jax.jit``
tracing (or use the scope around model init+apply).  Changing the policy
does NOT invalidate already-traced jit caches — re-jit after switching.

Default comes from ``PCI_TPU_COMPUTE_DTYPE`` (``float32`` if unset), so
CPU tests and goldens see exact fp32 unless they opt in.
"""

from __future__ import annotations

import contextlib
import os

import jax.numpy as jnp

_ALLOWED = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}

_state = {"dtype": _ALLOWED[os.environ.get("PCI_TPU_COMPUTE_DTYPE", "float32")]}


def compute_dtype():
    """The activation compute dtype (jnp.float32 | jnp.bfloat16)."""
    return _state["dtype"]


def set_compute_dtype(dtype) -> None:
    """Set the activation dtype: 'bfloat16' / 'float32' / a jnp dtype."""
    if isinstance(dtype, str):
        dtype = _ALLOWED[dtype]
    if dtype not in (jnp.float32, jnp.bfloat16):
        raise ValueError(f"unsupported compute dtype {dtype}")
    _state["dtype"] = dtype


@contextlib.contextmanager
def compute_dtype_scope(dtype):
    """Temporarily set the compute dtype (trace inside the scope)."""
    prev = _state["dtype"]
    set_compute_dtype(dtype)
    try:
        yield
    finally:
        _state["dtype"] = prev


def cast_concat(arrays, axis=-1):
    """Concatenate with every part cast to the compute dtype first.

    Used where fp32 geometry offsets join bf16 feature blocks ahead of an
    MLP: without the cast the mixed concat promotes the whole ``[B,N,k,C]``
    tensor to fp32 and the bandwidth win is lost.  Identity under the
    default fp32 policy.
    """
    dt = compute_dtype()
    return jnp.concatenate([a.astype(dt) for a in arrays], axis=axis)


def f32(x):
    """Upcast to fp32 (geometry/softmax boundary); identity on fp32."""
    return x.astype(jnp.float32)
