"""Batched polynomial trajectory fitting — PolyPCI's core op, on-device.

The reference drops to host numpy per sample (``np.polyfit`` +
sklearn PolynomialFeatures, /root/reference/PolyPCI/Models/Models_V1.py:116-124,
191-219), a GPU->CPU->GPU round trip per batch.  Here the whole thing is a
batched Vandermonde least-squares solve on the MXU: one ``[F, d+1]`` design
matrix per sample, ``N`` right-hand sides solved simultaneously.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _vandermonde(x: jax.Array, degree: int) -> jax.Array:
    """``[F] -> [F, degree+1]`` with columns x^degree ... x^0 (np.polyfit order)."""
    powers = jnp.arange(degree, -1, -1, dtype=x.dtype)
    return x[:, None] ** powers[None, :]


@functools.partial(jax.jit, static_argnums=(2,))
def polyfit_eval(T: jax.Array, Y: jax.Array, degree: int, t: jax.Array):
    """Fit degree-``degree`` polynomials through trajectories and evaluate.

    Args:
      T: ``[B, F]`` sample times (the reference's ``T_list``).
      Y: ``[B, F, N]`` trajectory values (``N`` independent trajectories
        per sample — e.g. one spatial axis of every point).
      degree: polynomial degree (static).
      t: ``[B]`` query times.

    Returns:
      ``[B, N]`` fitted values at ``t``.

    Equivalent to per-sample ``np.polyval(np.polyfit(T, Y, degree), t)``;
    solved via normal equations with a small Tikhonov term for stability
    (F is tiny — 2*field+1 <= 7 — so this is exact to fp32 noise).
    """

    def one(T_i, Y_i, t_i):
        # affine-rescale times to [-1, 1]: same polynomial space, far
        # better Gram conditioning in fp32
        lo, hi = jnp.min(T_i), jnp.max(T_i)
        mid = 0.5 * (lo + hi)
        half = jnp.maximum(0.5 * (hi - lo), 1e-6)
        u = (T_i - mid) / half
        V = _vandermonde(u, degree)  # [F, d+1]
        # geometry output — keep the MXU in full fp32
        hi_mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
        G = hi_mm(V.T, V) + 1e-7 * jnp.eye(degree + 1, dtype=V.dtype)
        rhs = hi_mm(V.T, Y_i)  # [d+1, N]
        coeffs = jnp.linalg.solve(G, rhs)  # [d+1, N]
        q = _vandermonde(((t_i - mid) / half)[None], degree)[0]  # [d+1]
        return hi_mm(q, coeffs)  # [N]

    return jax.vmap(one)(T, Y, t)


@functools.partial(jax.jit, static_argnums=(2,))
def polyfit_eval_xyz(T: jax.Array, trajs: jax.Array, degree: int, t: jax.Array):
    """Fit all three axes at once.

    Args:
      T: ``[B, F]`` times.
      trajs: ``[B, F, N, 3]`` per-point trajectories.
      degree: polynomial degree.
      t: ``[B]`` query times.

    Returns:
      ``[B, N, 3]`` interpolated cloud.
    """
    B, F, N, C = trajs.shape
    flat = trajs.reshape(B, F, N * C)
    out = polyfit_eval(T, flat, degree, t)
    return out.reshape(B, N, C)
