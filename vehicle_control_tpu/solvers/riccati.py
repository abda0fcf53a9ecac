"""Riccati backward sweep over the block-tridiagonal KKT system.

This is the structured factorization that replaces HSL MA27's sparse LDL^T
inside IPOPT (reference: 'linear_solver: ma27', cascaded_mpc.py:57-63): the
KKT matrix of an unconstrained time-staged QP is block-tridiagonal, and the
Riccati recursion factorizes it in one backward pass with O(H (nx+nu)^3)
work and O(1) parallel depth per stage.

Kept standalone (rather than inline in al_ilqr) so that:
* the C++ native oracle (vehicle_control_tpu/native) can validate it
  block-by-block,
* the Pallas TPU kernel can swap in behind the same signature.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def riccati_backward(lz, lu, lzz, luz, luu, A, B, rho, unroll: int = 4):
    """Backward Riccati sweep.

    Args (per-stage stacked, leading axis H):
      lz (H, nx), lu (H, nu): cost gradients
      lzz (H, nx, nx), luz (H, nu, nx), luu (H, nu, nu): cost Hessian blocks
      A (H, nx, nx), B (H, nx, nu): dynamics Jacobians
      rho: scalar Levenberg-Marquardt regularization added to Quu

    Returns (kffs (H, nu), Kfbs (H, nu, nx), dV1, dV2, fail) where fail flags
    a non-PD Quu at any stage (caller should increase rho).
    """
    H, nx = lz.shape
    nu = lu.shape[-1]
    ns_range = jnp.arange(H)
    Vx0 = jnp.zeros((nx,), lz.dtype)
    Vxx0 = jnp.zeros((nx, nx), lz.dtype)

    def bstep(carry, idx):
        Vx, Vxx, dV1, dV2, fail = carry
        Qx = lz[idx] + A[idx].T @ Vx
        Qu = lu[idx] + B[idx].T @ Vx
        Qxx = lzz[idx] + A[idx].T @ Vxx @ A[idx]
        Qux = luz[idx] + B[idx].T @ Vxx @ A[idx]
        Quu = luu[idx] + B[idx].T @ Vxx @ B[idx]
        Quu = 0.5 * (Quu + Quu.T) + rho * jnp.eye(nu, dtype=Quu.dtype)

        L = jnp.linalg.cholesky(Quu)
        bad = jnp.any(jnp.isnan(L)) | jnp.any(jnp.diagonal(L) <= 0)
        L_safe = jnp.where(bad, jnp.eye(nu, dtype=Quu.dtype), L)
        rhs = jnp.concatenate([Qu[:, None], Qux], axis=1)
        sol = jax.scipy.linalg.cho_solve((L_safe, True), rhs)
        kff = -sol[:, 0]
        Kfb = -sol[:, 1:]

        Vx_n = Qx + Kfb.T @ Quu @ kff + Kfb.T @ Qu + Qux.T @ kff
        Vxx_n = Qxx + Kfb.T @ Quu @ Kfb + Kfb.T @ Qux + Qux.T @ Kfb
        Vxx_n = 0.5 * (Vxx_n + Vxx_n.T)
        dV1_n = dV1 + kff @ Qu
        dV2_n = dV2 + 0.5 * kff @ Quu @ kff
        return (Vx_n, Vxx_n, dV1_n, dV2_n, fail | bad), (kff, Kfb)

    (Vx, Vxx, dV1, dV2, fail), (kffs, Kfbs) = lax.scan(
        bstep,
        (Vx0, Vxx0, jnp.zeros((), lz.dtype), jnp.zeros((), lz.dtype), jnp.asarray(False)),
        ns_range,
        reverse=True,
        unroll=unroll,
    )
    return kffs, Kfbs, dV1, dV2, fail
