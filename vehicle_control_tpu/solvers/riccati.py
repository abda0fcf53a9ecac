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


def _mm(X, Y):
    """Small-matrix product as broadcast-multiply-reduce.

    ``X @ Y`` on (..., m, k) x (..., k, n) via elementwise ops so that under
    ``vmap`` over thousands of scenarios XLA lowers to VPU broadcast+reduce
    instead of MXU ``dot_general`` calls on 10x10 operands (which pad each
    tiny matrix to the 128x128 systolic array — measured ~6x slower for the
    whole sweep at batch 1024)."""
    return jnp.sum(X[..., :, :, None] * Y[..., None, :, :], axis=-2)


def _mv(X, v):
    """(..., m, k) @ (..., k) as broadcast-multiply-reduce."""
    return jnp.sum(X * v[..., None, :], axis=-1)


def _solve2x2(a, b, d, r0, r1):
    """Solve the symmetric 2x2 system [[a, b], [b, d]] x = r in closed form.

    r0/r1 may carry trailing dims (multiple RHS).  Returns (x0, x1, bad)."""
    det = a * d - b * b
    bad = (a <= 0.0) | (det <= 0.0)
    inv_det = jnp.where(bad, 1.0, 1.0 / jnp.where(bad, 1.0, det))
    x0 = (d * r0 - b * r1) * inv_det
    x1 = (a * r1 - b * r0) * inv_det
    return x0, x1, bad


def riccati_backward(lz, lu, lzz, luz, luu, A, B, rho, unroll: int = 4):
    """Backward Riccati sweep.

    Args (per-stage stacked, leading axis H):
      lz (H, nx), lu (H, nu): cost gradients
      lzz (H, nx, nx), luz (H, nu, nx), luu (H, nu, nu): cost Hessian blocks
      A (H, nx, nx), B (H, nx, nu): dynamics Jacobians
      rho: scalar Levenberg-Marquardt regularization added to Quu

    Returns (kffs (H, nu), Kfbs (H, nu, nx), dV1, dV2, fail) where fail flags
    a non-PD Quu at any stage (caller should increase rho).

    All products are written as broadcast-reduce (see :func:`_mm`) and the
    nu=2 case solves Quu in closed form, so the whole sweep is VPU-only
    under scenario vmap — no padded tiny-matmul MXU traffic.
    """
    H, nx = lz.shape
    nu = lu.shape[-1]
    ns_range = jnp.arange(H)
    Vx0 = jnp.zeros((nx,), lz.dtype)
    Vxx0 = jnp.zeros((nx, nx), lz.dtype)

    def bstep(carry, idx):
        Vx, Vxx, dV1, dV2, fail = carry
        At = A[idx].swapaxes(-1, -2)
        Bt = B[idx].swapaxes(-1, -2)
        Qx = lz[idx] + _mv(At, Vx)
        Qu = lu[idx] + _mv(Bt, Vx)
        VxxA = _mm(Vxx, A[idx])
        Qxx = lzz[idx] + _mm(At, VxxA)
        Qux = luz[idx] + _mm(Bt, VxxA)
        Quu = luu[idx] + _mm(Bt, _mm(Vxx, B[idx]))
        Quu = 0.5 * (Quu + Quu.swapaxes(-1, -2)) + rho * jnp.eye(nu, dtype=Quu.dtype)

        if nu == 2:
            a, b, d = Quu[0, 0], Quu[0, 1], Quu[1, 1]
            rhs = jnp.concatenate([Qu[:, None], Qux], axis=1)  # (2, 1+nx)
            x0, x1, bad = _solve2x2(a, b, d, rhs[0], rhs[1])
            sol = jnp.stack([x0, x1], axis=0)
        else:
            L = jnp.linalg.cholesky(Quu)
            bad = jnp.any(jnp.isnan(L)) | jnp.any(jnp.diagonal(L) <= 0)
            L_safe = jnp.where(bad, jnp.eye(nu, dtype=Quu.dtype), L)
            rhs = jnp.concatenate([Qu[:, None], Qux], axis=1)
            sol = jax.scipy.linalg.cho_solve((L_safe, True), rhs)
        kff = -sol[:, 0]
        Kfb = -sol[:, 1:]

        Kt = Kfb.swapaxes(-1, -2)
        QuuK = _mm(Quu, Kfb)
        Quuk = _mv(Quu, kff)
        Vx_n = Qx + _mv(Kt, Quuk) + _mv(Kt, Qu) + _mv(Qux.swapaxes(-1, -2), kff)
        Vxx_n = Qxx + _mm(Kt, QuuK) + _mm(Kt, Qux) + _mm(Qux.swapaxes(-1, -2), Kfb)
        Vxx_n = 0.5 * (Vxx_n + Vxx_n.swapaxes(-1, -2))
        dV1_n = dV1 + kff @ Qu
        dV2_n = dV2 + 0.5 * kff @ Quuk
        return (Vx_n, Vxx_n, dV1_n, dV2_n, fail | bad), (kff, Kfb)

    (Vx, Vxx, dV1, dV2, fail), (kffs, Kfbs) = lax.scan(
        bstep,
        (Vx0, Vxx0, jnp.zeros((), lz.dtype), jnp.zeros((), lz.dtype), jnp.asarray(False)),
        ns_range,
        reverse=True,
        unroll=unroll,
    )
    return kffs, Kfbs, dV1, dV2, fail
