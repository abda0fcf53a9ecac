"""Horizon-parallel Riccati sweep via ``lax.associative_scan``.

The sequential backward recursion (solvers.riccati) has O(H) serial depth —
irrelevant for the batched throughput path (thousands of scenarios keep the
VPU busy at every stage) but the dominant latency term for single-scenario
serving.  This module computes the same value functions in O(log H) parallel
depth using the conditional-value-function composition of Särkkä &
García-Fernández ("Temporal Parallelization of Dynamic Programming and
Linear Quadratic Control", IEEE TAC 2023): each stage's partial value
function is a 5-tuple element

    e = (A, b, C, eta, J)

closed under an associative combine; a suffix ``associative_scan`` yields
every cost-to-go (Vx_k, Vxx_k) at once, after which the per-stage gain
extraction is embarrassingly parallel (vmapped, identical math to the
sequential sweep — same closed-form 2x2 Quu solve, same PD failure flag).

Cross terms (luz) and linear costs are folded by completing the square in u;
the LM regularization rho enters the per-stage control cost R = luu + rho*I,
which is exactly equivalent to the sequential sweep's "rho on Quu
participates downstream" convention (Quu = R + B'Vxx B).

Equivalent to ``riccati.riccati_backward`` to fp tolerance
(tests/test_riccati_parallel.py); used by the latency bench mode.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from vehicle_control_tpu.solvers.riccati import _mm, _mv, _solve2x2


def _inv2x2(M, rho_floor):
    """Closed-form symmetric 2x2 inverse with PD flag."""
    a, b, d = M[..., 0, 0], M[..., 0, 1], M[..., 1, 1]
    det = a * d - b * b
    bad = (a <= 0.0) | (det <= 0.0)
    safe = jnp.where(bad, 1.0, det)
    inv_det = jnp.where(bad, 1.0, 1.0 / safe)
    row0 = jnp.stack([d * inv_det, -b * inv_det], axis=-1)
    row1 = jnp.stack([-b * inv_det, a * inv_det], axis=-1)
    return jnp.stack([row0, row1], axis=-2), bad


def _combine(e1, e2):
    """Associative composition of conditional value functions.

    ``e1`` spans the earlier interval, ``e2`` the later.  Solves are (nx,nx).
    """
    A1, b1, C1, eta1, J1 = e1
    A2, b2, C2, eta2, J2 = e2
    nx = A1.shape[-1]
    I = jnp.eye(nx, dtype=A1.dtype)
    # broadcast identity over leading dims
    LU1 = I + _mm(C1, J2)
    s1 = jnp.linalg.solve(LU1, A1)
    s1b = jnp.linalg.solve(LU1, (b1 + _mv(C1, eta2))[..., None])[..., 0]
    s1C = jnp.linalg.solve(LU1, C1)
    A = _mm(A2, s1)
    b = _mv(A2, s1b) + b2
    C = _mm(_mm(A2, s1C), jnp.swapaxes(A2, -1, -2)) + C2
    LU2 = I + _mm(J2, C1)
    s2e = jnp.linalg.solve(LU2, (eta2 - _mv(J2, b1))[..., None])[..., 0]
    s2J = jnp.linalg.solve(LU2, _mm(J2, A1))
    A1t = jnp.swapaxes(A1, -1, -2)
    eta = _mv(A1t, s2e) + eta1
    J = _mm(A1t, s2J) + J1
    return A, b, C, eta, J


def riccati_backward_parallel(lz, lu, lzz, luz, luu, A, B, rho):
    """Drop-in replacement for ``riccati.riccati_backward`` with O(log H)
    serial depth.  Same signature and outputs (kffs, Kfbs, dV1, dV2, fail)."""
    H, nx = lz.shape
    nu = lu.shape[-1]
    dt = lz.dtype
    eyeu = jnp.eye(nu, dtype=dt)

    R = luu + rho * eyeu  # (H, nu, nu); symmetric by construction upstream
    if nu == 2:
        Rinv, bad_R = _inv2x2(R, rho)
        bad_R = jnp.any(bad_R)
    else:
        Rinv = jnp.linalg.inv(R)
        bad_R = jnp.asarray(False)

    Bt = jnp.swapaxes(B, -1, -2)  # (H, nu, nx)
    Pt = jnp.swapaxes(luz, -1, -2)  # (H, nx, nu)
    BRinv = _mm(B, Rinv)  # (H, nx, nu)
    # square completion: u = v - R^{-1}(P x + r)
    F_t = A - _mm(BRinv, luz)  # (H, nx, nx)
    c_t = -_mv(BRinv, lu)  # (H, nx)
    C_t = _mm(BRinv, Bt)  # (H, nx, nx)
    J_t = lzz - _mm(Pt, _mm(Rinv, luz))  # (H, nx, nx)
    q_t = lz - _mv(Pt, _mv(Rinv, lu))  # (H, nx)
    eta_t = -q_t

    # append the zero terminal element (value beyond the horizon is 0)
    zmat = jnp.zeros((1, nx, nx), dt)
    zvec = jnp.zeros((1, nx), dt)
    elems = (
        jnp.concatenate([F_t, zmat]),
        jnp.concatenate([c_t, zvec]),
        jnp.concatenate([C_t, zmat]),
        jnp.concatenate([eta_t, zvec]),
        jnp.concatenate([J_t, zmat]),
    )
    # Suffix combination: reverse, forward-scan with flipped operands,
    # reverse back.  (lax.associative_scan's ``reverse=True`` flips the
    # array but keeps operand order, which composes elements in the wrong
    # temporal direction for a non-commutative combine.)
    rev = tuple(x[::-1] for x in elems)
    fwd = lax.associative_scan(lambda a, b: _combine(b, a), rev)
    suff = tuple(x[::-1] for x in fwd)
    # suffix element at k+1 encodes V_{k+1}(x) = 0.5 x'J x - eta'x
    Vxx = suff[4][1:]  # (H, nx, nx)
    Vx = -suff[3][1:]  # (H, nx)

    # per-stage gain extraction: identical math to riccati.bstep, in parallel
    def gains(lz_k, lu_k, lzz_k, luz_k, luu_k, A_k, B_k, Vx_n, Vxx_n):
        At = A_k.swapaxes(-1, -2)
        Btk = B_k.swapaxes(-1, -2)
        Qx = lz_k + _mv(At, Vx_n)
        Qu = lu_k + _mv(Btk, Vx_n)
        VxxA = _mm(Vxx_n, A_k)
        Qux = luz_k + _mm(Btk, VxxA)
        Quu = luu_k + _mm(Btk, _mm(Vxx_n, B_k))
        Quu = 0.5 * (Quu + Quu.swapaxes(-1, -2)) + rho * eyeu
        if nu == 2:
            a, b, d = Quu[0, 0], Quu[0, 1], Quu[1, 1]
            rhs = jnp.concatenate([Qu[:, None], Qux], axis=1)
            x0, x1, bad = _solve2x2(a, b, d, rhs[0], rhs[1])
            sol = jnp.stack([x0, x1], axis=0)
        else:
            L = jnp.linalg.cholesky(Quu)
            bad = jnp.any(jnp.isnan(L)) | jnp.any(jnp.diagonal(L) <= 0)
            L_safe = jnp.where(bad, jnp.eye(nu, dtype=dt), L)
            rhs = jnp.concatenate([Qu[:, None], Qux], axis=1)
            sol = jax.scipy.linalg.cho_solve((L_safe, True), rhs)
        kff = -sol[:, 0]
        Kfb = -sol[:, 1:]
        Quuk = _mv(Quu, kff)
        dV1_k = kff @ Qu
        dV2_k = 0.5 * kff @ Quuk
        return kff, Kfb, dV1_k, dV2_k, bad

    kffs, Kfbs, dV1s, dV2s, bads = jax.vmap(gains)(
        lz, lu, lzz, luz, luu, A, B, Vx, Vxx
    )
    fail = bad_R | jnp.any(bads)
    return kffs, Kfbs, jnp.sum(dV1s), jnp.sum(dV2s), fail
