"""Pallas TPU kernel: fused backward pass (derivatives + Riccati), field-major.

One kernel per 1024-scenario tile sweeps the horizon backward; at every
stage it differentiates the AL stage cost and dynamics *in-kernel* (same
technique as derivs_kernel_fm) and immediately consumes the results in the
Riccati recursion — the (B, H, NW, NW)-sized derivative tensors never touch
HBM and no tile/untile transposes are needed.  Only the feedback law
(kff, Kfb), the expected-decrease terms and the PD-failure flag leave the
kernel.

Value function state lives in VMEM as NZ + NZ*NZ individual (8, 128) field
tiles carried through ``fori_loop``; all linear algebra is explicit
field-loop FMAs (the 2x2 Quu solve in closed form per lane).

Generic over any :class:`solvers.fm_family.FMFamily` with NU == 2 (every
shipped MPC family); equivalence-tested against
``riccati_backward(stage_derivs(...))`` in tests/test_backward_kernel.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vehicle_control_tpu.solvers import fm_family

SUB, LANE = 8, 128
B_TILE = SUB * LANE


def build_backward_kernel_fm(family):
    """Returns ``run(X, U, lam, mu, rho, curv, ds, interpret=False) ->
    (kffs (B,H,NU), Kfbs (B,H,NU,NZ), dV1 (B,), dV2 (B,), fail (B,))``."""
    NZ, NU, NC, H = family.NZ, family.NU, family.NC, family.H
    NW = NZ + NU
    assert NU == 2, "closed-form Quu solve is specialized to 2 controls"

    def kernel(
        x_ref,  # (1, H, NZ, 8, 128)
        u_ref,  # (1, H, NU, 8, 128)
        lam_ref,  # (1, H, NC, 8, 128)
        mu_ref,  # (1, 1, 8, 128)
        rho_ref,  # (1, 1, 8, 128)
        curv_ref,  # (1, H, 8, 128)
        ds_ref,  # (1, H, 8, 128)
        kff_out,  # (1, H, NU, 8, 128)
        kfb_out,  # (1, H, NU, NZ, 8, 128)
        dv_out,  # (1, 2, 8, 128)
        fail_out,  # (1, 1, 8, 128)
    ):
        mu = mu_ref[0, 0]
        rho = rho_ref[0, 0]
        zeros = jnp.zeros((SUB, LANE), jnp.float32)
        ds_read = lambda i: ds_ref[0, i]

        def stage_derivs(n):
            kv = curv_ref[0, n]
            lam = [lam_ref[0, n, j] for j in range(NC)]
            wf = tuple(x_ref[0, n, i] for i in range(NZ)) + tuple(
                u_ref[0, n, j] for j in range(NU)
            )
            g, Hcols, Jcols = fm_family.stage_derivs_cols(
                family, n, wf, lam, mu, kv, ds_read
            )
            # symmetrized Hessian: Hs[r][c]
            Hs = [
                [0.5 * (Hcols[c][r] + Hcols[r][c]) for c in range(NW)]
                for r in range(NW)
            ]
            # A[r][c] = d x_next[r] / d w[c] (state rows only)
            A = [[Jcols[c][r] for c in range(NZ)] for r in range(NZ)]
            Bm = [[Jcols[NZ + j][r] for j in range(NU)] for r in range(NZ)]
            return g, Hs, A, Bm

        def body(i, carry):
            n = H - 1 - i
            Vx = list(carry[0])
            Vxx = [list(row) for row in carry[1]]
            dV1, dV2, fail = carry[2], carry[3], carry[4]

            g, Hs, A, Bm = stage_derivs(n)

            # Qx = lx + A^T Vx ; Qu = lu + B^T Vx
            Qx = [
                g[r] + sum(A[k][r] * Vx[k] for k in range(NZ)) for r in range(NZ)
            ]
            Qu = [
                g[NZ + j] + sum(Bm[k][j] * Vx[k] for k in range(NZ))
                for j in range(NU)
            ]
            # VxxA[i][j] = sum_k Vxx[i][k] A[k][j] ; VxxB likewise
            VxxA = [
                [sum(Vxx[r][k] * A[k][c] for k in range(NZ)) for c in range(NZ)]
                for r in range(NZ)
            ]
            VxxB = [
                [sum(Vxx[r][k] * Bm[k][j] for k in range(NZ)) for j in range(NU)]
                for r in range(NZ)
            ]
            Qxx = [
                [
                    Hs[r][c] + sum(A[k][r] * VxxA[k][c] for k in range(NZ))
                    for c in range(NZ)
                ]
                for r in range(NZ)
            ]
            Qux = [
                [
                    Hs[NZ + j][c] + sum(Bm[k][j] * VxxA[k][c] for k in range(NZ))
                    for c in range(NZ)
                ]
                for j in range(NU)
            ]
            Quu = [
                [
                    Hs[NZ + j][NZ + l]
                    + sum(Bm[k][j] * VxxB[k][l] for k in range(NZ))
                    for l in range(NU)
                ]
                for j in range(NU)
            ]
            a = 0.5 * (Quu[0][0] + Quu[0][0]) + rho
            b = 0.5 * (Quu[0][1] + Quu[1][0])
            d = 0.5 * (Quu[1][1] + Quu[1][1]) + rho
            det = a * d - b * b
            bad = (a <= 0.0) | (det <= 0.0)
            inv_det = jnp.where(bad, 1.0, 1.0 / jnp.where(bad, 1.0, det))

            def solve2(r0, r1):
                return (d * r0 - b * r1) * inv_det, (a * r1 - b * r0) * inv_det

            k0, k1 = solve2(-Qu[0], -Qu[1])
            Kfb = [[None] * NZ, [None] * NZ]
            for c in range(NZ):
                K0, K1 = solve2(-Qux[0][c], -Qux[1][c])
                Kfb[0][c] = K0
                Kfb[1][c] = K1

            kff_out[0, n, 0] = k0
            kff_out[0, n, 1] = k1
            for c in range(NZ):
                kfb_out[0, n, 0, c] = Kfb[0][c]
                kfb_out[0, n, 1, c] = Kfb[1][c]

            # regularized Quu (matches riccati_backward: rho on the diagonal
            # participates in every downstream term)
            Quu_r = [[a, b], [b, d]]
            Quuk = [
                Quu_r[0][0] * k0 + Quu_r[0][1] * k1,
                Quu_r[1][0] * k0 + Quu_r[1][1] * k1,
            ]
            QuuK = [
                [
                    Quu_r[j][0] * Kfb[0][c] + Quu_r[j][1] * Kfb[1][c]
                    for c in range(NZ)
                ]
                for j in range(NU)
            ]
            Vx_n = [
                Qx[c]
                + Kfb[0][c] * (Quuk[0] + Qu[0])
                + Kfb[1][c] * (Quuk[1] + Qu[1])
                + Qux[0][c] * k0
                + Qux[1][c] * k1
                for c in range(NZ)
            ]
            Vxx_n = [
                [
                    Qxx[r][c]
                    + Kfb[0][r] * QuuK[0][c]
                    + Kfb[1][r] * QuuK[1][c]
                    + Kfb[0][r] * Qux[0][c]
                    + Kfb[1][r] * Qux[1][c]
                    + Qux[0][r] * Kfb[0][c]
                    + Qux[1][r] * Kfb[1][c]
                    for c in range(NZ)
                ]
                for r in range(NZ)
            ]
            # symmetrize
            Vxx_s = [
                [0.5 * (Vxx_n[r][c] + Vxx_n[c][r]) for c in range(NZ)]
                for r in range(NZ)
            ]
            dV1_n = dV1 + k0 * Qu[0] + k1 * Qu[1]
            dV2_n = dV2 + 0.5 * (k0 * Quuk[0] + k1 * Quuk[1])
            # fail carried as float: Mosaic cannot legalize i1 loop carries
            fail_n = jnp.maximum(fail, bad.astype(jnp.float32))
            return (
                tuple(Vx_n),
                tuple(tuple(row) for row in Vxx_s),
                dV1_n,
                dV2_n,
                fail_n,
            )

        init = (
            tuple(zeros for _ in range(NZ)),
            tuple(tuple(zeros for _ in range(NZ)) for _ in range(NZ)),
            zeros,
            zeros,
            zeros,
        )
        Vx, Vxx, dV1, dV2, fail = jax.lax.fori_loop(0, H, body, init)
        dv_out[0, 0] = dV1
        dv_out[0, 1] = dV2
        fail_out[0, 0] = fail

    def tile(a, nb):
        rest = a.shape[1:]
        a = a.reshape((nb, SUB, LANE) + rest)
        return jnp.moveaxis(a, (1, 2), (-2, -1))

    def untile(a, B):
        a = jnp.moveaxis(a, (-2, -1), (1, 2))
        return a.reshape((B,) + a.shape[3:])

    def run(X, U, lam, mu, rho, curv, ds, interpret=False):
        B = X.shape[0]
        assert B % B_TILE == 0, f"batch {B} must be a multiple of {B_TILE}"
        nb = B // B_TILE
        f32 = jnp.float32
        inputs = [
            tile(X.astype(f32), nb),
            tile(U.astype(f32), nb),
            tile(lam.astype(f32), nb),
            tile(mu.astype(f32)[:, None], nb),
            tile(rho.astype(f32)[:, None], nb),
            tile(curv.astype(f32), nb),
            tile(ds.astype(f32), nb),
        ]

        def in_spec(x):
            blk = (1,) + x.shape[1:]
            nd = len(blk)
            return pl.BlockSpec(
                blk, lambda b, nd=nd: (b,) + (0,) * (nd - 1),
                memory_space=pltpu.VMEM,
            )

        out_shapes = [
            (nb, H, NU, SUB, LANE),
            (nb, H, NU, NZ, SUB, LANE),
            (nb, 2, SUB, LANE),
            (nb, 1, SUB, LANE),
        ]

        def out_spec(shape):
            blk = (1,) + shape[1:]
            nd = len(blk)
            return pl.BlockSpec(
                blk, lambda b, nd=nd: (b,) + (0,) * (nd - 1),
                memory_space=pltpu.VMEM,
            )

        kff, kfb, dv, fail = pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[in_spec(x) for x in inputs],
            out_specs=[out_spec(s) for s in out_shapes],
            out_shape=[jax.ShapeDtypeStruct(s, f32) for s in out_shapes],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(*inputs)
        kffs = untile(kff, B)
        Kfbs = untile(kfb, B)
        dv = untile(dv, B)
        failf = untile(fail, B)[:, 0] > 0.5
        return kffs, Kfbs, dv[:, 0], dv[:, 1], failf

    return run
