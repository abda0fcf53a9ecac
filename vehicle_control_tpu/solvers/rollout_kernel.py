"""Pallas TPU kernel: fused line-search rollouts — FIELD-LAST LAYOUT
ABLATION ARTIFACT.  Not on any production path; superseded by the
field-major kernels (rollout_kernel_fm.py and everything downstream).

This is the round-1 layout experiment kept as the measured half of the
single most important TPU lesson in this repo: Mosaic assigns the last two
*logical* dims to (sublane, lane), so the closures' field-last
(..., 8, 128, F) arrays are physically lane-padded 12.8x and every
``x[..., i]`` slice relayouts.  Measured 149 ms vs 2.79 ms for the
field-major twin at B=4096, H=30 (53x; see PLAN.md "Performance frontier"
and CLAUDE.md perf log).  The kernel itself is numerically correct
(interpret-mode test bit-matches; on-chip max deviation ~4e-5 vs the XLA
line search) and exercises the full set of Mosaic-compatibility
techniques, which is why its interpret-mode test stays in CI
(tests/test_rollout_kernel.py) as coverage of the batch-polymorphic
problem closures inside a kernel body.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB, LANE = 8, 128
B_TILE = SUB * LANE  # 1024 scenarios per program


def build_linesearch_kernel(fns, horizon, nz, nu, nc, u_lo, u_hi, alphas, params_cls):
    """Return ``run(Xref, Uref, kffs, Kfbs, lam, mu, curv, ds, z0) ->
    costs (A, B)``: AL cost of every line-search candidate's closed-loop
    rollout.  Only the costs leave the kernel — the states/controls of the
    *selected* candidate are re-rolled by the caller (one rollout instead of
    A, and the kernel stays well inside VMEM).

    Input layout (B scenarios, A = len(alphas)):
      Xref (B, H, nz), Uref/kffs (B, H, nu), Kfbs (B, H, nu, nz),
      lam (B, H, nc), mu (B,), curv/ds (B, H), z0 (B, nz).
    B must be a multiple of 1024.
    """
    H = horizon
    A = len(alphas)
    alpha_list = [float(a) for a in np.asarray(alphas)]
    u_lo = np.asarray(u_lo)
    u_hi = np.asarray(u_hi)

    def f2b(a):
        """(F, 8, 128) field-major -> (8, 128, F)."""
        return jnp.moveaxis(a, 0, -1)

    def b2f(a):
        return jnp.moveaxis(a, -1, 0)

    def al_penalty_b(c, lam_n, mu):
        # PHR penalty with batch-shaped mu ((8,128)); c/lam_n (8, 128, nc)
        lam_hat = jnp.maximum(0.0, lam_n + mu[..., None] * c)
        return (jnp.sum(lam_hat**2, axis=-1) - jnp.sum(lam_n**2, axis=-1)) / (
            2.0 * mu
        )

    def kernel(
        xref_ref,  # (1, H, nz, 8, 128)
        uref_ref,  # (1, H, nu, 8, 128)
        kff_ref,  # (1, H, nu, 8, 128)
        kfb_ref,  # (1, H, nu, nz, 8, 128)
        lam_ref,  # (1, H, nc, 8, 128)
        mu_ref,  # (1, 1, 8, 128)
        curv_ref,  # (1, H, 8, 128)
        ds_ref,  # (1, H, 8, 128)
        z0_ref,  # (1, nz, 8, 128)
        ulo_ref,  # (H, nu)
        uhi_ref,  # (H, nu)
        cost_out,  # (1, 1, 1, 8, 128)
    ):
        a_idx = pl.program_id(0)
        # literal-branch switch: no captured constant array
        alpha = jax.lax.switch(
            a_idx, [lambda a=a: jnp.float32(a) for a in alpha_list]
        )
        mu = mu_ref[0, 0]

        class _StageView:
            """Duck-typed stand-in for a (..., H) params array: the problem
            closures index ``params.curvature[..., n]``; here that becomes a
            leading-axis ref read (Mosaic supports dynamic indexing on the
            leading dim, not the lane dim)."""

            def __init__(self, ref):
                self.ref = ref  # (1, H, 8, 128)

            def __getitem__(self, idx):
                n = idx[-1] if isinstance(idx, tuple) else idx
                return self.ref[0, n]

        params = params_cls(
            curvature=_StageView(curv_ref), ds=_StageView(ds_ref)
        )

        def body(n, carry):
            z, acc = carry  # z (8, 128, nz); acc (8, 128)
            xref = f2b(xref_ref[0, n])
            uref = f2b(uref_ref[0, n])
            kff = f2b(kff_ref[0, n])
            kfb = jnp.moveaxis(kfb_ref[0, n], (0, 1), (-2, -1))  # (8,128,nu,nz)
            fb = jnp.sum(kfb * (z - xref)[..., None, :], axis=-1)
            u = jnp.clip(uref + alpha * kff + fb, ulo_ref[n], uhi_ref[n])
            lam_n = f2b(lam_ref[0, n])
            cost = fns.stage_cost(n, z, u, params) + al_penalty_b(
                fns.constraints(n, z, u, params), lam_n, mu
            )
            z_next = fns.dynamics(n, z, u, params)
            finite = jnp.all(jnp.isfinite(z_next), axis=-1) & (
                jnp.max(jnp.abs(z_next), axis=-1) < 1e7
            )
            return z_next, jnp.where(finite, acc + cost, jnp.inf)

        z0 = f2b(z0_ref[0])
        zH, total = jax.lax.fori_loop(
            0, H, body, (z0, jnp.zeros((SUB, LANE), z0.dtype))
        )
        total = jnp.where(jnp.isfinite(total), total, jnp.inf)
        cost_out[0, 0, 0] = total

    def tile(a, nb):
        """(B, *rest) -> (nb, *rest, 8, 128)."""
        rest = a.shape[1:]
        a = a.reshape((nb, SUB, LANE) + rest)
        return jnp.moveaxis(a, (1, 2), (-2, -1))

    def untile(a, B):
        """(A, nb, *rest, 8, 128) -> (A, B, *rest)."""
        a = jnp.moveaxis(a, (-2, -1), (2, 3))
        return a.reshape((a.shape[0], B) + a.shape[4:])

    def run(Xref, Uref, kffs, Kfbs, lam, mu, curv, ds, z0, interpret=False):
        B = Xref.shape[0]
        assert B % B_TILE == 0, f"batch {B} must be a multiple of {B_TILE}"
        nb = B // B_TILE

        inputs = [
            tile(Xref, nb),  # (nb, H, nz, 8, 128)
            tile(Uref, nb),
            tile(kffs, nb),
            tile(Kfbs, nb),  # (nb, H, nu, nz, 8, 128)
            tile(lam, nb),
            tile(mu[:, None], nb),  # (nb, 1, 8, 128)
            tile(curv, nb),  # (nb, H, 8, 128)
            tile(ds, nb),
            tile(z0, nb),  # (nb, nz, 8, 128)
        ]
        box_inputs = [jnp.asarray(u_lo, Xref.dtype), jnp.asarray(u_hi, Xref.dtype)]

        def in_spec(x):
            blk = (1,) + x.shape[1:]
            nd = len(blk)
            return pl.BlockSpec(
                blk, lambda a, b, nd=nd: (b,) + (0,) * (nd - 1),
                memory_space=pltpu.VMEM,
            )

        def box_spec(x):
            nd = x.ndim
            return pl.BlockSpec(
                x.shape, lambda a, b, nd=nd: (0,) * nd, memory_space=pltpu.VMEM
            )

        def out_spec(shape):
            blk = (1, 1) + shape[2:]
            nd = len(blk)
            return pl.BlockSpec(
                blk, lambda a, b, nd=nd: (a, b) + (0,) * (nd - 2),
                memory_space=pltpu.VMEM,
            )

        out_shapes = [
            (A, nb, 1, SUB, LANE),
        ]
        (costs,) = pl.pallas_call(
            kernel,
            grid=(A, nb),
            in_specs=[in_spec(x) for x in inputs]
            + [box_spec(x) for x in box_inputs],
            out_specs=[out_spec(s) for s in out_shapes],
            out_shape=[
                jax.ShapeDtypeStruct(s, Xref.dtype) for s in out_shapes
            ],
            # the RK4 tire stack keeps many (8,128,nz) temporaries live in
            # the loop body; the default 16 MB scoped-vmem budget is too
            # small for body + double-buffered input blocks
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(*inputs, *box_inputs)
        return untile(costs, B)[..., 0]

    return run
