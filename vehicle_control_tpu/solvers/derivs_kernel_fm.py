"""Pallas TPU kernel: field-major per-stage derivatives (any FM family).

Computes, for every (stage, scenario), the quantities the Riccati backward
pass consumes: AL-cost gradient g, Hessian Hw, and dynamics Jacobian J over
the combined w = (z(NZ), u(NU)).  The XLA path does this with
vmap(jacfwd(grad)) whose tangent/stage batching materializes badly-padded
(B, H, NW, .) intermediates; here the AD happens *inside* the kernel over
field-major (8, 128) tiles:

* grid = (H, B/1024) — stages are independent, so each program handles one
  (stage, scenario-tile) pair and the whole thing pipelines;
* gradient: jax.grad of the lane-summed AL cost wrt the NW individual field
  tiles (per-lane costs are diagonal in the batch, so the cotangent of the
  sum IS the per-scenario gradient);
* Hessian / Jacobian columns: jax.jvp with a ones-tile tangent on exactly
  one field per column — again exact because the computation is per-lane.

The AL cost / dynamics closures come from :mod:`solvers.fm_family`
(shared with the fused backward and line-search kernels) and are
equivalence-tested against the solver's stage_derivs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vehicle_control_tpu.solvers import fm_family

SUB, LANE = 8, 128
B_TILE = SUB * LANE


def build_derivs_kernel_fm(family):
    """Returns ``run(X, U, lam, mu, curv, ds, interpret=False) ->
    (g (B,H,NW), Hw (B,H,NW,NW), J (B,H,NZ,NW))``.  Hw is returned
    unsymmetrized (the solver symmetrizes)."""
    NZ, NU, NC, H = family.NZ, family.NU, family.NC, family.H
    NW = NZ + NU

    def kernel(
        x_ref,  # (1, 1, NZ, 8, 128)   stage slice of Z
        u_ref,  # (1, 1, NU, 8, 128)
        lam_ref,  # (1, 1, NC, 8, 128)
        mu_ref,  # (1, 1, 8, 128)
        curv_ref,  # (1, 1, 8, 128)
        ds_ref,  # (1, H, 8, 128)  full ds row (stage costs need ds[n-1] etc.)
        g_out,  # (1, 1, NW, 8, 128)
        h_out,  # (1, 1, NW, NW, 8, 128)
        j_out,  # (1, 1, NZ, NW, 8, 128)
    ):
        n = pl.program_id(0)
        mu = mu_ref[0, 0]
        kv = curv_ref[0, 0]
        lam = [lam_ref[0, 0, j] for j in range(NC)]
        ds_read = lambda i: ds_ref[0, i]

        wf = tuple(x_ref[0, 0, i] for i in range(NZ)) + tuple(
            u_ref[0, 0, j] for j in range(NU)
        )
        g, Hcols, Jcols = fm_family.stage_derivs_cols(
            family, n, wf, lam, mu, kv, ds_read
        )
        for i in range(NW):
            g_out[0, 0, i] = g[i]
        for i in range(NW):
            for r in range(NW):
                h_out[0, 0, r, i] = Hcols[i][r]
            for r in range(NZ):
                j_out[0, 0, r, i] = Jcols[i][r]

    def tile(a, nb):
        rest = a.shape[1:]
        a = a.reshape((nb, SUB, LANE) + rest)
        return jnp.moveaxis(a, (1, 2), (-2, -1))

    def untile(a, B):
        # (nb, H, *rest, 8, 128) -> (B, H, *rest)
        a = jnp.moveaxis(a, (-2, -1), (1, 2))
        return a.reshape((B,) + a.shape[3:])

    def run(X, U, lam, mu, curv, ds, interpret=False):
        B = X.shape[0]
        assert B % B_TILE == 0, f"batch {B} must be a multiple of {B_TILE}"
        nb = B // B_TILE
        f32 = jnp.float32
        inputs = [
            tile(X.astype(f32), nb),  # (nb, H, NZ, 8, 128)
            tile(U.astype(f32), nb),
            tile(lam.astype(f32), nb),
            tile(mu.astype(f32)[:, None], nb),  # (nb, 1, 8, 128)
            tile(curv.astype(f32), nb),  # (nb, H, 8, 128)
            tile(ds.astype(f32), nb),
        ]

        def stage_spec(x, stage_axis=True):
            blk = (1, 1) + x.shape[2:] if stage_axis else (1,) + x.shape[1:]
            nd = len(blk)
            if stage_axis:
                return pl.BlockSpec(
                    blk, lambda n, b, nd=nd: (b, n) + (0,) * (nd - 2),
                    memory_space=pltpu.VMEM,
                )
            return pl.BlockSpec(
                blk, lambda n, b, nd=nd: (b,) + (0,) * (nd - 1),
                memory_space=pltpu.VMEM,
            )

        in_specs = [
            stage_spec(inputs[0]),  # X per stage
            stage_spec(inputs[1]),
            stage_spec(inputs[2]),
            stage_spec(inputs[3], stage_axis=False),  # mu: (nb, 1, 8, 128)
            stage_spec(inputs[4]),  # curvature per stage
            stage_spec(inputs[5], stage_axis=False),  # ds: full row
        ]
        out_shapes = [
            (nb, H, NW, SUB, LANE),
            (nb, H, NW, NW, SUB, LANE),
            (nb, H, NZ, NW, SUB, LANE),
        ]

        def out_spec(shape):
            blk = (1, 1) + shape[2:]
            nd = len(blk)
            return pl.BlockSpec(
                blk, lambda n, b, nd=nd: (b, n) + (0,) * (nd - 2),
                memory_space=pltpu.VMEM,
            )

        g, Hw, J = pl.pallas_call(
            kernel,
            grid=(H, nb),
            in_specs=in_specs,
            out_specs=[out_spec(s) for s in out_shapes],
            out_shape=[jax.ShapeDtypeStruct(s, f32) for s in out_shapes],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(*inputs)
        return untile(g, B), untile(Hw, B), untile(J, B)

    return run
