"""Pallas TPU kernel: field-major fused line-search rollouts (any FM family).

Second-generation kernel applying the round-1 layout lesson (see
rollout_kernel.py and PLAN.md): Mosaic assigns the last two logical dims to
(sublane, lane), so state must be kept as **separate (8, 128) field tiles**
— never stacked along a trailing field axis.  The whole rollout body is
written field-wise:

* state z = NZ individual (8, 128) arrays carried through ``fori_loop``;
* the AL cost and dynamics closures come from :mod:`solvers.fm_family`
  (shared with the derivative kernels, stage-switched physics included);
* every op is an (8, 128) vreg-exact VPU op: no stacks, no relayouts,
  no padding.

Costs-only output; the caller re-rolls the selected candidate (one rollout
instead of n_alpha).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB, LANE = 8, 128
B_TILE = SUB * LANE


def build_linesearch_kernel_fm(family, alphas):
    """Field-major line-search kernel for an FM problem family.

    Returns ``run(Xref, Uref, kffs, Kfbs, lam, mu, curv, ds, z0,
    interpret=False) -> costs (A, B)`` with the same contract as
    rollout_kernel.build_linesearch_kernel.
    """
    NZ, NU, NC, H = family.NZ, family.NU, family.NC, family.H
    A = len(alphas)
    alpha_list = [float(a) for a in np.asarray(alphas)]

    def kernel(
        xref_ref,  # (1, H, NZ, 8, 128)
        uref_ref,  # (1, H, NU, 8, 128)
        kff_ref,  # (1, H, NU, 8, 128)
        kfb_ref,  # (1, H, NU, NZ, 8, 128)
        lam_ref,  # (1, H, NC, 8, 128)
        mu_ref,  # (1, 1, 8, 128)
        curv_ref,  # (1, H, 8, 128)
        ds_ref,  # (1, H, 8, 128)
        z0_ref,  # (1, NZ, 8, 128)
        cost_out,  # (1, 1, 1, 8, 128)
    ):
        a_idx = pl.program_id(0)
        alpha = jax.lax.switch(a_idx, [lambda a=a: jnp.float32(a) for a in alpha_list])
        mu = mu_ref[0, 0]
        ds_read = lambda i: ds_ref[0, i]

        def body(n, carry):
            # carry: NZ state fields + running cost
            *z, acc = carry
            dz = [z[i] - xref_ref[0, n, i] for i in range(NZ)]
            u = []
            for j in range(NU):
                fb = dz[0] * kfb_ref[0, n, j, 0]
                for i in range(1, NZ):
                    fb += dz[i] * kfb_ref[0, n, j, i]
                uj = uref_ref[0, n, j] + alpha * kff_ref[0, n, j] + fb
                lo, hi = family.u_box(n, j)
                u.append(jnp.clip(uj, lo, hi))
            wf = tuple(z) + tuple(u)
            kv = curv_ref[0, n]
            cost = family.al_cost(
                n, wf, lambda j: lam_ref[0, n, j], mu, kv, ds_read
            )
            z_next = family.dyn(n, wf, kv, ds_read)
            finite = jnp.ones_like(acc, dtype=bool)
            for f in z_next:
                finite &= jnp.isfinite(f) & (jnp.abs(f) < 1e7)
            acc = jnp.where(finite, acc + cost, jnp.inf)
            return tuple(z_next) + (acc,)

        init = tuple(z0_ref[0, i] for i in range(NZ)) + (
            jnp.zeros((SUB, LANE), jnp.float32),
        )
        out = jax.lax.fori_loop(0, H, body, init)
        total = out[-1]
        cost_out[0, 0, 0] = jnp.where(jnp.isfinite(total), total, jnp.inf)

    # -- host wrapper (same tiling as rollout_kernel) -------------------------

    def tile(a, nb):
        rest = a.shape[1:]
        a = a.reshape((nb, SUB, LANE) + rest)
        return jnp.moveaxis(a, (1, 2), (-2, -1))

    def untile(a, B):
        a = jnp.moveaxis(a, (-2, -1), (2, 3))
        return a.reshape((a.shape[0], B) + a.shape[4:])

    def run(Xref, Uref, kffs, Kfbs, lam, mu, curv, ds, z0, interpret=False):
        B = Xref.shape[0]
        assert B % B_TILE == 0, f"batch {B} must be a multiple of {B_TILE}"
        nb = B // B_TILE
        f32 = jnp.float32
        inputs = [
            tile(Xref.astype(f32), nb),
            tile(Uref.astype(f32), nb),
            tile(kffs.astype(f32), nb),
            tile(Kfbs.astype(f32), nb),
            tile(lam.astype(f32), nb),
            tile(mu.astype(f32)[:, None], nb),
            tile(curv.astype(f32), nb),
            tile(ds.astype(f32), nb),
            tile(z0.astype(f32), nb),
        ]

        def in_spec(x):
            blk = (1,) + x.shape[1:]
            nd = len(blk)
            return pl.BlockSpec(
                blk, lambda a, b, nd=nd: (b,) + (0,) * (nd - 1),
                memory_space=pltpu.VMEM,
            )

        (costs,) = pl.pallas_call(
            kernel,
            grid=(A, nb),
            in_specs=[in_spec(x) for x in inputs],
            out_specs=[
                pl.BlockSpec(
                    (1, 1, 1, SUB, LANE),
                    lambda a, b: (a, b, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_shape=[jax.ShapeDtypeStruct((A, nb, 1, SUB, LANE), f32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
            interpret=interpret,
        )(*inputs)
        return untile(costs, B)[..., 0]

    return run
