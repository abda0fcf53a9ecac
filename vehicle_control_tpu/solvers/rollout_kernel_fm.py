"""Pallas TPU kernel: field-major fused line-search rollouts (single-track).

Second-generation kernel applying the round-1 layout lesson (see
rollout_kernel.py and PLAN.md): Mosaic assigns the last two logical dims to
(sublane, lane), so state must be kept as **separate (8, 128) field tiles**
— never stacked along a trailing field axis.  Here the whole rollout body is
written field-wise:

* state z = 10 individual (8, 128) arrays (Ux, Uy, r, delta, s, ey, epsi,
  t, uprev_Fx, uprev_w) carried through `fori_loop`;
* the tire/force physics reuses the *scalar* helper functions of
  models.dynamic_car (Fx_f, Fz_f, Fy_f, drag, ...) — only the ODE/cost
  assembly is specialized, and an equivalence test pins it against the
  shared problem closures;
* every op is an (8, 128) vreg-exact VPU op: no stacks, no relayouts,
  no padding.

Covers the single-track (tail="none") family without obstacles — the bench
headline configuration.  Costs-only output; the caller re-rolls the selected
candidate (one rollout instead of n_alpha).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vehicle_control_tpu.models import dynamic_car as dc
from vehicle_control_tpu.solvers import fm_singletrack as fm

SUB, LANE = 8, 128
B_TILE = SUB * LANE

FORCE_SCALE = fm.FORCE_SCALE


def build_linesearch_kernel_fm(car_config, cfg, horizon, alphas):
    """Field-major line-search kernel for the single-track MPC problem.

    Returns ``run(Xref, Uref, kffs, Kfbs, lam, mu, curv, ds, z0,
    interpret=False) -> costs (A, B)`` with the same contract as
    rollout_kernel.build_linesearch_kernel.
    """
    from vehicle_control_tpu.controllers.mpc.problems import _floatify

    p = _floatify(dc.DynamicCarParams.from_config(car_config))
    H = int(horizon)
    N = int(cfg["horizon"])
    assert H == N, "field-major kernel covers the single-track (M=0) family"
    assert not bool(cfg.get("obstacles", False)), "obstacles not supported yet"
    w = {k: float(v) for k, v in cfg["cost_weights"].items()}
    ci = {k: float(v) for k, v in cfg["input_constraints"].items()}
    cs = {k: float(v) for k, v in cfg["state_constraints"].items()}
    A = len(alphas)
    alpha_list = [float(a) for a in np.asarray(alphas)]
    nz, nu, nc = 10, 2, 10
    fs = 1.0 / FORCE_SCALE

    # field-wise physics shared with the derivatives kernel
    def rk4_step(x, Fx, wact, k, h):
        return fm.rk4_step(x, Fx, wact, k, h, p)

    def stage_cost_fields(n, x, Fx, wact, Fx_prev, dsn, ds_prev):
        return fm.stage_cost_fields(n, x, Fx, wact, Fx_prev, dsn, ds_prev, p, w, cs, N, H)

    def al_penalty_fields(n, x, Fx, wact, lam_read, mu):
        return fm.al_penalty_fields(fm.constraint_fields(x, Fx, wact, p, ci, cs), lam_read, mu)

    # -- kernel ---------------------------------------------------------------

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
        alpha = jax.lax.switch(a_idx, [lambda a=a: jnp.float32(a) for a in alpha_list])
        mu = mu_ref[0, 0]

        def body(n, carry):
            # carry: 10 state fields + running cost
            *z, acc = carry
            dz = [z[i] - xref_ref[0, n, i] for i in range(nz)]
            nprev = jnp.maximum(n - 1, 0)
            u = []
            for j in range(nu):
                fb = dz[0] * kfb_ref[0, n, j, 0]
                for i in range(1, nz):
                    fb += dz[i] * kfb_ref[0, n, j, i]
                uj = uref_ref[0, n, j] + alpha * kff_ref[0, n, j] + fb
                u.append(jnp.clip(uj, ulo_ref[n, j], uhi_ref[n, j]))
            Fx = u[0] * FORCE_SCALE
            wact = u[1]
            Fx_prev = z[8] * FORCE_SCALE  # uprev slot, solver units
            x = z[:8]
            kv = curv_ref[0, n]
            dsn = ds_ref[0, n]
            ds_prev = ds_ref[0, nprev]
            cost = stage_cost_fields(n, x, Fx, wact, Fx_prev, dsn, ds_prev)
            cost += al_penalty_fields(
                n, x, Fx, wact, lambda j: lam_ref[0, n, j], mu
            )
            x_next = rk4_step(x, Fx, wact, kv, dsn)
            finite = jnp.ones_like(acc, dtype=bool)
            for f in x_next:
                finite &= jnp.isfinite(f) & (jnp.abs(f) < 1e7)
            acc = jnp.where(finite, acc + cost, jnp.inf)
            return tuple(x_next) + (u[0], u[1], acc)

        init = tuple(z0_ref[0, i] for i in range(nz)) + (
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
        # boxes recomputed here (single-track rows only)
        lo = np.empty((H, nu), np.float32)
        hi = np.empty((H, nu), np.float32)
        lo[:, 0], hi[:, 0] = -30.0, 60.0
        lo[:, 1], hi[:, 1] = ci["w_min"], ci["w_max"]
        box_inputs = [jnp.asarray(lo), jnp.asarray(hi)]

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

        (costs,) = pl.pallas_call(
            kernel,
            grid=(A, nb),
            in_specs=[in_spec(x) for x in inputs] + [box_spec(x) for x in box_inputs],
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
        )(*inputs, *box_inputs)
        return untile(costs, B)[..., 0]

    return run
