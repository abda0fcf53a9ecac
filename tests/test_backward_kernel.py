"""Fused backward kernel (derivs + Riccati) vs the XLA path.

The fused kernel is the default-on TPU hot path behind the headline bench
number; these interpret-mode tests pin it against
``riccati_backward(stage_derivs(...))`` at small horizons for both the
single-track family and the flagship cascaded (pm-tail) family, running by
default in CI.  Full-size variants stay behind RUN_KERNEL_TESTS (interpret
mode is minutes-slow on CPU).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vehicle_control_tpu.controllers.mpc import problems
from vehicle_control_tpu.controllers.mpc.controllers import initial_carry
from vehicle_control_tpu.solvers.al_ilqr import _al_penalty, rollout
from vehicle_control_tpu.solvers.backward_kernel_fm import (
    B_TILE,
    build_backward_kernel_fm,
)
from vehicle_control_tpu.solvers.fm_family import build_cascaded_family
from vehicle_control_tpu.solvers.riccati import riccati_backward
from vehicle_control_tpu.utils.config import load_config, project_root


def _cfg(rel):
    return load_config(os.path.join(project_root(), "configs", rel))


def _problem_and_family(track, name, tail, horizon, horizon_tail=0):
    cfg = dict(_cfg(f"controllers/{name}.yaml"), obstacles=False)
    cfg["horizon"] = horizon
    if tail == "pm":
        cfg["horizon_pm"] = horizon_tail
    car = _cfg("models/dynamic_car.yaml")
    prob = problems.build_cascaded_problem(car, track, cfg, tail, jnp.float32)
    fam = build_cascaded_family(car, cfg, tail, track.data)
    return prob, fam


def _data(prob, B, seed=0):
    rng = np.random.default_rng(seed)
    H, nz, nu, nc = prob.horizon, prob.nz, prob.nu, prob.nc
    z0 = np.zeros((B, nz - 2), np.float32)
    z0[:, 0] = 5.0 + rng.uniform(0, 8, B)
    z0[:, 4] = rng.uniform(0, 250, B)
    U = (rng.normal(size=(B, H, nu)) * 0.05).astype(np.float32)
    c0 = initial_carry(prob, jnp.float32)
    pv, zv = jax.vmap(prob.init_horizon, in_axes=(0, None, None))(
        jnp.asarray(z0), c0.X_pred, c0.U_pred
    )
    Xb = jax.vmap(lambda p_, z_, u_: rollout(prob.fns, p_, z_, u_)[0])(
        pv, zv, jnp.asarray(U)
    )
    lam = np.abs(rng.normal(size=(B, H, nc)) * 0.1).astype(np.float32)
    mu = np.full((B,), 10.0, np.float32)
    rho = np.full((B,), 1e-4, np.float32)
    return Xb, jnp.asarray(U), jnp.asarray(lam), jnp.asarray(mu), jnp.asarray(rho), pv


def _xla_backward(prob, X, U, lam, mu, rho, pv):
    """The solver's XLA fused_backward fallback: batched stage derivatives
    into the shared Riccati sweep (al_ilqr.build_solver)."""
    fns = prob.fns
    H, nz = prob.horizon, prob.nz
    ns = jnp.arange(H)

    def stage_derivs(n, z, u, lam_n, m, params):
        w = jnp.concatenate([z, u])
        cost_fn = lambda ww: (
            fns.stage_cost(n, ww[:nz], ww[nz:], params)
            + _al_penalty(fns.constraints(n, ww[:nz], ww[nz:], params), lam_n, m)
        )
        g = jax.grad(cost_fn)(w)
        Hw = jax.jacfwd(jax.grad(cost_fn))(w)
        Hw = 0.5 * (Hw + Hw.T)
        dyn = lambda ww: fns.dynamics(n, ww[:nz], ww[nz:], params)
        J = jax.jacfwd(dyn)(w)
        return (
            g[:nz], g[nz:], Hw[:nz, :nz], Hw[nz:, :nz], Hw[nz:, nz:],
            J[:, :nz], J[:, nz:],
        )

    def one(X1, U1, lam1, mu1, rho1, pv1):
        d = jax.vmap(
            lambda n, z, u, l: stage_derivs(n, z, u, l, mu1, pv1)
        )(ns, X1, U1, lam1)
        return riccati_backward(*d, rho1, 1)

    return jax.vmap(one)(X, U, lam, mu, rho, pv)


def _check(prob, fam, B, seed=0):
    X, U, lam, mu, rho, pv = _data(prob, B, seed)
    run = build_backward_kernel_fm(fam)
    kff, Kfb, dV1, dV2, fail = run(
        X, U, lam, mu, rho, pv.curvature, pv.ds, interpret=True
    )
    kff_r, Kfb_r, dV1_r, dV2_r, fail_r = _xla_backward(prob, X, U, lam, mu, rho, pv)
    np.testing.assert_array_equal(np.asarray(fail), np.asarray(fail_r))
    ok = ~np.asarray(fail_r)
    # feedback gains agree to f32 accumulation noise on non-failed lanes
    np.testing.assert_allclose(
        np.asarray(kff)[ok], np.asarray(kff_r)[ok], rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(Kfb)[ok], np.asarray(Kfb_r)[ok], rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(dV1)[ok], np.asarray(dV1_r)[ok], rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(dV2)[ok], np.asarray(dV2_r)[ok], rtol=2e-3, atol=2e-3
    )


@pytest.mark.skipif(
    not os.environ.get("RUN_KERNEL_TESTS"),
    reason="interpret-mode emulation of the in-kernel AD is >10 min even at "
    "H=3 on CPU; Mosaic lowering parity is covered on real hardware by "
    "scripts/verify_kernels_tpu.py (run per TPU session), and the closure "
    "math by the default-run tests/test_fm_family.py",
)
class TestBackwardKernelTiny:
    """Smoke equivalence at H=3 (one 1024-lane tile)."""

    def test_singletrack(self, ippodromo_track):
        prob, fam = _problem_and_family(ippodromo_track, "singletrack", "none", 3)
        _check(prob, fam, B_TILE)

    def test_cascaded_pm(self, ippodromo_track):
        prob, fam = _problem_and_family(ippodromo_track, "cascaded", "pm", 2, 2)
        _check(prob, fam, B_TILE)


@pytest.mark.skipif(
    not os.environ.get("RUN_KERNEL_TESTS"),
    reason="full-size interpret-mode run is minutes-slow on CPU",
)
class TestBackwardKernelFull:
    def test_singletrack_h30(self, ippodromo_track):
        prob, fam = _problem_and_family(ippodromo_track, "singletrack", "none", 30)
        _check(prob, fam, B_TILE)

    def test_cascaded_full(self, ippodromo_track):
        prob, fam = _problem_and_family(ippodromo_track, "cascaded", "pm", 20, 40)
        _check(prob, fam, B_TILE)
