"""Pallas line-search kernel vs the XLA path (interpret mode on CPU)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vehicle_control_tpu.controllers.mpc import problems
from vehicle_control_tpu.controllers.mpc.controllers import initial_carry
from vehicle_control_tpu.solvers.al_ilqr import _al_penalty, rollout
from vehicle_control_tpu.solvers.rollout_kernel import B_TILE, build_linesearch_kernel
from vehicle_control_tpu.utils.config import load_config, project_root


def _cfg(rel):
    return load_config(os.path.join(project_root(), "configs", rel))


_TRACK = {}


def setup_track_for_derivs():
    return _TRACK["t"]


@pytest.fixture(scope="module")
def setup(ippodromo_track):
    _TRACK["t"] = ippodromo_track
    cfg = dict(_cfg("controllers/singletrack.yaml"), obstacles=False)
    cfg["horizon"] = 8
    prob = problems.build_cascaded_problem(
        _cfg("models/dynamic_car.yaml"), ippodromo_track, cfg, "none", jnp.float32
    )
    return prob


def _data(prob, B):
    rng = np.random.default_rng(0)
    H, nz, nu, nc = prob.horizon, prob.nz, prob.nu, prob.nc
    z0 = np.zeros((B, nz - 2), np.float32)  # physical model state
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
    kff = (rng.normal(size=(B, H, nu)) * 0.02).astype(np.float32)
    Kfb = (rng.normal(size=(B, H, nu, nz)) * 0.01).astype(np.float32)
    lam = np.abs(rng.normal(size=(B, H, nc)) * 0.1).astype(np.float32)
    mu = np.full((B,), 10.0, np.float32)
    return (
        Xb,
        jnp.asarray(U),
        jnp.asarray(kff),
        jnp.asarray(Kfb),
        jnp.asarray(lam),
        jnp.asarray(mu),
        pv,
        zv,
    )


def _xla_reference(prob, alphas, Xref, Uref, kff, Kfb, lam, mu, params, z0):
    fns = prob.fns
    H = prob.horizon

    def fwd_one(alpha, Xr, Ur, kf, Kf, lm, m, pp, zz):
        def fstep(carry, n):
            z, acc = carry
            u = jnp.clip(
                Ur[n] + alpha * kf[n] + Kf[n] @ (z - Xr[n]),
                prob.u_lo[n],
                prob.u_hi[n],
            )
            cost = fns.stage_cost(n, z, u, pp) + _al_penalty(
                fns.constraints(n, z, u, pp), lm[n], m
            )
            z2 = fns.dynamics(n, z, u, pp)
            return (z2, acc + cost), (z, u)

        (zH, tot), (X, U) = jax.lax.scan(
            fstep, (zz, jnp.zeros((), jnp.float32)), jnp.arange(H)
        )
        return X, U, tot

    f = jax.vmap(
        jax.vmap(fwd_one, in_axes=(0,) + (None,) * 8),
        in_axes=(None,) + (0,) * 8,
    )
    X, U, c = f(alphas, Xref, Uref, kff, Kfb, lam, mu, params, z0)
    # reorder to kernel layout (A, B, ...)
    return (
        jnp.swapaxes(X, 0, 1),
        jnp.swapaxes(U, 0, 1),
        jnp.swapaxes(c, 0, 1),
    )


class TestLinesearchKernel:
    def test_matches_xla_path(self, setup):
        prob = setup
        alphas = jnp.asarray([1.0, 0.25, 0.01], jnp.float32)
        B = B_TILE  # one tile
        Xref, Uref, kff, Kfb, lam, mu, pv, zv = _data(prob, B)
        run = build_linesearch_kernel(
            prob.fns,
            prob.horizon,
            prob.nz,
            prob.nu,
            prob.nc,
            prob.u_lo,
            prob.u_hi,
            alphas,
            problems.HorizonParams,
        )
        costs = run(
            Xref, Uref, kff, Kfb, lam, mu, pv.curvature, pv.ds, zv, interpret=True
        )
        Xr, Ur, cr = _xla_reference(
            prob, alphas, Xref, Uref, kff, Kfb, lam, mu, pv, zv
        )
        finite = np.isfinite(np.asarray(cr))
        np.testing.assert_allclose(
            np.asarray(costs)[finite], np.asarray(cr)[finite], rtol=2e-4, atol=2e-3
        )
        assert np.isfinite(np.asarray(costs)).mean() > 0.5


class TestFieldMajorKernel:
    def test_matches_xla_path(self, setup, ippodromo_track):
        from vehicle_control_tpu.solvers.rollout_kernel_fm import (
            build_linesearch_kernel_fm,
        )

        prob = setup
        cfg = dict(_cfg("controllers/singletrack.yaml"), obstacles=False)
        cfg["horizon"] = 8
        alphas = jnp.asarray([1.0, 0.25, 0.01], jnp.float32)
        from vehicle_control_tpu.solvers.fm_family import build_cascaded_family
        from vehicle_control_tpu.solvers.rollout_kernel import B_TILE

        B = B_TILE
        Xref, Uref, kff, Kfb, lam, mu, pv, zv = _data(prob, B)
        fam = build_cascaded_family(
            _cfg("models/dynamic_car.yaml"), cfg, "none", ippodromo_track.data
        )
        run = build_linesearch_kernel_fm(fam, alphas)
        costs = run(
            Xref, Uref, kff, Kfb, lam, mu, pv.curvature, pv.ds, zv, interpret=True
        )
        _, _, cr = _xla_reference(prob, alphas, Xref, Uref, kff, Kfb, lam, mu, pv, zv)
        finite = np.isfinite(np.asarray(cr))
        np.testing.assert_allclose(
            np.asarray(costs)[finite], np.asarray(cr)[finite], rtol=3e-4, atol=3e-3
        )
        assert np.isfinite(np.asarray(costs)).mean() > 0.5


@pytest.mark.skipif(
    not os.environ.get("RUN_KERNEL_TESTS"),
    reason="interpret-mode Pallas emulation is minutes-slow on CPU; "
    "set RUN_KERNEL_TESTS=1 (verified on real TPU end-to-end)",
)
class TestKernelSolverIntegration:
    def test_solver_with_kernel_matches_plain(self, ippodromo_track):
        """Full batched solves with the Pallas line-search costs (interpret
        mode on CPU) vs the plain XLA path."""
        import jax

        from vehicle_control_tpu.controllers.mpc.controllers import (
            initial_carry,
            make_mpc_step,
        )
        from vehicle_control_tpu.parallel import tile_carry
        from vehicle_control_tpu.solvers import ALILQRConfig

        cfg = dict(_cfg("controllers/singletrack.yaml"), obstacles=False)
        cfg["horizon"] = 6
        prob = problems.build_cascaded_problem(
            _cfg("models/dynamic_car.yaml"), ippodromo_track, cfg, "none",
            jnp.float32,
        )
        B = 8  # exercises the pad-to-1024 path
        rng = np.random.default_rng(2)
        states = np.zeros((B, 8), np.float32)
        states[:, 0] = 5.0 + rng.uniform(0, 5, B)
        states[:, 4] = rng.uniform(0, 200, B)
        states = jnp.asarray(states)

        out = {}
        for use_kernel in (False, True):
            scfg = ALILQRConfig(
                n_outer=1,
                n_inner=2,  # interpret-mode kernels are slow on CPU
                use_ls_kernel=use_kernel,
                use_derivs_kernel=use_kernel,
            )
            step = jax.jit(jax.vmap(make_mpc_step(prob, scfg)))
            carries = tile_carry(prob, B, jnp.float32)
            carries, actions, infos = step(carries, states)
            out[use_kernel] = (np.asarray(actions), np.asarray(infos.cost))

        # line-search decisions agree up to kernel/XLA cost noise (~4e-5):
        # identical selections give identical actions; allow tiny drift
        np.testing.assert_allclose(out[True][0], out[False][0], rtol=2e-3, atol=2e-2)
        np.testing.assert_allclose(out[True][1], out[False][1], rtol=2e-3, atol=1e-2)


@pytest.mark.skipif(
    not os.environ.get("RUN_KERNEL_TESTS"),
    reason="interpret-mode Pallas emulation is minutes-slow on CPU; "
    "set RUN_KERNEL_TESTS=1 (verified on real TPU: bitwise match)",
)
class TestFieldMajorDerivsKernel:
    def test_matches_xla_stage_derivs(self, setup):
        from vehicle_control_tpu.solvers.al_ilqr import _al_penalty
        from vehicle_control_tpu.solvers.derivs_kernel_fm import (
            build_derivs_kernel_fm,
        )
        from vehicle_control_tpu.solvers.rollout_kernel import B_TILE

        cfg = dict(_cfg("controllers/singletrack.yaml"), obstacles=False)
        cfg["horizon"] = 4  # interpret mode is slow; keep the grid tiny
        from vehicle_control_tpu.controllers.mpc import problems as _p

        prob = _p.build_cascaded_problem(
            _cfg("models/dynamic_car.yaml"),
            setup_track_for_derivs(),
            cfg,
            "none",
            jnp.float32,
        )
        B = B_TILE
        Xref, Uref, kff, Kfb, lam, mu, pv, zv = _data(prob, B)
        fns = prob.fns
        H, nz = prob.horizon, prob.nz

        # XLA reference: the solver's stage_derivs
        def stage_derivs(n, z, u, lam_n, m, params):
            w = jnp.concatenate([z, u])
            cost_fn = lambda w_: (
                fns.stage_cost(n, w_[:nz], w_[nz:], params)
                + _al_penalty(fns.constraints(n, w_[:nz], w_[nz:], params), lam_n, m)
            )
            g = jax.grad(cost_fn)(w)
            Hw = jax.jacfwd(jax.grad(cost_fn))(w)
            dyn = lambda w_: fns.dynamics(n, w_[:nz], w_[nz:], params)
            J = jax.jacfwd(dyn)(w)
            return g, Hw, J

        one = jax.vmap(stage_derivs, in_axes=(0, 0, 0, 0, None, None))
        ref = jax.vmap(
            lambda X, U, L, m, pp: one(jnp.arange(H), X, U, L, m, pp),
            in_axes=(0, 0, 0, 0, 0),
        )(Xref, Uref, lam, mu, pv)

        from vehicle_control_tpu.solvers.fm_family import build_cascaded_family

        fam = build_cascaded_family(
            _cfg("models/dynamic_car.yaml"), cfg, "none", setup_track_for_derivs().data
        )
        run = build_derivs_kernel_fm(fam)
        g, Hw, J = run(
            Xref, Uref, lam, mu, pv.curvature, pv.ds, interpret=True
        )
        np.testing.assert_allclose(np.asarray(g), np.asarray(ref[0]), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(Hw), np.asarray(ref[1]), rtol=3e-3, atol=3e-3)
        np.testing.assert_allclose(np.asarray(J), np.asarray(ref[2]), rtol=2e-4, atol=2e-4)
