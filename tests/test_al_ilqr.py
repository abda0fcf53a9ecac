"""Solver-layer tests (SURVEY §4: 'solver (KKT residuals, comparison vs
scipy ... on small QPs)')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import minimize

from vehicle_control_tpu.solvers import ALILQRConfig, OCPFunctions, build_solver


def _lqr_problem(H=15):
    """Double integrator, pure quadratic cost, no constraints."""
    dt = 0.1
    A = np.array([[1.0, dt], [0.0, 1.0]])
    B = np.array([[0.5 * dt**2], [dt]])
    Q = np.diag([1.0, 0.1])
    R = np.array([[0.01]])
    Qf = np.diag([10.0, 1.0])

    Aj, Bj, Qj, Rj, Qfj = map(jnp.asarray, (A, B, Q, R, Qf))

    def dynamics(n, z, u, params):
        return Aj @ z + Bj @ u

    def stage_cost(n, z, u, params):
        running = 0.5 * z @ Qj @ z + 0.5 * u @ Rj @ u
        terminal = 0.5 * z @ Qfj @ z
        return jnp.where(n == H - 1, terminal, running)

    def constraints(n, z, u, params):
        return jnp.full((1,), -1.0)  # always satisfied

    return OCPFunctions(dynamics, stage_cost, constraints), (A, B, Q, R, Qf)


def _lqr_reference(A, B, Q, R, Qf, x0, H):
    """Exact finite-horizon discrete Riccati solution."""
    P = Qf
    Ks = []
    for _ in range(H - 1):
        K = np.linalg.solve(R + B.T @ P @ B, B.T @ P @ A)
        P = Q + A.T @ P @ A - A.T @ P @ B @ K
        Ks.append(K)
    Ks = Ks[::-1]
    xs, us = [x0], []
    for n in range(H - 1):
        u = -Ks[n] @ xs[-1]
        us.append(u)
        xs.append(A @ xs[-1] + B @ u)
    return np.array(xs), np.array(us)


class TestLQRExactness:
    def test_matches_analytic_riccati(self):
        H = 15
        fns, (A, B, Q, R, Qf) = _lqr_problem(H)
        solve = jax.jit(build_solver(fns, H, ALILQRConfig(n_outer=1, n_inner=5)))
        x0 = jnp.asarray([1.0, -0.5])
        U0 = jnp.zeros((H, 1))
        sol = solve(None, x0, U0)

        xs_ref, us_ref = _lqr_reference(A, B, Q, R, Qf, np.array([1.0, -0.5]), H)
        # iLQR solves an LQR problem exactly in one accepted iteration
        np.testing.assert_allclose(np.asarray(sol.U[: H - 1]), us_ref, atol=1e-8)
        np.testing.assert_allclose(np.asarray(sol.X), xs_ref, atol=1e-8)
        assert bool(sol.converged)


class TestConstrainedVsScipy:
    def test_control_bounded_double_integrator(self):
        """min sum(u^2) + terminal position error, |u| <= 1."""
        H = 12
        dt = 0.2
        Aj = jnp.asarray([[1.0, dt], [0.0, 1.0]])
        Bj = jnp.asarray([[0.5 * dt**2], [dt]])
        target = 2.0

        def dynamics(n, z, u, params):
            return Aj @ z + Bj @ u

        def stage_cost(n, z, u, params):
            running = 0.05 * u[0] ** 2
            terminal = 50.0 * (z[0] - target) ** 2 + 50.0 * z[1] ** 2
            return jnp.where(n == H - 1, terminal, running)

        def constraints(n, z, u, params):
            return jnp.stack([u[0] - 1.0, -1.0 - u[0]])

        fns = OCPFunctions(dynamics, stage_cost, constraints)
        solve = jax.jit(
            build_solver(fns, H, ALILQRConfig(n_outer=6, n_inner=10, mu0=1.0))
        )
        sol = solve(None, jnp.zeros(2), jnp.zeros((H, 1)))

        # scipy reference on the same single-shooting objective
        A = np.asarray(Aj)
        B = np.asarray(Bj)

        def obj(u_flat):
            z = np.zeros(2)
            cost = 0.0
            for n in range(H - 1):
                cost += 0.05 * u_flat[n] ** 2
                z = A @ z + B @ np.array([u_flat[n]])
            cost += 50.0 * (z[0] - target) ** 2 + 50.0 * z[1] ** 2
            return cost

        res = minimize(
            obj,
            np.zeros(H - 1),
            bounds=[(-1, 1)] * (H - 1),
            method="SLSQP",
            options={"maxiter": 500, "ftol": 1e-12},
        )
        ours = float(sol.cost)
        assert bool(sol.violation < 1e-3)
        # our cost includes the (unused) u[H-1] stage... it has zero weight at
        # the terminal stage, so costs are directly comparable
        assert ours <= res.fun * (1 + 1e-3) + 1e-6
        np.testing.assert_allclose(
            np.asarray(sol.U[: H - 1, 0]), res.x, atol=2e-2
        )

    def test_state_constraint_active(self):
        """Velocity cap via state constraint becomes active and is respected."""
        H = 20
        dt = 0.2
        Aj = jnp.asarray([[1.0, dt], [0.0, 1.0]])
        Bj = jnp.asarray([[0.5 * dt**2], [dt]])
        vmax = 0.8

        def dynamics(n, z, u, params):
            return Aj @ z + Bj @ u

        def stage_cost(n, z, u, params):
            running = 0.01 * u[0] ** 2 - 1.0 * z[0]  # drive position forward
            terminal = 0.0 * z[0]
            return jnp.where(n == H - 1, terminal, running)

        def constraints(n, z, u, params):
            return jnp.stack([z[1] - vmax, u[0] - 2.0, -2.0 - u[0]])

        fns = OCPFunctions(dynamics, stage_cost, constraints)
        solve = jax.jit(
            build_solver(fns, H, ALILQRConfig(n_outer=8, n_inner=10, mu0=1.0))
        )
        sol = solve(None, jnp.zeros(2), jnp.zeros((H, 1)))
        assert float(sol.violation) < 1e-3
        assert float(jnp.max(sol.X[:, 1])) <= vmax + 1e-3
        # the cap should actually bind (otherwise the test is vacuous)
        assert float(jnp.max(sol.X[:, 1])) > vmax - 0.05


class TestBatching:
    def test_vmap_over_initial_states(self):
        H = 15
        fns, (A, B, Q, R, Qf) = _lqr_problem(H)
        solve = build_solver(fns, H, ALILQRConfig(n_outer=1, n_inner=5))
        batch = jax.jit(jax.vmap(solve, in_axes=(None, 0, 0)))
        x0s = jnp.asarray(np.random.default_rng(0).normal(size=(16, 2)))
        U0s = jnp.zeros((16, H, 1))
        sols = batch(None, x0s, U0s)
        assert sols.U.shape == (16, H, 1)
        # each batch entry matches its individual solve
        single = jax.jit(solve)(None, x0s[3], U0s[3])
        np.testing.assert_allclose(
            np.asarray(sols.U[3]), np.asarray(single.U), atol=1e-10
        )
        assert bool(jnp.all(sols.converged))


class TestPolish:
    def test_polish_reduces_marginal_violation(self):
        """n_polish re-optimizes against the FINAL multiplier update: with a
        deliberately tight outer budget the residual on an active constraint
        shrinks (and never grows) when polish iterations are added."""
        H = 20
        dt = 0.2
        Aj = jnp.asarray([[1.0, dt], [0.0, 1.0]])
        Bj = jnp.asarray([[0.5 * dt**2], [dt]])
        vmax = 0.8

        def dynamics(n, z, u, params):
            return Aj @ z + Bj @ u

        def stage_cost(n, z, u, params):
            running = 0.01 * u[0] ** 2 - 1.0 * z[0]
            terminal = 0.0 * z[0]
            return jnp.where(n == H - 1, terminal, running)

        def constraints(n, z, u, params):
            return jnp.stack([z[1] - vmax, u[0] - 2.0, -2.0 - u[0]])

        fns = OCPFunctions(dynamics, stage_cost, constraints)
        base = dict(n_outer=2, n_inner=4, mu0=1.0)
        sol0 = jax.jit(build_solver(fns, H, ALILQRConfig(**base)))(
            None, jnp.zeros(2), jnp.zeros((H, 1))
        )
        solp = jax.jit(build_solver(fns, H, ALILQRConfig(**base, n_polish=3)))(
            None, jnp.zeros(2), jnp.zeros((H, 1))
        )
        assert float(sol0.violation) > 1e-4  # budget tight enough to matter
        assert float(solp.violation) <= float(sol0.violation) * 1.01
        assert float(solp.violation) < float(sol0.violation) * 0.75
