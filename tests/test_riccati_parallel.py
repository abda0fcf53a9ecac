"""Associative-scan Riccati vs the sequential sweep."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vehicle_control_tpu.solvers.riccati import riccati_backward
from vehicle_control_tpu.solvers.riccati_parallel import riccati_backward_parallel


def _random_problem(H, nx, nu, seed, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    lz = rng.normal(size=(H, nx))
    lu = rng.normal(size=(H, nu))
    # PD-ish cost blocks
    M = rng.normal(size=(H, nx + nu, nx + nu)) * 0.3
    Hw = np.einsum("hij,hkj->hik", M, M) + np.eye(nx + nu) * 0.5
    lzz = Hw[:, :nx, :nx]
    luz = Hw[:, nx:, :nx]
    luu = Hw[:, nx:, nx:]
    A = np.eye(nx) + rng.normal(size=(H, nx, nx)) * 0.05
    B = rng.normal(size=(H, nx, nu)) * 0.3
    return tuple(jnp.asarray(a, dtype) for a in (lz, lu, lzz, luz, luu, A, B))


@pytest.mark.parametrize("H,nx,nu", [(6, 4, 2), (30, 10, 2), (60, 10, 2)])
def test_matches_sequential(H, nx, nu):
    d = _random_problem(H, nx, nu, seed=H)
    rho = jnp.asarray(1e-6, jnp.float64)
    kff_s, Kfb_s, dV1_s, dV2_s, fail_s = riccati_backward(*d, rho, 1)
    kff_p, Kfb_p, dV1_p, dV2_p, fail_p = riccati_backward_parallel(*d, rho)
    assert not bool(fail_s) and not bool(fail_p)
    np.testing.assert_allclose(np.asarray(kff_p), np.asarray(kff_s), rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(Kfb_p), np.asarray(Kfb_s), rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(float(dV1_p), float(dV1_s), rtol=1e-8)
    np.testing.assert_allclose(float(dV2_p), float(dV2_s), rtol=1e-8)


def test_matches_on_solver_data(ippodromo_track):
    """Parity on real stage derivatives from a singletrack solve state."""
    import os

    from vehicle_control_tpu.controllers.mpc import problems
    from vehicle_control_tpu.controllers.mpc.controllers import initial_carry
    from vehicle_control_tpu.solvers.al_ilqr import _al_penalty, rollout
    from vehicle_control_tpu.utils.config import load_config, project_root

    cfg = dict(
        load_config(
            os.path.join(project_root(), "configs/controllers/singletrack.yaml")
        ),
        obstacles=False,
    )
    cfg["horizon"] = 12
    car = load_config(os.path.join(project_root(), "configs/models/dynamic_car.yaml"))
    prob = problems.build_cascaded_problem(car, ippodromo_track, cfg, "none", jnp.float64)
    fns = prob.fns
    H, nz = prob.horizon, prob.nz
    c0 = initial_carry(prob)
    st0 = jnp.zeros((8,), jnp.float64).at[0].set(7.0).at[4].set(40.0)
    params, z0 = prob.init_horizon(st0, c0.X_pred, c0.U_pred)
    U = jnp.clip(c0.U_pred, prob.u_lo, prob.u_hi)
    X, _ = rollout(fns, params, z0, U)
    lam = c0.lam
    mu = jnp.asarray(10.0, jnp.float64)

    def stage_derivs(n, z, u, lam_n):
        w = jnp.concatenate([z, u])
        cost = lambda ww: (
            fns.stage_cost(n, ww[:nz], ww[nz:], params)
            + _al_penalty(fns.constraints(n, ww[:nz], ww[nz:], params), lam_n, mu)
        )
        g = jax.grad(cost)(w)
        Hw = jax.jacfwd(jax.grad(cost))(w)
        Hw = 0.5 * (Hw + Hw.T)
        J = jax.jacfwd(lambda ww: fns.dynamics(n, ww[:nz], ww[nz:], params))(w)
        return (
            g[:nz], g[nz:], Hw[:nz, :nz], Hw[nz:, :nz], Hw[nz:, nz:],
            J[:, :nz], J[:, nz:],
        )

    d = jax.vmap(stage_derivs)(jnp.arange(H), X, U, lam)
    rho = jnp.asarray(1e-4, jnp.float64)
    kff_s, Kfb_s, dV1_s, dV2_s, fail_s = riccati_backward(*d, rho, 1)
    kff_p, Kfb_p, dV1_p, dV2_p, fail_p = riccati_backward_parallel(*d, rho)
    assert bool(fail_s) == bool(fail_p)
    scale = np.maximum(1.0, np.abs(np.asarray(kff_s)))
    np.testing.assert_allclose(
        np.asarray(kff_p) / scale, np.asarray(kff_s) / scale, rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(float(dV1_p), float(dV1_s), rtol=1e-6)
