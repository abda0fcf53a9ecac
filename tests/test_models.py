"""Model dynamics tests: finite-difference Jacobians, spatial/temporal
consistency, and golden closed-loop plant-step parity against the reference's
shipped experiment artifacts (SURVEY §4: golden fixtures)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vehicle_control_tpu.models import dynamic_car as dc
from vehicle_control_tpu.models import kinematic_car as kc
from vehicle_control_tpu.models import point_mass as pm
from vehicle_control_tpu.utils.config import load_config, project_root

ROOT = project_root()
REF_DATA = "/root/reference/experiments/data"


@pytest.fixture(scope="module")
def car_params():
    cfg = load_config(os.path.join(ROOT, "configs/models/dynamic_car.yaml"))
    return dc.DynamicCarParams.from_config(cfg)


def _sample_state():
    return jnp.asarray([12.0, 0.3, 0.1, 0.05, 40.0, 0.4, -0.02, 2.0])


def _sample_action():
    return jnp.asarray([3000.0, 0.05])


def test_force_balance_static(car_params):
    """Static normal loads split by lever arms and sum to m*g*(a+b)/l.

    Note the reference normalizes by total car length l (=3), not the axle
    distance a+b (=2.5) (dynamic_car.py:98-102) - we reproduce that exactly.
    """
    p = car_params
    fzf = dc.Fz_f(10.0, 0.0, p)
    fzr = dc.Fz_r(10.0, 0.0, p)
    expected_sum = float(p.m) * dc.GRAVITY * float((p.a + p.b) / p.l)
    np.testing.assert_allclose(float(fzf + fzr), expected_sum, rtol=1e-12)
    np.testing.assert_allclose(float(fzf / fzr), float(p.b / p.a), rtol=1e-12)


def test_weight_transfer_sign(car_params):
    """Accelerating (Fx>0) unloads the front axle (reference: dynamic_car.py:98)."""
    p = car_params
    assert float(dc.Fz_f(10.0, 5000.0, p)) < float(dc.Fz_f(10.0, 0.0, p))
    assert float(dc.Fz_r(10.0, 5000.0, p)) > float(dc.Fz_r(10.0, 0.0, p))


def test_drive_brake_split(car_params):
    """Drive force goes to the front (Xd f=1), brake splits 0.78/0.22."""
    p = car_params
    np.testing.assert_allclose(float(dc.Fx_f(5000.0, p)), 5000.0, rtol=1e-3)
    np.testing.assert_allclose(float(dc.Fx_r(5000.0, p)), 0.0, atol=5.0)
    np.testing.assert_allclose(float(dc.Fx_f(-5000.0, p)), -5000.0 * 0.78, rtol=1e-3)
    np.testing.assert_allclose(float(dc.Fx_r(-5000.0, p)), -5000.0 * 0.22, rtol=1e-3)


def test_fiala_linear_regime(car_params):
    """For tiny slip angles Fy ~ -C_alpha * alpha."""
    p = car_params
    alpha = 1e-4
    # construct state with exact front slip = alpha, zero rear slip
    Ux, r, delta = 10.0, 0.0, -alpha
    fy = dc.Fy_f(Ux, 0.0, r, delta, 0.0, p)
    np.testing.assert_allclose(float(fy), -float(p.Caf) * alpha, rtol=3e-3)


def test_fiala_saturation(car_params):
    """Beyond alphamod the lateral force magnitude is friction-limited."""
    p = car_params
    Ux = 10.0
    fymax = float(dc.Fy_max_f(Ux, 0.0, p))
    big_alpha = 0.5  # far past saturation
    fy = dc.Fy_f(Ux, Ux * np.tan(big_alpha), 0.0, 0.0, 0.0, p)
    eps = float(p.eps)
    expected_mag_floor = fymax * (3 * eps**2 - 2 * eps**3)
    assert abs(float(fy)) >= 0.95 * expected_mag_floor
    assert float(fy) < 0  # opposes positive slip


def test_fiala_continuity_at_alphamod(car_params):
    """The two Fiala branches must join continuously at alpha = alphamod."""
    p = car_params
    Ux, Fx = 10.0, 0.0
    am = float(dc.alphamod_f(Fx, Ux, p))
    lo = dc.Fy_f(Ux, Ux * np.tan(am - 1e-7), 0.0, 0.0, Fx, p)
    hi = dc.Fy_f(Ux, Ux * np.tan(am + 1e-7), 0.0, 0.0, Fx, p)
    np.testing.assert_allclose(float(lo), float(hi), rtol=1e-4)


def test_temporal_jacobians_vs_fd(car_params):
    """jacfwd of the dynamics must match finite differences (SURVEY §4)."""
    x, u = _sample_state(), _sample_action()
    k = 0.01
    f = lambda x_, u_: dc.temporal_ode(x_, u_, k, car_params)
    A = jax.jacfwd(f, argnums=0)(x, u)
    B = jax.jacfwd(f, argnums=1)(x, u)
    eps = 1e-6
    A_fd = np.stack(
        [(f(x + eps * jnp.eye(8)[i], u) - f(x - eps * jnp.eye(8)[i], u)) / (2 * eps)
         for i in range(8)], axis=1)
    B_fd = np.stack(
        [(f(x, u + eps * jnp.eye(2)[i]) - f(x, u - eps * jnp.eye(2)[i])) / (2 * eps)
         for i in range(2)], axis=1)
    np.testing.assert_allclose(np.asarray(A), A_fd, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(B), B_fd, rtol=1e-4, atol=1e-4)


def test_spatial_equals_temporal_over_sdot(car_params):
    x, u = _sample_state(), _sample_action()
    k = 0.01
    xdot = dc.temporal_ode(x, u, k, car_params)
    xprime = dc.spatial_ode(x, u, k, car_params)
    s_dot = xdot[4]
    expected = np.array(xdot / s_dot)
    expected[4] = 1.0
    np.testing.assert_allclose(np.asarray(xprime), expected, rtol=1e-12, atol=1e-12)


def test_vmap_batching(car_params):
    xs = jnp.stack([_sample_state()] * 4) + jnp.arange(4)[:, None] * 0.01
    us = jnp.stack([_sample_action()] * 4)
    ks = jnp.full((4,), 0.01)
    batched = jax.vmap(lambda x, u, k: dc.temporal_ode(x, u, k, car_params))(xs, us, ks)
    single = dc.temporal_ode(xs[2], us[2], ks[2], car_params)
    np.testing.assert_allclose(np.asarray(batched[2]), np.asarray(single), rtol=1e-12)


def test_kinematic_spatial_consistency():
    cfg = load_config(os.path.join(ROOT, "configs/models/kinematic_car.yaml"))
    p = kc.KinematicCarParams.from_config(cfg)
    x = jnp.asarray([8.0, 0.05, 10.0, 0.3, -0.05, 1.0])
    u = jnp.asarray([1.0, 0.1])
    k = 0.02
    xdot = kc.temporal_ode(x, u, k, p)
    xprime = kc.spatial_ode(x, u, k, p)
    s_dot = xdot[2]
    expected = np.array(xdot / s_dot)
    expected[2] = 1.0
    np.testing.assert_allclose(np.asarray(xprime), expected, rtol=1e-10)


def test_point_mass_ode():
    cfg = load_config(os.path.join(ROOT, "configs/models/dynamic_car.yaml"))
    p = pm.PointMassParams.from_config(cfg)
    x = jnp.asarray([10.0, 5.0, 0.2, 0.01, 1.0])
    u = jnp.asarray([2000.0, 500.0])
    xdot = pm.temporal_ode(x, u, 0.01, p)
    # V_dot = (Fx - Frr - Cd V^2)/m
    expected_vdot = (2000.0 - (220.0 + 0.4243 * 100.0)) / 1700.0
    np.testing.assert_allclose(float(xdot[0]), expected_vdot, rtol=1e-12)


# ---------------------------------------------------------------------------
# Golden closed-loop parity: replay the reference's plant steps
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not os.path.isdir(REF_DATA), reason="reference artifacts absent")
@pytest.mark.parametrize("run,ctrl", [("race1_ippodromo", "cascaded"),
                                      ("race1_ippodromo", "singletrack")])
def test_golden_plant_step(ippodromo_track, car_params, run, ctrl):
    """state[n+1] must equal RK4_temporal(state[n], action[n+1], k(s_n), dt).

    This replays the exact plant transitions the reference logged
    (racing.py:232-236: command -> drive -> log), validating the dynamic-car
    temporal ODE, the RK4 discretization AND the track curvature spline in one
    shot against float64 golden data.
    """
    from vehicle_control_tpu.environment import track as track_mod

    states = np.load(f"{REF_DATA}/{run}/{ctrl}_state_traj.npy")
    actions = np.load(f"{REF_DATA}/{run}/{ctrl}_action_traj.npy")
    dt = 0.05

    x = jnp.asarray(states[:-1])  # (T, 8)
    u = jnp.asarray(actions[1:])  # action logged after drive
    k = track_mod.curvature(ippodromo_track.data, x[:, 4])
    step = jax.vmap(lambda x_, u_, k_: dc.make_transitions(car_params)[0](x_, u_, k_, dt))
    x_next = np.asarray(step(x, u, k))

    err = np.abs(x_next - states[1:])
    # normalize per-component by scale
    scale = np.maximum(np.abs(states[1:]).max(axis=0), 1.0)
    rel = err / scale
    # The raw reference track has spline-ringing spots (e.g. ippodromo
    # s~288 m, where the smoothing window ends and raw waypoints kink) where
    # any two cubic interpolants disagree at the 1e-3 level; the quantile
    # bound tolerates those isolated steps while still pinning the dynamics.
    p995 = np.quantile(rel.max(axis=1), 0.995)
    assert p995 < 2e-4, f"golden mismatch p99.5 rel err: {p995}"
    assert rel.max() < 5e-3, f"golden mismatch max rel err: {rel.max(axis=0)}"
