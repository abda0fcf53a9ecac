"""Field-major single-track physics shared by the Pallas kernels.

State is a list/tuple of individual (8, 128) field tiles (never stacked
along a trailing axis — see PLAN.md "Round-1 findings").  The math mirrors
the shared batch-polymorphic problem closures exactly (equivalence-tested in
tests/test_rollout_kernel.py); the scalar tire-force helpers are reused from
models.dynamic_car directly.
"""

from __future__ import annotations

import jax.numpy as jnp

from vehicle_control_tpu.models import dynamic_car as dc
from vehicle_control_tpu.utils.math import tan

FORCE_SCALE = 1000.0

# solver-side regularization of the spatial single-track dynamics
# (problems._regularized_spatial configuration for the st stage)
CLAMPS = {0: (1.0, 1e3), 3: (-1.0, 1.0), 5: (-8.0, 8.0), 6: (-1.3, 1.3)}
FLOOR, BETA = 0.3, 10.0


def temporal_fields(x, Fx, wact, k, p):
    """Field-tile single-track temporal ODE (models.dynamic_car.temporal_ode);
    returns the 8 d(state)/dt tiles, unclamped and undivided."""
    Ux, Uy, r, delta, s, ey, epsi, t = x
    fxf = dc.Fx_f(Fx, p)
    fxr = dc.Fx_r(Fx, p)
    fyf = dc.Fy_f(Ux, Uy, r, delta, Fx, p)
    fyr = dc.Fy_r(Ux, Uy, r, delta, Fx, p)
    Fd = dc.drag(Ux, p)
    cd = jnp.cos(delta)
    sd = jnp.sin(delta)
    Ux_dot = (fxf * cd - fyf * sd + fxr - Fd) / p.m + r * Uy
    Uy_dot = (fyf * cd + fxf * sd + fyr) / p.m - r * Ux
    r_dot = (p.a * (fyf * cd + fxf * sd) - p.b * fyr) / p.Izz
    s_dot = (Ux * jnp.cos(epsi) - Uy * jnp.sin(epsi)) / (1.0 - k * ey)
    ey_dot = Ux * jnp.sin(epsi) + Uy * jnp.cos(epsi)
    epsi_dot = r - k * s_dot
    return [Ux_dot, Uy_dot, r_dot, wact, s_dot, ey_dot, epsi_dot,
            jnp.ones_like(s_dot)]


def spatial_prime(x, Fx, wact, k, p):
    """x: 8 field tiles -> d(state)/ds field list (single-track stage)."""
    x = list(x)
    for i, (lo, hi) in CLAMPS.items():
        x[i] = jnp.clip(x[i], lo, hi)
    xdot = temporal_fields(x, Fx, wact, k, p)
    s_dot = xdot[4]
    s_dot_eff = FLOOR + jnp.logaddexp(0.0, BETA * (s_dot - FLOOR)) / BETA
    inv = 1.0 / s_dot_eff
    return [
        xdot[0] * inv,
        xdot[1] * inv,
        xdot[2] * inv,
        xdot[3] * inv,
        jnp.ones_like(s_dot),
        xdot[5] * inv,
        xdot[6] * inv,
        inv,
    ]


def rk4_step(x, Fx, wact, k, h, p):
    k1 = spatial_prime(x, Fx, wact, k, p)
    k2 = spatial_prime([a + 0.5 * h * b for a, b in zip(x, k1)], Fx, wact, k, p)
    k3 = spatial_prime([a + 0.5 * h * b for a, b in zip(x, k2)], Fx, wact, k, p)
    k4 = spatial_prime([a + h * b for a, b in zip(x, k3)], Fx, wact, k, p)
    return [
        a + h * (b1 + 2.0 * b2 + 2.0 * b3 + b4) / 6.0
        for a, b1, b2, b3, b4 in zip(x, k1, k2, k3, k4)
    ]


def boundary_fields(ey, dsn, wb, lo, hi):
    """Soft road-bound penalty tile (problems._boundary)."""
    below = jnp.where(ey < lo, (ey - lo) ** 2, 0.0)
    above = jnp.where(ey > hi, (ey - hi) ** 2, 0.0)
    return wb * dsn * (below + above)


def slip_penalty_fields(x, Fx, p, w_slip):
    """Soft slip-angle penalty tile (problems._slip_penalty)."""
    Ux, Uy, r, delta = x[0], x[1], x[2], x[3]
    ta_f = jnp.abs(tan(dc.alpha_f(Ux, Uy, r, delta, p)))
    tam_f = tan(dc.alphamod_f(Fx, Ux, p))
    ta_r = jnp.abs(tan(dc.alpha_r(Ux, Uy, r, delta, p)))
    tam_r = tan(dc.alphamod_r(Fx, Ux, p))
    return w_slip * (
        jnp.where(ta_f >= tam_f, (ta_f - tam_f) ** 2, 0.0)
        + jnp.where(ta_r >= tam_r, (ta_r - tam_r) ** 2, 0.0)
    )


def st_running_cost_fields(n, x, Fx, wact, Fx_prev, dsn, ds_prev, p, w, cs, N):
    """Single-track running cost, no terminal (problems.st_cost sans obstacles)."""
    ey = x[5]
    cost = boundary_fields(ey, dsn, w["boundary"], cs["ey_min"], cs["ey_max"])
    cost += w["deviation_st"] * dsn * ey**2
    cost += w["w"] * wact**2
    cost += slip_penalty_fields(x, Fx, p, w["slip"])
    slew_on = (n >= 1) & (n < N)
    cost += slew_on * (w["Fx"] / ds_prev) * (Fx - Fx_prev) ** 2
    return cost


def stage_cost_fields(n, x, Fx, wact, Fx_prev, dsn, ds_prev, p, w, cs, N, H):
    """Single-track stage cost incl. folded terminal (problems.st_cost)."""
    Ux, ey, epsi, t = x[0], x[5], x[6], x[7]
    cost = st_running_cost_fields(
        n, x, Fx, wact, Fx_prev, dsn, ds_prev, p, w, cs, N
    )
    over = jnp.where(Ux >= cs["max_speed"], (Ux - cs["max_speed"]) ** 2, 0.0)
    term = w["speed"] * over + w["time"] * t + w["ey"] * ey**2 + w["epsi"] * epsi**2
    return cost + (n == H - 1) * term


def constraint_fields(x, Fx, wact, p, ci, cs):
    """The 10 single-track stage constraints (problems._st_constraints)."""
    fs = 1.0 / FORCE_SCALE
    Ux, Uy, r, delta, s, ey, epsi, t = x
    bound_f = p.mu_f * dc.Fz_f(Ux, Fx, p) * jnp.cos(dc.alpha_f(Ux, Uy, r, delta, p))
    bound_r = p.mu_r * dc.Fz_r(Ux, Fx, p) * jnp.cos(dc.alpha_r(Ux, Uy, r, delta, p))
    fxf = dc.Fx_f(Fx, p)
    fxr = dc.Fx_r(Fx, p)
    return [
        cs["Ux_min"] - Ux,
        delta - cs["delta_max"],
        cs["delta_min"] - delta,
        (Fx - p.Peng / jnp.maximum(Ux, 1.0)) * fs,
        wact - ci["w_max"],
        ci["w_min"] - wact,
        (fxf - bound_f) * fs,
        (-fxf - bound_f) * fs,
        (fxr - bound_r) * fs,
        (-fxr - bound_r) * fs,
    ]


def al_penalty_fields(cons, lam_read, mu):
    """PHR penalty over a constraint field list; lam_read(j) -> tile."""
    acc = jnp.zeros_like(cons[0])
    for j, c in enumerate(cons):
        lam_j = lam_read(j)
        lam_hat = jnp.maximum(0.0, lam_j + mu * c)
        acc += lam_hat**2 - lam_j**2
    return acc / (2.0 * mu)
