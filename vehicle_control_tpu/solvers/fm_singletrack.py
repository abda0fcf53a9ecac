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
from vehicle_control_tpu.utils.math import arctan, tan

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


# ---------------------------------------------------------------------------
# Analytic RK4 Jacobian (the single-track hot path's dominant AD cost)
# ---------------------------------------------------------------------------
# jax.linearize(rk4_step) re-executes the stored linear map once per tangent
# column (~1.3k tile-ops x 8 columns); the chain below evaluates the 8x10
# Jacobian of spatial_prime ONCE per RK4 substage — with the tire partials
# written out and shared across columns — and propagates all 8 columns as an
# explicit matrix recursion.  Derivatives replicate the AD semantics of every
# guard (clip/max ties at 0.5, where-branch selection, |x| grad 1 at 0, the
# softplus floor's sigmoid, arctan' = 1/(1+x^2)), so results match
# jax.linearize to fp rounding (tests/test_kernel_trace.py).


def _clipg(x, lo, hi):
    """d(clip(x, lo, hi))/dx with JAX's 0.5-at-tie convention (min o max)."""
    m = jnp.maximum(x, lo)
    gl = jnp.where(x > lo, 1.0, jnp.where(x < lo, 0.0, 0.5))
    gh = jnp.where(m < hi, 1.0, jnp.where(m > hi, 0.0, 0.5))
    return gl * gh


def _sigmoid(y):
    e = jnp.exp(-jnp.abs(y))
    return jnp.where(y >= 0, 1.0 / (1.0 + e), e / (1.0 + e))


def _mac(acc, coef, t):
    """acc + coef * t, skipping python-float structural zeros at trace time."""
    if isinstance(t, float) and t == 0.0:
        return acc
    if isinstance(coef, float) and coef == 0.0:
        return acc
    term = t if isinstance(coef, float) and coef == 1.0 else coef * t
    if isinstance(acc, float) and acc == 0.0:
        return term
    return acc + term


def spatial_prime_jac(x, Fx, wact, k, p):
    """spatial_prime value + analytic Jacobian.

    Returns ``(prime, J)``: ``prime`` the 8 d(state)/ds field tiles and
    ``J[i]`` a dict mapping input index -> d(prime_i)/d(input) (python-float
    entries allowed), where inputs 0-7 are the (unclamped) state fields, 8 is
    Fx and 9 is wact.  Structural zeros are absent from the dicts.
    """
    cg = {i: _clipg(x[i], lo, hi) for i, (lo, hi) in CLAMPS.items()}
    xc = list(x)
    for i, (lo, hi) in CLAMPS.items():
        xc[i] = jnp.clip(x[i], lo, hi)
    Ux, Uy, r, delta, s, ey, epsi, t = xc

    # slip angles (safe_div guard never binds: Ux clamped >= 1)
    inv_Ux = 1.0 / Ux
    qf = (Uy + p.a * r) * inv_Ux
    qr = (Uy - p.b * r) * inv_Ux
    af = arctan(qf) - delta
    ar = arctan(qr)
    gaf = inv_Ux / (1.0 + qf * qf)  # d(arctan(qf))/d* common factor / Ux
    gar = inv_Ux / (1.0 + qr * qr)
    daf = {0: -gaf * qf, 1: gaf, 2: gaf * p.a, 3: -1.0}
    dar = {0: -gar * qr, 1: gar, 2: -gar * p.b}

    # drive/brake split (functions of Fx only)
    dss = dc.DRIVE_SPLIT_SCALE
    thf = jnp.tanh(2.0 * (Fx / dss + 0.5))
    Xf = (p.Xdf - p.Xbf) / 2 * thf + (p.Xdf + p.Xbf) / 2
    fxf = Fx * Xf
    dfxf = Xf + Fx * ((p.Xdf - p.Xbf) * (1.0 - thf * thf) / dss)
    thr = jnp.tanh(-2.0 * (Fx / dss + 0.5))
    Xr = (p.Xbr - p.Xdr) / 2 * thr + (p.Xdr + p.Xbr) / 2
    fxr = Fx * Xr
    dfxr = Xr - Fx * ((p.Xbr - p.Xdr) * (1.0 - thr * thr) / dss)

    # normal loads + friction-limited Fy_max (safe_sqrt guard semantics)
    import math as _math

    gcc = dc.GRAVITY * _math.cos(p.theta) * _math.cos(p.phi)
    czf = (p.b / p.l) * p.m
    czr = (p.a / p.l) * p.m
    Fzf = czf * (gcc + p.Av2 * Ux * Ux) - p.h * Fx / p.l
    Fzr = czr * (gcc + p.Av2 * Ux * Ux) + p.h * Fx / p.l
    dFzf_Ux = (2.0 * czf * p.Av2) * Ux if p.Av2 != 0.0 else 0.0
    dFzr_Ux = (2.0 * czr * p.Av2) * Ux if p.Av2 != 0.0 else 0.0

    def fymax_and_d(mu_ax, Fz, dFz_Ux, dFz_Fx, fx_ax, dfx_ax):
        arg = (mu_ax * Fz) ** 2 - (0.99 * fx_ax) ** 2
        live = jnp.where(arg > 1e-9, 1.0, jnp.where(arg < 1e-9, 0.0, 0.5))
        F = jnp.sqrt(jnp.maximum(arg, 1e-9))
        halfinv = live / F
        dF_Ux = (
            (mu_ax * mu_ax) * Fz * halfinv * dFz_Ux
            if not (isinstance(dFz_Ux, float) and dFz_Ux == 0.0)
            else 0.0
        )
        dF_Fx = (
            (mu_ax * mu_ax) * Fz * dFz_Fx - 0.9801 * fx_ax * dfx_ax
        ) * halfinv
        return F, dF_Ux, dF_Fx

    Ff, dFf_Ux, dFf_Fx = fymax_and_d(
        p.mu_f, Fzf, dFzf_Ux, -p.h / p.l, fxf, dfxf
    )
    Fr, dFr_Ux, dFr_Fx = fymax_and_d(
        p.mu_r, Fzr, dFzr_Ux, p.h / p.l, fxr, dfxr
    )

    # modified Fiala tire + branch-selected partials
    def fiala_and_d(alpha, F, dF_Ux, dF_Fx, dal, Ca):
        ta = tan(alpha)
        dta = 1.0 + ta * ta
        amod = arctan(3.0 * F * p.eps / Ca)
        ata = jnp.abs(ta)
        inv3F = 1.0 / (3.0 * F)
        unsat = -Ca * ta + Ca * Ca * ata * ta * inv3F - (
            Ca * Ca * Ca / 27.0
        ) * ta * ta * ta * (9.0 * inv3F * inv3F)
        # d(unsat)/dta and /dF (d(|ta| ta)/dta = 2|ta|, exact incl. ta = 0)
        u_dta = -Ca + 2.0 * Ca * Ca * ata * inv3F - (
            Ca * Ca * Ca
        ) * ta * ta * inv3F * inv3F
        u_dF = (
            -(Ca * Ca) * ata * ta + 2.0 * (Ca * Ca * Ca / 3.0) * ta * ta * ta * inv3F
        ) * 3.0 * inv3F * inv3F
        e = p.eps
        csat = Ca * (1.0 - 2.0 * e + e * e)
        ksat = 3.0 * e * e - 2.0 * e * e * e
        sgn = jnp.sign(alpha)
        sat = -csat * ta - F * ksat * sgn
        s_dta = -csat
        s_dF = -ksat * sgn
        sel = jnp.abs(alpha) <= amod
        fy = jnp.where(sel, unsat, sat)
        fy_dta = jnp.where(sel, u_dta, s_dta)
        fy_dF = jnp.where(sel, u_dF, s_dF)
        chain_ta = fy_dta * dta
        d = {}
        for j, dj in dal.items():
            d[j] = _mac(0.0, chain_ta, dj)
        if not (isinstance(dF_Ux, float) and dF_Ux == 0.0):
            d[0] = _mac(d.get(0, 0.0), fy_dF, dF_Ux)
        d_Fx = fy_dF * dF_Fx
        return fy, d, d_Fx

    fyf, dfyf, dfyf_Fx = fiala_and_d(af, Ff, dFf_Ux, dFf_Fx, daf, p.Caf)
    fyr, dfyr, dfyr_Fx = fiala_and_d(ar, Fr, dFr_Ux, dFr_Fx, dar, p.Car)

    # temporal rows and their partials (keys: 0-7 state, 8 Fx, 9 wact)
    Fd = p.Frr + p.Cd * Ux * Ux
    dFd = 2.0 * p.Cd * Ux
    cd = jnp.cos(delta)
    sd = jnp.sin(delta)
    minv = 1.0 / p.m
    f0 = (fxf * cd - fyf * sd + fxr - Fd) * minv + r * Uy
    J0 = {
        0: (_mac(0.0, -sd, dfyf.get(0, 0.0)) - dFd) * minv,
        1: -sd * dfyf[1] * minv + r,
        2: -sd * dfyf[2] * minv + Uy,
        3: (-fxf * sd - dfyf[3] * sd - fyf * cd) * minv,
        8: (dfxf * cd - dfyf_Fx * sd + dfxr) * minv,
    }
    f1 = (fyf * cd + fxf * sd + fyr) * minv - r * Ux
    J1 = {
        0: (_mac(0.0, cd, dfyf.get(0, 0.0)) + dfyr.get(0, 0.0)) * minv - r,
        1: (dfyf[1] * cd + dfyr[1]) * minv,
        2: (dfyf[2] * cd + dfyr[2]) * minv - Ux,
        3: (dfyf[3] * cd - fyf * sd + fxf * cd) * minv,
        8: (dfyf_Fx * cd + dfxf * sd + dfyr_Fx) * minv,
    }
    zinv = 1.0 / p.Izz
    f2 = (p.a * (fyf * cd + fxf * sd) - p.b * fyr) * zinv
    J2 = {
        0: (
            p.a * _mac(0.0, cd, dfyf.get(0, 0.0))
            - p.b * dfyr.get(0, 0.0)
        ) * zinv,
        1: (p.a * dfyf[1] * cd - p.b * dfyr[1]) * zinv,
        2: (p.a * dfyf[2] * cd - p.b * dfyr[2]) * zinv,
        3: (p.a * (dfyf[3] * cd - fyf * sd + fxf * cd)) * zinv,
        8: (p.a * (dfyf_Fx * cd + dfxf * sd) - p.b * dfyr_Fx) * zinv,
    }
    f3 = wact
    ce = jnp.cos(epsi)
    se = jnp.sin(epsi)
    deninv = 1.0 / (1.0 - k * ey)
    sdot = (Ux * ce - Uy * se) * deninv
    J4 = {
        0: ce * deninv,
        1: -se * deninv,
        5: sdot * k * deninv,
        6: (-Ux * se - Uy * ce) * deninv,
    }
    f5 = Ux * se + Uy * ce
    J5 = {0: se, 1: ce, 6: Ux * ce - Uy * se}
    f6 = r - k * sdot
    J6 = {2: 1.0}
    for j, dj in J4.items():
        J6[j] = _mac(J6.get(j, 0.0), -k, dj)

    # spatial regularization (softplus floor) and division
    y = BETA * (sdot - FLOOR)
    sde = FLOOR + jnp.logaddexp(0.0, y) / BETA
    inv = 1.0 / sde
    dinv_dsdot = -(inv * inv) * _sigmoid(y)
    dinv = {j: dinv_dsdot * dj for j, dj in J4.items()}

    def spat(fi, Ji):
        pi = fi * inv
        out = {}
        keys = set(Ji) | set(dinv)
        for j in keys:
            out[j] = _mac(_mac(0.0, inv, Ji.get(j, 0.0)), fi, dinv.get(j, 0.0))
        return pi, out

    p0, P0 = spat(f0, J0)
    p1, P1 = spat(f1, J1)
    p2, P2 = spat(f2, J2)
    p3, P3 = spat(f3, {})
    P3[9] = inv  # d(wact * inv)/d(wact)
    p5, P5 = spat(f5, J5)
    p6, P6 = spat(f6, J6)
    p7 = inv
    P7 = dict(dinv)

    prime = [p0, p1, p2, p3, jnp.ones_like(sdot), p5, p6, p7]
    J = [P0, P1, P2, P3, {}, P5, P6, P7]
    # chain through the input clamps (columns of the clamped variables)
    for Ji in J:
        for j in list(Ji):
            if j in cg:
                Ji[j] = Ji[j] * cg[j]
    return prime, J


def rk4_step_jac(x, Fx, wact, k, h, p):
    """rk4_step + analytic tangent columns.

    Returns ``(next8, T)``: ``T[i][c]`` = d(next_i)/d(column c) with columns
    ``(Ux, Uy, r, delta, ey, epsi, Fx, wact)`` — the s/t columns are
    structurally trivial (handled closed-form by the caller).  Entries may be
    python-float structural zeros.
    """
    COLS = (0, 1, 2, 3, 5, 6)
    NCOL = 8

    # tangent rows for the pseudo-inputs Fx (8) and wact (9): constants
    tFx = [0.0] * NCOL
    tFx[6] = 1.0
    tw = [0.0] * NCOL
    tw[7] = 1.0

    def apply(J, Tx):
        out = []
        for i in range(8):
            row = []
            for c in range(NCOL):
                acc = 0.0
                for j, coef in J[i].items():
                    tj = tFx[c] if j == 8 else (tw[c] if j == 9 else Tx[j][c])
                    acc = _mac(acc, coef, tj)
                row.append(acc)
            out.append(row)
        return out

    def add_scaled(Ta, Da, c):
        return [
            [_mac(Ta[i][cc], c, Da[i][cc]) for cc in range(NCOL)]
            for i in range(8)
        ]

    T0 = [[0.0] * NCOL for _ in range(8)]
    for ci, i in enumerate(COLS):
        T0[i][ci] = 1.0

    k1, J1 = spatial_prime_jac(x, Fx, wact, k, p)
    D1 = apply(J1, T0)
    x2 = [a + 0.5 * h * b for a, b in zip(x, k1)]
    T2 = add_scaled(T0, D1, 0.5 * h)
    k2, J2 = spatial_prime_jac(x2, Fx, wact, k, p)
    D2 = apply(J2, T2)
    x3 = [a + 0.5 * h * b for a, b in zip(x, k2)]
    T3 = add_scaled(T0, D2, 0.5 * h)
    k3, J3 = spatial_prime_jac(x3, Fx, wact, k, p)
    D3 = apply(J3, T3)
    x4 = [a + h * b for a, b in zip(x, k3)]
    T4 = add_scaled(T0, D3, h)
    k4, J4 = spatial_prime_jac(x4, Fx, wact, k, p)
    D4 = apply(J4, T4)

    next8 = [
        a + h * (b1 + 2.0 * b2 + 2.0 * b3 + b4) / 6.0
        for a, b1, b2, b3, b4 in zip(x, k1, k2, k3, k4)
    ]
    h6 = h / 6.0
    T = [
        [
            _mac(
                T0[i][c],
                h6,
                _mac(
                    _mac(_mac(D1[i][c], 2.0, D2[i][c]), 2.0, D3[i][c]),
                    1.0,
                    D4[i][c],
                ),
            )
            for c in range(NCOL)
        ]
        for i in range(8)
    ]
    return next8, T


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
