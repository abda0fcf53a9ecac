"""Field-major problem families for the Pallas TPU kernels.

One builder covers every MPC formulation the framework ships (reference:
cascaded_mpc.py, cascaded_kinematic_mpc.py, kinematic_mpc.py) in the
field-major layout the kernels require: state/controls as individual
(8, 128) tiles, stage-switched physics computed from the *traced* stage
index, every weight/parameter inlined as a float literal (Mosaic cannot
capture array constants), static obstacle discs unrolled at build time.

A family is the single source of truth for the in-kernel AL cost and
dynamics — the derivatives kernel, the fused backward kernel and the
line-search kernel all consume the same closures (hoisting the previously
duplicated al_cost/dyn bodies out of the individual kernels).

The closures mirror controllers.mpc.problems exactly (equivalence-tested in
tests/test_rollout_kernel.py / test_backward_kernel.py); multiply-masked
branch structure is replicated 1:1 so kernel results match the XLA path
bitwise where the round-1 single-track kernels already did.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp
import numpy as np

from vehicle_control_tpu.models import dynamic_car as dc
from vehicle_control_tpu.solvers import fm_singletrack as fm
from vehicle_control_tpu.utils.math import arctan, safe_div, tan

FORCE_SCALE = fm.FORCE_SCALE
OBSTACLE_EPS = 1e-2  # problems.OBSTACLE_EPS


def _fast_disabled():
    """A/B escape hatch: FM_FAST_DERIVS=0 forces the generic AD path."""
    import os

    return os.environ.get("FM_FAST_DERIVS", "1") == "0"


class Seg(NamedTuple):
    """Static stage segment ``[lo, hi)`` over which every stage-switched
    branch of a family is constant (the cut set includes every branch
    point), so closures given ``seg`` compute ONLY the live branch instead
    of all branches masked by the traced stage index.  For the cascaded
    families this removes the full single-track RK4 (and its in-kernel AD)
    from the M tail stages — the dominant waste in the round-2 whole-solve
    kernel (tail stages are 2/3 of the cascaded horizon)."""

    lo: int
    hi: int


class FMFamily(NamedTuple):
    """Kernel-facing problem family.

    ``wf`` everywhere is the tuple of NZ state tiles followed by NU control
    tiles (solver units); ``lam_read(j)`` / ``ds_read(i)`` read multiplier
    and arc-step tiles (``i`` may be traced or static); ``kv`` is the stage
    curvature tile.

    When ``segments`` is set, every stage closure additionally accepts a
    keyword ``seg`` (one of those segments, or None for the fully-masked
    generic body); kernels iterate the stage loops one segment at a time so
    stage-switched physics specializes at trace time.
    """

    NZ: int
    NU: int
    NC: int
    H: int
    al_cost: Callable  # (n, wf, lam_read, mu, kv, ds_read) -> cost tile
    dyn: Callable  # (n, wf, kv, ds_read) -> tuple of NZ next-state tiles
    u_box: Callable  # (n, j) -> (lo, hi) clamp bounds, solver units
    stage_cost: Callable  # (n, wf, kv, ds_read) -> raw cost tile (no penalty)
    constraints: Callable  # (n, wf) -> list of NC tiles (c <= 0 feasible)
    # optional: (n, wf, ds_read) -> {col: (Hcol[NW], Jcol[NZ])} closed-form
    # Hessian/Jacobian columns for variables the family only touches
    # trivially (the prev-action stash); stage_derivs_cols skips the jvp for
    # those columns — 2 of 12 on the singletrack hot path
    analytic_cols: Callable | None = None
    # optional static partition of [0, H) for stage-specialized kernels
    segments: tuple | None = None
    # optional full replacement for stage_derivs_cols' generic AD:
    # (n, wf, lam, mu, kv, ds_read, seg=None) -> (g, Hcols, Jcols) or None
    # when the stage/segment isn't covered (caller falls back to the generic
    # tangent sweep).  Same exact math, restructured to exploit the family's
    # static sparsity (see build_cascaded_family's _st_fast).
    fast_derivs: Callable | None = None


def stage_derivs_cols(family, n, wf, lam, mu, kv, ds_read, seg=None):
    """In-kernel AD at one stage: AL-cost gradient plus Hessian/Jacobian
    columns, all as (8, 128) field tiles.

    ``wf`` = NZ state tiles + NU control tiles; ``lam`` a list of NC
    multiplier tiles.  Returns ``(g, Hcols, Jcols)`` with ``Hcols[i][r]`` =
    d²L/dw_r dw_i and ``Jcols[i][r]`` = d(next_r)/dw_i.  One shared body for
    the derivs / fused-backward / whole-solve kernels so the three cannot
    drift (ADVICE round-1).  ``seg`` (a family segment) specializes the
    stage-switched branches at trace time — the jvp then differentiates only
    the live branch's physics.
    """
    import jax

    if family.fast_derivs is not None and not _fast_disabled():
        fast = family.fast_derivs(n, wf, lam, mu, kv, ds_read, seg=seg)
        if fast is not None:
            return fast

    NW = family.NZ + family.NU
    ones = jnp.ones_like(wf[0])
    zeros = jnp.zeros_like(wf[0])
    kw = {} if seg is None else {"seg": seg}

    def al_cost(*w):
        return jnp.sum(
            family.al_cost(n, w, lambda j: lam[j], mu, kv, ds_read, **kw)
        )

    def dyn(*w):
        return family.dyn(n, w, kv, ds_read, **kw)

    grad_fn = jax.grad(al_cost, argnums=tuple(range(NW)))

    def grad_and_dyn(*w):
        # one function so the linearization covers grad+dynamics in a single
        # pass — the primal trace (tire forces, spatial regularization) is
        # shared instead of being evaluated twice per column
        return grad_fn(*w), dyn(*w)

    closed = family.analytic_cols(n, wf, ds_read) if family.analytic_cols else {}
    # one linearize instead of NW independent jvps: the (expensive) primal
    # forward-over-reverse trace runs ONCE; each column then applies only the
    # stored tangent map.  Mathematically the same jvp linearization.
    (g, _), lin = jax.linearize(grad_and_dyn, *wf)
    Hcols, Jcols = [], []
    for i in range(NW):
        if i in closed:
            hcol, jcol = closed[i]
        else:
            tangents = tuple(ones if j == i else zeros for j in range(NW))
            hcol, jcol = lin(*tangents)
        Hcols.append(hcol)
        Jcols.append(jcol)
    return g, Hcols, Jcols


def _obstacle_rows(track_data, on):
    """Static python-float obstacle rows (s, ey, r) — unrolled in-kernel."""
    if not on:
        return []
    obs = np.asarray(track_data.obstacles)
    return [(float(o[2]), float(o[3]), float(o[4])) for o in obs]


def _obstacles_std(rows, s, ey, dsn, w_obs):
    """problems._obstacle_barrier with build-time-unrolled discs."""
    acc = jnp.zeros_like(s)
    for so, eo, ro in rows:
        dist = jnp.sqrt((s - so) ** 2 + (ey - eo) ** 2)
        den = jnp.maximum(dist - (ro + 0.1), OBSTACLE_EPS)
        acc += w_obs * dsn / den
    return acc


def _obstacles_kc(rows, s, ey, dsn, nf):
    """problems._obstacle_barrier_kc; ``nf`` is the stage index as float."""
    acc = jnp.zeros_like(s)
    for so, eo, ro in rows:
        dist = jnp.sqrt((s - so) ** 2 + (ey - eo) ** 2)
        den = jnp.maximum(jnp.abs(dist - ro), OBSTACLE_EPS)
        acc += dsn / ((nf + 1.0) * den)
    return acc


def _clamped(x, clamps):
    x = list(x)
    for i, (lo, hi) in clamps.items():
        x[i] = jnp.clip(x[i], lo, hi)
    return x


def _spatialize(xdot, sdot_idx, floor, beta):
    """problems._regularized_spatial division: softplus-floored 1/s_dot."""
    s_dot = xdot[sdot_idx]
    s_dot_eff = floor + jnp.logaddexp(0.0, beta * (s_dot - floor)) / beta
    inv = 1.0 / s_dot_eff
    return [
        jnp.ones_like(s_dot) if j == sdot_idx else xdot[j] * inv
        for j in range(len(xdot))
    ]


def _pm_prime(x5, Fx, Fy, k, p):
    """Point-mass regularized spatial ODE fields (models.point_mass +
    problems clamps (V>=0.5, |ey|<=8, |epsi|<=1.3), floor 0.3, beta 10)."""
    x5 = _clamped(x5, {0: (0.5, 1e3), 2: (-8.0, 8.0), 3: (-1.3, 1.3)})
    V, s, ey, epsi, t = x5
    Fd = p.Frr + p.Cd * V**2
    V_dot = (Fx - Fd) / p.m
    s_dot = (V * jnp.cos(epsi)) / (1.0 - k * ey)
    ey_dot = V * jnp.sin(epsi)
    epsi_dot = Fy / (p.m * jnp.where(jnp.abs(V) > 1e-3, V, 1e-3)) - k * s_dot
    xdot = [V_dot, s_dot, ey_dot, epsi_dot, jnp.ones_like(V)]
    return _spatialize(xdot, 1, 0.3, 10.0)


def _kc_prime(x6, a, w, k, l, floor, beta, clamps):
    """Kinematic-bicycle regularized spatial ODE fields (models.kinematic_car
    + problems clamps; floor/beta differ between the kc tail and the pure
    kinematic family)."""
    x6 = _clamped(x6, clamps)
    v, delta, s, ey, epsi, t = x6
    s_dot = (v * jnp.cos(epsi)) / (1.0 - ey * k)
    ey_dot = v * jnp.sin(epsi)
    epsi_dot = v * tan(delta) / l - s_dot * k
    xdot = [a, w, s_dot, ey_dot, epsi_dot, jnp.ones_like(v)]
    return _spatialize(xdot, 2, floor, beta)


def _euler_fields(x, prime, h):
    return [a + h * b for a, b in zip(x, prime)]


def build_cascaded_family(car_config, cfg, tail, track_data) -> FMFamily:
    """Field-major twin of problems.build_cascaded_problem.

    ``tail``: "none", "pm", or "kc".  Obstacles honored via
    ``cfg["obstacles"]`` with the track's static disc table.
    """
    from vehicle_control_tpu.controllers.mpc.problems import _floatify

    p = _floatify(dc.DynamicCarParams.from_config(car_config))
    N = int(cfg["horizon"])
    if tail == "pm":
        M = int(cfg["horizon_pm"])
    elif tail == "kc":
        M = int(cfg["horizon_kc"])
    else:
        M = 0
    if M == 0:
        tail = "none"
    H = N + M
    NZ, NU, NC = 10, 2, 10
    w = {k: float(v) for k, v in cfg["cost_weights"].items()}
    ci = {k: float(v) for k, v in cfg["input_constraints"].items()}
    cs = {k: float(v) for k, v in cfg["state_constraints"].items()}
    obstacles_on = bool(cfg.get("obstacles", False))
    obs_rows = _obstacle_rows(track_data, obstacles_on)
    fs = 1.0 / FORCE_SCALE
    if tail == "pm":
        ct = {k: float(v) for k, v in cfg["state_pm_constraints"].items()}
    elif tail == "kc":
        ct = {k: float(v) for k, v in cfg["state_kc_constraints"].items()}
        kc_l = float(car_config["car"]["l"])
        _K = int(cfg["horizon_kc"])
    else:
        ct = None

    def u1_scale(n):
        if tail == "pm":
            return jnp.where(n < N, 1.0, FORCE_SCALE)
        return 1.0

    def split(n, wf, seg=None):
        """Physical-unit controls + previous controls from the padded state.

        With ``seg`` the pm-tail u1 unit switch (w for n<N, Fy after)
        resolves statically: the segment cuts include N and N+1, so both the
        stage's and the previous stage's side of the switch are constant
        over the segment.
        """
        z, u = wf[:NZ], wf[NZ:]
        Fx = u[0] * FORCE_SCALE
        Fx_prev = z[8] * FORCE_SCALE
        if seg is None:
            nprev = jnp.maximum(n - 1, 0)
            u1 = u[1] * u1_scale(n)
            u1_prev = z[9] * u1_scale(nprev)
        elif tail == "pm":
            u1 = u[1] * (FORCE_SCALE if seg.lo >= N else 1.0)
            u1_prev = z[9] * (FORCE_SCALE if seg.lo >= N + 1 else 1.0)
        else:
            u1, u1_prev = u[1] * 1.0, z[9] * 1.0
        return z, Fx, u1, Fx_prev, u1_prev

    # -- cost ----------------------------------------------------------------

    def term_cost(z):
        if tail == "pm":
            speed, ey, epsi, t = z[0], z[2], z[3], z[4]
        elif tail == "kc":
            speed, ey, epsi, t = z[0], z[3], z[4], z[5]
        else:
            speed, ey, epsi, t = z[0], z[5], z[6], z[7]
        over = jnp.where(
            speed >= cs["max_speed"], (speed - cs["max_speed"]) ** 2, 0.0
        )
        return (
            w["speed"] * over
            + w["time"] * t
            + w["ey"] * ey**2
            + w["epsi"] * epsi**2
        )

    def stage_cost(n, wf, kv, ds_read, seg=None):
        z, Fx, u1, Fx_prev, u1_prev = split(n, wf, seg)
        x = z[:8]
        dsn = ds_read(n)
        ds_prev = ds_read(jnp.maximum(n - 1, 0))
        # branch activity: traced masks when seg is None, Python bools when
        # the (static) segment pins the branch — dead branches are skipped
        st_on = (n < N) if seg is None else (seg.hi <= N)
        tail_on = (n >= N) if seg is None else (seg.lo >= N)
        sw_on = (n == N) if seg is None else (seg.lo <= N < seg.hi)
        term_on = (n == H - 1) if seg is None else (seg.lo <= H - 1 < seg.hi)
        cost = jnp.zeros_like(z[0])
        if st_on is not False:
            # single-track branch (problems.st_cost)
            c_st = fm.st_running_cost_fields(
                n, x, Fx, u1, Fx_prev, dsn, ds_prev, p, w, cs, N
            )
            if obstacles_on:
                nf = jnp.asarray(n).astype(jnp.float32)
                if tail == "kc":
                    c_st += _obstacles_kc(obs_rows, x[4], x[5], dsn, nf)
                else:
                    c_st += _obstacles_std(obs_rows, x[4], x[5], dsn, w["obstacles"])
            cost += c_st if st_on is True else st_on * c_st
        if tail == "pm" and tail_on is not False:
            ey = z[2]
            c_pm = fm.boundary_fields(ey, dsn, w["boundary"], ct["ey_min"], ct["ey_max"])
            c_pm += w["deviation_pm"] * dsn * ey**2
            slew = (w["Fx"] / ds_prev) * (Fx - Fx_prev) ** 2
            slew += (w["Fy"] / ds_prev) * (u1 - u1_prev) ** 2
            slew_on = (n >= N + 1) if seg is None else (seg.lo >= N + 1)
            if slew_on is not False:
                c_pm += slew if slew_on is True else slew_on * slew
            if obstacles_on:
                c_pm += _obstacles_std(obs_rows, z[1], ey, dsn, w["obstacles"])
            cost += c_pm if tail_on is True else tail_on * c_pm
        if tail == "pm" and sw_on is not False:
            c_sw = (w["switch_F"] / ds_read(N - 1)) * (
                (Fx - Fx_prev) ** 2 + (u1 - z[5]) ** 2
            )
            cost += c_sw if sw_on is True else sw_on * c_sw
        if tail == "kc" and tail_on is not False:
            ey = z[3]
            c_kc = fm.boundary_fields(ey, dsn, w["boundary"], ct["ey_min"], ct["ey_max"])
            c_kc += w["deviation_kc"] * dsn * ey**2
            c_kc += w["w_kc"] * u1**2
            slew_on = (n >= N + 1) & (n - 1 < _K - 1)
            c_kc += slew_on * w["a"] * (Fx - Fx_prev) ** 2
            if obstacles_on:
                nf = jnp.asarray(n).astype(jnp.float32)
                c_kc += _obstacles_kc(obs_rows, z[2], ey, dsn, nf)
            cost += c_kc if tail_on is True else tail_on * c_kc
        if tail == "kc" and sw_on is not False:
            c_sw = (w["Fy"] / ds_read(min(N, H - 1))) * (
                (z[6] - Fx) ** 2 + (z[7] - u1) ** 2
            )
            cost += c_sw if sw_on is True else sw_on * c_sw
        if term_on is not False:
            t_c = term_cost(z)
            cost += t_c if term_on is True else term_on * t_c
        return cost

    # -- constraints + AL penalty -------------------------------------------

    def _mask_stage0(n, c):
        # state-only rows (speed floor + steering box) are undecidable at
        # the fixed stage-0 state; see problems._mask_stage0_state_rows
        keep = n != 0
        return [
            jnp.where(keep, ci_, -1.0) if i < 3 else ci_
            for i, ci_ in enumerate(c)
        ]

    def constraints(n, wf, seg=None):
        z, Fx, u1, _, _ = split(n, wf, seg)
        st_on = None if seg is None else (seg.hi <= N)
        if tail == "none" or st_on is True:
            c = fm.constraint_fields(z[:8], Fx, u1, p, ci, cs)
            if seg is not None and seg.lo > 0:
                return c  # segment never contains stage 0
            return _mask_stage0(n, c)
        neg1 = jnp.full_like(z[0], -1.0)
        if tail == "pm":
            V = z[0]
            c_tail = [
                ct["V_min"] - V,
                (Fx - p.Peng / jnp.maximum(V, 1.0)) * fs,
            ] + [neg1] * 8
        else:  # kc
            v, delta = z[0], z[1]
            c_tail = [
                ct["v_min"] - v,
                delta - ct["delta_max"],
                ct["delta_min"] - delta,
                Fx - ci["a_max"],
                ci["a_min"] - Fx,
                u1 - ci["w_max"],
                ci["w_min"] - u1,
            ] + [neg1] * 3
        if st_on is False:
            return c_tail
        c_st = _mask_stage0(n, fm.constraint_fields(z[:8], Fx, u1, p, ci, cs))
        m = n < N
        return [jnp.where(m, a, b) for a, b in zip(c_st, c_tail)]

    def al_cost(n, wf, lam_read, mu, kv, ds_read, seg=None):
        c = stage_cost(n, wf, kv, ds_read, seg)
        return c + fm.al_penalty_fields(constraints(n, wf, seg), lam_read, mu)

    # -- dynamics -------------------------------------------------------------

    def dyn(n, wf, kv, ds_read, seg=None):
        z, Fx, u1, Fx_prev, u1_prev = split(n, wf, seg)
        x = z[:8]
        dsn = ds_read(n)
        # branch activity (static under seg: cuts include N-1 and N)
        st_on = None if seg is None else (seg.hi <= N - 1)
        seam_on = None if seg is None else (seg.lo <= N - 1 < seg.hi)
        tail_only = seg is not None and seg.lo >= N

        def st_branch():
            nxt = fm.rk4_step(x, Fx, u1, kv, dsn, p)
            # steering stop on the integrated delta (problems._sat_col twin)
            nxt[3] = jnp.clip(nxt[3], cs["delta_min"], cs["delta_max"])
            return nxt

        if tail == "none":
            next8 = st_branch()
        elif st_on is True:
            next8 = st_branch()
        else:
            Ux, Uy, r, delta, s, ey, epsi, t = x
            zero = jnp.zeros_like(z[0])
            seam = None
            if seg is None or seam_on:
                V = jnp.sqrt(Ux**2 + Uy**2)
                beta = arctan(safe_div(Uy, Ux))
                if tail == "pm":
                    fy_tot = dc.Fy_f(Ux, Uy, r, delta, Fx, p) + dc.Fy_r(
                        Ux, Uy, r, delta, Fx, p
                    )
                    seam = [V, s, ey, beta + epsi, t, fy_tot, zero, zero]
                else:  # kc
                    xdot = fm.temporal_fields(x, Fx_prev, u1_prev, 0.0, p)
                    a_final = jnp.sqrt(xdot[0] ** 2 + xdot[1] ** 2)
                    seam = [V, delta, s, ey, beta + epsi, t, a_final, u1_prev + zero]
            tail8 = None
            if seg is None or tail_only:
                if tail == "pm":
                    tail5 = _euler_fields(
                        z[:5], _pm_prime(z[:5], Fx, u1, kv, p), dsn
                    )
                    tail8 = tail5 + [zero, zero, zero]
                else:  # kc
                    clamps = {0: (0.5, 1e3), 1: (-1.0, 1.0), 3: (-8.0, 8.0), 4: (-1.2, 1.2)}
                    tail6 = _euler_fields(
                        z[:6], _kc_prime(z[:6], Fx, u1, kv, kc_l, 0.3, 10.0, clamps), dsn
                    )
                    tail6[1] = jnp.clip(tail6[1], ct["delta_min"], ct["delta_max"])
                    tail8 = tail6 + [zero, zero]
            if seg is None:
                st_next = st_branch()
                m_st = n < N - 1
                m_seam = n == N - 1
                next8 = [
                    jnp.where(m_st, a, jnp.where(m_seam, b, c))
                    for a, b, c in zip(st_next, seam, tail8)
                ]
            elif seam_on:
                next8 = seam
            else:
                next8 = tail8
        return tuple(next8) + (wf[NZ], wf[NZ + 1])

    # -- rollout clamp boxes (problems.build_cascaded_problem boxes) ----------

    def u_box(n, j, seg=None):
        st_side = None if seg is None else (seg.hi <= N)
        if j == 0:
            if tail == "kc":
                if st_side is True:
                    return -30.0, 60.0
                if st_side is False:
                    return ci["a_min"] * fs, ci["a_max"] * fs
                lo = jnp.where(n < N, -30.0, ci["a_min"] * fs)
                hi = jnp.where(n < N, 60.0, ci["a_max"] * fs)
                return lo, hi
            return -30.0, 60.0
        if tail == "pm":
            if st_side is True:
                return ci["w_min"], ci["w_max"]
            if st_side is False:
                return -25.0, 25.0
            lo = jnp.where(n < N, ci["w_min"], -25.0)
            hi = jnp.where(n < N, ci["w_max"], 25.0)
            return lo, hi
        return ci["w_min"], ci["w_max"]

    analytic_cols = None
    if tail == "none":
        # Closed-form Hessian/Jacobian columns (scripts/derivs_lab.py
        # sparsity census) — each skipped jvp column is bitwise-identical to
        # what the tangent sweep produces:
        # * z8/z9 (prev-action stash): enter ONLY through the Fx-slew term
        #   slew_on * (w_Fx/ds_prev) * (u0*FS - z8*FS)^2 (st_running_cost_
        #   fields:105-106); dynamics never read the stash (stash_next = u).
        # * z4 (s): without obstacles nothing reads s — not the cost, not
        #   the constraints, not spatial_prime (curvature is a per-stage
        #   parameter tile, not evaluated from s) — and s_next = s + ds, so
        #   the Hessian column is zero and the Jacobian column is e4.
        # * z7 (t): enters only the (linear) terminal w_time*t cost and
        #   t_next = t + ds/s_dot_eff reads every state BUT t, so H col is
        #   zero and J col is e7.
        def analytic_cols(n, wf, ds_read):
            zero = jnp.zeros_like(wf[0])
            one = jnp.ones_like(wf[0])
            ds_prev = ds_read(jnp.maximum(n - 1, 0))
            coef = (
                ((n >= 1) & (n < N))
                * (2.0 * w["Fx"] / ds_prev)
                * (FORCE_SCALE * FORCE_SCALE)
            ) + zero
            h8 = [zero] * (NZ + NU)
            h8[8] = coef
            h8[NZ + 0] = -coef
            jz = [zero] * NZ
            cols = {8: (h8, jz), 9: ([zero] * (NZ + NU), jz)}
            if not obstacles_on:
                for i in (4, 7):
                    ji = [zero] * NZ
                    ji[i] = one
                    cols[i] = ([zero] * (NZ + NU), ji)
            return cols

    # -- restructured exact derivatives (singletrack hot path) ----------------
    # Same math as the generic linearize(grad+dyn) tangent sweep, computed by
    # structure instead (scripts/derivs_lab.py sparsity census):
    #   * gradient: one reverse-mode pass over the full AL cost (exact);
    #   * dynamics Jacobian: one linearize(dyn) applied only to the 8 columns
    #     the RK4 actually reads (s, t, stash are closed-form);
    #   * Hessian: closed-form entries for every quadratic/piecewise-
    #     quadratic term (boundary, deviation, w^2, slew, terminal, linear
    #     constraint rows' mu-active outer products) plus ONE small
    #     forward-over-reverse restricted to the genuinely nonquadratic
    #     block — the slip penalty and the engine/friction constraint rows,
    #     which only touch (Ux, Uy, r, delta, u_Fx).
    # Values agree with the generic path to fp-reordering (tested by
    # tests/test_kernel_trace.py); ~28.9k -> ~13k tile-ops per stage.
    # Applies to every stage whose dynamics AND cost are pure single-track:
    # all stages of tail="none", and the (0, N-1) static segment of the
    # cascaded tails (seam/tail segments keep the generic path — their
    # closures are an order of magnitude cheaper to differentiate).
    import jax

    VIDX = (0, 1, 2, 3, NZ + 0)  # the nonquadratic block's variables

    def fast_derivs(n, wf, lam, mu, kv, ds_read, seg=None):
        if tail == "none":
            if seg is not None:
                return None  # tail="none" builds no segments
            return _st_fast(n, wf, lam, mu, kv, ds_read, seg)
        if seg is None:
            return None  # cascaded generic (fully masked) stages
        if seg.hi <= N - 1:
            return _st_fast(n, wf, lam, mu, kv, ds_read, seg)
        if seg.lo >= N:
            return _tail_fast(n, wf, lam, mu, kv, ds_read, seg)
        return None  # the seam segment (N-1, N)

    def _st_fast(n, wf, lam, mu, kv, ds_read, seg):
            kw = {} if seg is None else {"seg": seg}
            zero = jnp.zeros_like(wf[0])
            one = jnp.ones_like(wf[0])
            dsn = ds_read(n)
            ds_prev = ds_read(jnp.maximum(n - 1, 0))

            # exact gradient of the full AL cost (reverse mode)
            def al_sum(*ww):
                return jnp.sum(
                    al_cost(n, ww, lambda j: lam[j], mu, kv, ds_read, **kw)
                )

            g = list(jax.grad(al_sum, argnums=tuple(range(NZ + NU)))(*wf))

            # dynamics Jacobian: analytic RK4 chain (fm.rk4_step_jac) —
            # tangent columns (Ux, Uy, r, delta, ey, epsi, Fx, w); the s/t
            # columns are e4/e7 and the stash columns are zero + the
            # stash_next = u identity
            def _t(v):
                return zero if isinstance(v, float) and v == 0.0 else (
                    v + zero if isinstance(v, float) else v
                )

            x8 = [wf[i] for i in range(8)]
            nxt8, T = fm.rk4_step_jac(
                x8, wf[NZ] * FORCE_SCALE, wf[NZ + 1], kv, dsn, p
            )
            # steering stop on the integrated delta (dyn's _sat_col clip)
            dclip = fm._clipg(nxt8[3], cs["delta_min"], cs["delta_max"])
            T[3] = [fm._mac(0.0, dclip, d) for d in T[3]]
            col_of = {0: 0, 1: 1, 2: 2, 3: 3, 5: 4, 6: 5}
            Jcols = []
            for i in range(NZ + NU):
                if i in (4, 7):  # s_next = s + ds; t_next = t + ds/s_dot
                    ji = [zero] * NZ
                    ji[i] = one
                    Jcols.append(ji)
                elif i in (8, 9):  # stash never read; stash_next = u
                    Jcols.append([zero] * NZ)
                elif i < NZ:
                    c = col_of[i]
                    Jcols.append([_t(T[r][c]) for r in range(8)] + [zero, zero])
                else:  # controls: chain u_Fx -> Fx by FORCE_SCALE; stash rows
                    c = 6 if i == NZ else 7
                    scale = FORCE_SCALE if i == NZ else 1.0
                    ji = [_t(fm._mac(0.0, scale, T[r][c])) for r in range(8)]
                    ji += [one if i == NZ else zero, one if i == NZ + 1 else zero]
                    Jcols.append(ji)

            # nonquadratic Hessian block: slip penalty + engine/friction
            # constraint rows as a function of (Ux, Uy, r, delta, u_Fx)
            def nonquad5(Ux_, Uy_, r_, d_, uFx_):
                Fx_ = uFx_ * FORCE_SCALE
                x8 = [Ux_, Uy_, r_, d_, wf[4], wf[5], wf[6], wf[7]]
                val = fm.slip_penalty_fields(x8, Fx_, p, w["slip"])
                c = fm.constraint_fields(x8, Fx_, wf[NZ + 1], p, ci, cs)
                pen = zero
                for j in (3, 6, 7, 8, 9):
                    lam_hat = jnp.maximum(0.0, lam[j] + mu * c[j])
                    pen += lam_hat**2 - lam[j] ** 2
                return jnp.sum(val + pen / (2.0 * mu))

            grad5 = jax.grad(nonquad5, argnums=(0, 1, 2, 3, 4))
            _, lin_h = jax.linearize(
                grad5, wf[0], wf[1], wf[2], wf[3], wf[NZ + 0]
            )
            eye5 = [
                tuple(one if j == i else zero for j in range(5))
                for i in range(5)
            ]
            Hcols = [[zero] * (NZ + NU) for _ in range(NZ + NU)]
            for ci_, i in enumerate(VIDX):
                col = lin_h(*eye5[ci_])
                for cr, rr in enumerate(VIDX):
                    Hcols[i][rr] = Hcols[i][rr] + col[cr]

            if obstacles_on:
                # obstacle barrier: an exact 2x2 Hessian block on (s, ey)
                # via a tiny forward-over-reverse (the dynamics still never
                # read s, so the Jacobian column stays e4)
                nf = jnp.asarray(n).astype(jnp.float32)

                def obst2(s_, ey_):
                    if tail == "kc":
                        return jnp.sum(_obstacles_kc(obs_rows, s_, ey_, dsn, nf))
                    return jnp.sum(
                        _obstacles_std(obs_rows, s_, ey_, dsn, w["obstacles"])
                    )

                _, lin_o = jax.linearize(
                    jax.grad(obst2, argnums=(0, 1)), wf[4], wf[5]
                )
                for ci_, i in enumerate((4, 5)):
                    col = lin_o(*((one, zero) if ci_ == 0 else (zero, one)))
                    Hcols[i][4] = Hcols[i][4] + col[0]
                    Hcols[i][5] = Hcols[i][5] + col[1]

            # closed-form quadratic / piecewise-quadratic entries
            c_all = constraints(n, wf, **kw)
            keep = jnp.where(n != 0, 1.0, 0.0)

            def act(j):
                return jnp.where(lam[j] + mu * c_all[j] > 0.0, 1.0, 0.0)

            termf = jnp.where(n == H - 1, 1.0, 0.0)
            Ux, ey = wf[0], wf[5]
            Hcols[0][0] = Hcols[0][0] + mu * act(0) * keep + termf * (
                2.0 * w["speed"]
            ) * jnp.where(Ux >= cs["max_speed"], 1.0, 0.0)
            Hcols[3][3] = Hcols[3][3] + mu * (act(1) + act(2)) * keep
            Hcols[NZ + 1][NZ + 1] = (
                2.0 * w["w"] + mu * (act(4) + act(5)) + zero
            )
            blo = jnp.where(ey < cs["ey_min"], 1.0, 0.0)
            bhi = jnp.where(ey > cs["ey_max"], 1.0, 0.0)
            Hcols[5][5] = Hcols[5][5] + (  # += : obstacles touch (5,5) too
                2.0 * w["boundary"] * dsn * (blo + bhi)
                + 2.0 * w["deviation_st"] * dsn
                + termf * (2.0 * w["ey"])
            )
            Hcols[6][6] = termf * (2.0 * w["epsi"]) + zero
            slew_on = jnp.where((n >= 1) & (n < N), 1.0, 0.0)
            coef = slew_on * (2.0 * w["Fx"] / ds_prev) * (
                FORCE_SCALE * FORCE_SCALE
            )
            Hcols[8][8] = Hcols[8][8] + coef
            Hcols[8][NZ + 0] = Hcols[8][NZ + 0] - coef
            Hcols[NZ + 0][8] = Hcols[NZ + 0][8] - coef
            Hcols[NZ + 0][NZ + 0] = Hcols[NZ + 0][NZ + 0] + coef
            return g, Hcols, Jcols

    FS = FORCE_SCALE

    def _tail_fast(n, wf, lam, mu, kv, ds_read, seg):
        """Restructured exact derivatives for the pm/kc TAIL segments
        (seg.lo >= N): the tail costs are entirely (piecewise-)quadratic
        and the tail constraints are linear except the pm engine-power row,
        so the Hessian is closed-form (+ a tiny forward-over-reverse for
        the obstacle barrier block); the Euler-step dynamics Jacobian needs
        5-6 tangent columns over a ~150-op segment-specialized trace."""
        kw = {"seg": seg}
        zero = jnp.zeros_like(wf[0])
        one = jnp.ones_like(wf[0])
        dsn = ds_read(n)
        ds_prev = ds_read(jnp.maximum(n - 1, 0))
        NW = NZ + NU

        def al_sum(*ww):
            return jnp.sum(
                al_cost(n, ww, lambda j: lam[j], mu, kv, ds_read, **kw)
            )

        g = list(jax.grad(al_sum, argnums=tuple(range(NW)))(*wf))

        # -- dynamics Jacobian: linearize the tiny tail-segment dyn ----------
        def dyn_fn(*ww):
            return dyn(n, ww, kv, ds_read, **kw)

        _, lin_d = jax.linearize(dyn_fn, *wf)
        if tail == "pm":
            live_cols = (0, 2, 3, NZ + 0, NZ + 1)
            e_cols = {1: 1, 4: 4}  # s_next = s + ds; t_next = t + ds/sde
        else:
            live_cols = (0, 1, 3, 4, NZ + 0, NZ + 1)
            e_cols = {2: 2, 5: 5}

        def _t(v):
            return zero if isinstance(v, float) and v == 0.0 else (
                v + zero if isinstance(v, float) else v
            )

        Jcols = []
        for i in range(NW):
            if i in e_cols:
                ji = [zero] * NZ
                ji[e_cols[i]] = one
                Jcols.append(ji)
            elif i in live_cols:
                tangents = tuple(one if j == i else zero for j in range(NW))
                ji = list(lin_d(*tangents))
                Jcols.append([_t(x) for x in ji])
            else:  # extras (z5-z7 pm / z6-z7 kc): never read downstream
                Jcols.append([zero] * NZ)
        # stash rows for the live control columns
        Jcols[NZ + 0][8] = one
        Jcols[NZ + 1][9] = one

        # -- Hessian: closed form ---------------------------------------------
        c_all = constraints(n, wf, **kw)

        def act(j):
            return jnp.where(lam[j] + mu * c_all[j] > 0.0, 1.0, 0.0)

        Hm = [[zero] * NW for _ in range(NW)]
        sw_on = seg.lo <= N < seg.hi
        term_on = seg.lo <= H - 1 < seg.hi
        termf = (
            jnp.where(n == H - 1, 1.0, 0.0) if term_on else 0.0
        )
        if tail == "pm":
            V, ey = wf[0], wf[2]
            blo = jnp.where(ey < ct["ey_min"], 1.0, 0.0)
            bhi = jnp.where(ey > ct["ey_max"], 1.0, 0.0)
            Hm[2][2] = (
                2.0 * w["boundary"] * dsn * (blo + bhi)
                + 2.0 * w["deviation_pm"] * dsn
            )
            # constraint rows: 0 V-floor (linear), 1 engine power (nonlin)
            Hm[0][0] = Hm[0][0] + mu * act(0)
            Vm = jnp.maximum(V, 1.0)
            liveV = jnp.where(V > 1.0, 1.0, jnp.where(V < 1.0, 0.0, 0.5))
            gV = fs * p.Peng / (Vm * Vm) * liveV  # d c1/dV
            lam_hat1 = jnp.maximum(0.0, lam[1] + mu * c_all[1])
            a1 = mu * act(1)
            Hm[0][0] = Hm[0][0] + a1 * gV * gV + lam_hat1 * (
                -2.0 * fs * p.Peng / (Vm * Vm * Vm)
            ) * liveV
            Hm[0][NZ] = Hm[0][NZ] + a1 * gV  # d c1/du0 = FS*fs = 1
            Hm[NZ][0] = Hm[NZ][0] + a1 * gV
            Hm[NZ][NZ] = Hm[NZ][NZ] + a1
            if seg.lo >= N + 1:  # pm slew (both prev actions in FS units)
                cF = (2.0 * w["Fx"] / ds_prev) * (FS * FS)
                cY = (2.0 * w["Fy"] / ds_prev) * (FS * FS)
                Hm[8][8] = Hm[8][8] + cF
                Hm[8][NZ] = Hm[8][NZ] - cF
                Hm[NZ][8] = Hm[NZ][8] - cF
                Hm[NZ][NZ] = Hm[NZ][NZ] + cF
                Hm[9][9] = Hm[9][9] + cY
                Hm[9][NZ + 1] = Hm[9][NZ + 1] - cY
                Hm[NZ + 1][9] = Hm[NZ + 1][9] - cY
                Hm[NZ + 1][NZ + 1] = Hm[NZ + 1][NZ + 1] + cY
            if sw_on:  # switching cost at n == N (u1 is Fy, FS units)
                swf = jnp.where(n == N, 1.0, 0.0)
                cw = swf * (2.0 * w["switch_F"] / ds_read(N - 1))
                Hm[NZ][NZ] = Hm[NZ][NZ] + cw * (FS * FS)
                Hm[NZ][8] = Hm[NZ][8] - cw * (FS * FS)
                Hm[8][NZ] = Hm[8][NZ] - cw * (FS * FS)
                Hm[8][8] = Hm[8][8] + cw * (FS * FS)
                Hm[NZ + 1][NZ + 1] = Hm[NZ + 1][NZ + 1] + cw * (FS * FS)
                Hm[NZ + 1][5] = Hm[NZ + 1][5] - cw * FS
                Hm[5][NZ + 1] = Hm[5][NZ + 1] - cw * FS
                Hm[5][5] = Hm[5][5] + cw
            if term_on:
                Hm[0][0] = Hm[0][0] + termf * (2.0 * w["speed"]) * jnp.where(
                    wf[0] >= cs["max_speed"], 1.0, 0.0
                )
                Hm[2][2] = Hm[2][2] + termf * (2.0 * w["ey"])
                Hm[3][3] = Hm[3][3] + termf * (2.0 * w["epsi"])
            obs_ij = (1, 2)
        else:  # kc tail
            ey = wf[3]
            blo = jnp.where(ey < ct["ey_min"], 1.0, 0.0)
            bhi = jnp.where(ey > ct["ey_max"], 1.0, 0.0)
            Hm[3][3] = (
                2.0 * w["boundary"] * dsn * (blo + bhi)
                + 2.0 * w["deviation_kc"] * dsn
            )
            Hm[NZ + 1][NZ + 1] = (
                2.0 * w["w_kc"] + mu * (act(5) + act(6)) + zero
            )
            Hm[0][0] = Hm[0][0] + mu * act(0)
            Hm[1][1] = Hm[1][1] + mu * (act(1) + act(2))
            Hm[NZ][NZ] = Hm[NZ][NZ] + mu * (act(3) + act(4)) * (FS * FS)
            # a-slew (the kc mask is traced: (n >= N+1) & (n-1 < K-1))
            slewk = jnp.where((n >= N + 1) & (n - 1 < _K - 1), 1.0, 0.0)
            cA = slewk * (2.0 * w["a"]) * (FS * FS)
            Hm[8][8] = Hm[8][8] + cA
            Hm[8][NZ] = Hm[8][NZ] - cA
            Hm[NZ][8] = Hm[NZ][8] - cA
            Hm[NZ][NZ] = Hm[NZ][NZ] + cA
            if sw_on:  # switching cost at n == N (accel + steer continuity)
                swf = jnp.where(n == N, 1.0, 0.0)
                cw = swf * (2.0 * w["Fy"] / ds_read(min(N, H - 1)))
                Hm[6][6] = Hm[6][6] + cw
                Hm[6][NZ] = Hm[6][NZ] - cw * FS
                Hm[NZ][6] = Hm[NZ][6] - cw * FS
                Hm[NZ][NZ] = Hm[NZ][NZ] + cw * (FS * FS)
                Hm[7][7] = Hm[7][7] + cw
                Hm[7][NZ + 1] = Hm[7][NZ + 1] - cw
                Hm[NZ + 1][7] = Hm[NZ + 1][7] - cw
                Hm[NZ + 1][NZ + 1] = Hm[NZ + 1][NZ + 1] + cw
            if term_on:
                Hm[0][0] = Hm[0][0] + termf * (2.0 * w["speed"]) * jnp.where(
                    wf[0] >= cs["max_speed"], 1.0, 0.0
                )
                Hm[3][3] = Hm[3][3] + termf * (2.0 * w["ey"])
                Hm[4][4] = Hm[4][4] + termf * (2.0 * w["epsi"])
            obs_ij = (2, 3)
        if obstacles_on:
            i0, i1 = obs_ij
            nf = jnp.asarray(n).astype(jnp.float32)

            def obst2(s_, ey_):
                if tail == "kc":
                    return jnp.sum(_obstacles_kc(obs_rows, s_, ey_, dsn, nf))
                return jnp.sum(
                    _obstacles_std(obs_rows, s_, ey_, dsn, w["obstacles"])
                )

            _, lin_o = jax.linearize(
                jax.grad(obst2, argnums=(0, 1)), wf[i0], wf[i1]
            )
            for ci_, i in enumerate((i0, i1)):
                col = lin_o(*((one, zero) if ci_ == 0 else (zero, one)))
                Hm[i][i0] = Hm[i][i0] + col[0]
                Hm[i][i1] = Hm[i][i1] + col[1]
        return g, Hm, Jcols

    # static stage partition: cuts at every branch point of the closures
    # above (dyn seam N-1, st/tail switch N, pm-slew/prev-unit N+1, terminal
    # H-1), so each branch mask is constant over each segment.  tail="none"
    # keeps segments=None — its closures are branch-free in the physics.
    segments = None
    if tail != "none" and N >= 1:
        cuts = sorted({0, N - 1, N, min(N + 1, H), H - 1, H})
        segments = tuple(
            Seg(a, b) for a, b in zip(cuts, cuts[1:]) if b > a
        )

    return FMFamily(
        NZ, NU, NC, H, al_cost, dyn, u_box, stage_cost, constraints,
        analytic_cols, segments, fast_derivs,
    )


def build_kinematic_family(car_config, cfg, track_data) -> FMFamily:
    """Field-major twin of problems.build_kinematic_problem."""
    from vehicle_control_tpu.models import kinematic_car as kc

    kp = kc.KinematicCarParams.from_config(car_config)
    l = float(kp.l)
    N = int(cfg["horizon"])
    H = N + 1
    NZ, NU, NC = 8, 2, 10
    w = {k: float(v) for k, v in cfg["cost_weights"].items()}
    ci = {k: float(v) for k, v in cfg["input_constraints"].items()}
    cs = {k: float(v) for k, v in cfg["state_constraints"].items()}
    obstacles_on = bool(cfg.get("obstacles", False))
    obs_rows = _obstacle_rows(track_data, obstacles_on)
    clamps = {1: (-1.0, 1.0), 3: (-8.0, 8.0), 4: (-1.2, 1.2)}

    def stage_cost(n, wf, kv, ds_read):
        z, u = wf[:NZ], wf[NZ:]
        v, delta, s, ey, epsi, t = z[:6]
        a_act, w_act = u
        dsn = ds_read(n)
        cost = fm.boundary_fields(ey, dsn, w["boundary"], cs["ey_min"], cs["ey_max"])
        cost += w["deviation"] * dsn * ey**2
        cost += w["w"] * w_act**2
        cost += ((n >= 1) & (n < N)) * w["a"] * (a_act - z[6]) ** 2
        if obstacles_on:
            cost += _obstacles_std(obs_rows, s, ey, dsn, w["obstacles"])
        cost = jnp.where(n < N, cost, 0.0)
        over = jnp.where(v >= cs["v_max"], (v - cs["v_max"]) ** 2, 0.0)
        term = w["v"] * over + w["time"] * t + w["ey"] * ey**2 + w["epsi"] * epsi**2
        return cost + (n == N) * term

    def constraints(n, wf):
        z, u = wf[:NZ], wf[NZ:]
        v, delta = z[0], z[1]
        neg1 = jnp.full_like(v, -1.0)
        c = [
            cs["v_min"] - v,
            delta - cs["delta_max"],
            cs["delta_min"] - delta,
            u[0] - ci["a_max"],
            ci["a_min"] - u[0],
            u[1] - ci["w_max"],
            ci["w_min"] - u[1],
        ] + [neg1] * 3
        # state-only rows (0-2) are undecidable at the fixed stage-0 state;
        # see problems._mask_stage0_state_rows
        c = [
            jnp.where(n != 0, ci_, -1.0) if i < 3 else ci_
            for i, ci_ in enumerate(c)
        ]
        m = n < N
        return [jnp.where(m, ci_, -jnp.ones_like(v)) for ci_ in c]

    def al_cost(n, wf, lam_read, mu, kv, ds_read):
        c = stage_cost(n, wf, kv, ds_read)
        return c + fm.al_penalty_fields(constraints(n, wf), lam_read, mu)

    def dyn(n, wf, kv, ds_read):
        z, u = wf[:NZ], wf[NZ:]
        x6 = z[:6]
        nxt = _euler_fields(
            x6, _kc_prime(x6, u[0], u[1], kv, l, 0.02, 50.0, clamps), ds_read(n)
        )
        # steering stop on the integrated delta (problems._sat_col twin)
        nxt[1] = jnp.clip(nxt[1], cs["delta_min"], cs["delta_max"])
        m = n < N
        next6 = [jnp.where(m, a, b) for a, b in zip(nxt, x6)]
        return tuple(next6) + (u[0], u[1])

    def u_box(n, j):
        if j == 0:
            return ci["a_min"], ci["a_max"]
        return ci["w_min"], ci["w_max"]

    return FMFamily(NZ, NU, NC, H, al_cost, dyn, u_box, stage_cost, constraints)
