"""MPC problem builders: the reference NLP formulations as OCP closures.

Each builder turns a controller YAML config (reference schema,
config/controllers/*.yaml) into :class:`OCPFunctions` for the AL-iLQR solver,
reproducing the stage costs/constraints of the reference controllers:

* cascaded single-track + point-mass   (reference: controllers/mpc/cascaded_mpc.py)
* cascaded single-track + kinematic    (reference: controllers/mpc/cascaded_kinematic_mpc.py)
* single-track only (M = 0)            (same file, horizon_pm: 0)
* pure kinematic                       (reference: controllers/mpc/kinematic_mpc.py)

TPU-first design decisions (vs the reference's per-stage Python loop building
a CasADi graph, cascaded_mpc.py:29-37):

* One **unified padded state** of dim 8 carries whichever model is live at a
  stage; stage masks (static arrays indexed by the traced stage number) select
  the single-track, seam, or tail branch.  All branches are evaluated and
  blended with ``jnp.where`` — tiny flops, no control-flow divergence, and the
  whole horizon is one ``lax.scan``.
* **Previous-action augmentation**: the solver state is z = [x(8), u_prev(2)]
  so slew-rate costs (which couple u_n and u_{n+1} in the reference,
  cascaded_mpc.py:167-171) become Markov stage costs.
* **Seam stash slots**: the model handoff (switching constraints,
  cascaded_mpc.py:256-277) is *exact* — it is folded into the stage-(N-1)
  dynamics — and quantities the switching *cost* needs from the single-track
  side (total lateral force / acceleration magnitude) are stashed in unused
  state slots so the stage-N cost can read them.
* **Action scaling**: forces are solved in kN (u_scale = 1000) so f32 Hessians
  stay well-conditioned on the MXU/VPU; constraints involving forces are
  scaled identically.
* Obstacle barriers ``w*ds/(dist - (r+0.1))`` (cascaded_mpc.py:173-177) get a
  floored denominator so a rollout that crosses an obstacle sees a large
  *finite repulsive* cost instead of the reference's sign flip — identical
  outside the infeasible disc.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from vehicle_control_tpu.environment import track as track_mod
from vehicle_control_tpu.models import dynamic_car as dc
from vehicle_control_tpu.models import kinematic_car as kc
from vehicle_control_tpu.models import point_mass as pm
from vehicle_control_tpu.solvers import OCPFunctions
from vehicle_control_tpu.utils.integrators import euler, rk4
from vehicle_control_tpu.utils.math import arctan, safe_div, tan

FORCE_SCALE = 1000.0  # solve forces in kN
OBSTACLE_EPS = 1e-2  # barrier denominator floor

# --- solver-side spatial dynamics regularization ----------------------------
#
# The spatially-discretized models divide by s_dot, which makes them (a)
# degenerate for speed <= 0 (dt/ds flips sign, so the time-minimizing
# objective rewards driving *backwards* — the reference inherits this via
# v_min: -10 in kinematic.yaml but IPOPT never leaves the forward basin from
# its warm start) and (b) violently stiff near standstill (dt/ds ~ 1/v, so a
# single 0.5 m stage can change v by tens of m/s).  Multiple-shooting IPOPT
# tolerates (b); a single-shooting rollout solver does not.  The solver-side
# transitions therefore clamp the evaluated state into a physical envelope and
# cap 1/s_dot — *exactly* the reference ODEs on the feasible set (speeds well
# above the caps, |delta| <= 0.45), bounded outside it.  Plant dynamics are
# untouched.


def _regularized_spatial(temporal_fn, sdot_idx, floor, beta, clamps):
    """d(state)/ds = d(state)/dt / smoothmax(s_dot, floor), state clamped.

    ``smoothmax(x, floor) = floor + softplus(x - floor)`` is exact for
    s_dot >> floor (the feasible set), strictly positive everywhere (removes
    the reverse-driving exploit), and keeps d/ds_dot > 0 so the solver always
    sees a gradient toward going faster.  ``clamps``: (state_index, lo, hi)
    applied before evaluating the temporal ODE; ``sdot_idx``: index of s in
    the state.  s' is set to exactly 1.
    """

    clamp_map = {i: (lo, hi) for i, lo, hi in clamps}

    def ode(x, u, k):
        # slice-and-restack instead of .at[].set: no scatter ops, so the
        # identical code lowers inside Pallas kernels
        nf = x.shape[-1]
        cols = [x[..., i] for i in range(nf)]
        for i, (lo, hi) in clamp_map.items():
            cols[i] = jnp.clip(cols[i], lo, hi)
        x = jnp.stack(cols, axis=-1)
        xdot = temporal_fn(x, u, k)
        s_dot = xdot[..., sdot_idx]
        s_dot_eff = floor + jnp.logaddexp(0.0, beta * (s_dot - floor)) / beta
        inv = 1.0 / s_dot_eff
        pcols = [
            jnp.ones_like(s_dot) if j == sdot_idx else xdot[..., j] * inv
            for j in range(nf)
        ]
        return jnp.stack(pcols, axis=-1)

    return ode


class HorizonParams(NamedTuple):
    """Per-step parameters (the reference's opti.parameter set,
    cascaded_mpc.py:79-89): curvature and arc-step per stage."""

    curvature: jnp.ndarray  # (H,)
    ds: jnp.ndarray  # (H,)


class MPCProblem(NamedTuple):
    fns: OCPFunctions
    horizon: int  # solver horizon H (number of stages)
    nz: int
    nu: int
    nc: int
    u_scale: jnp.ndarray  # (H, nu): physical = scaled * u_scale
    init_horizon: object  # (state0, X_prev, U_prev) -> (params, z0)
    initial_prediction: object  # () -> (X0, U0)
    ns_model: int  # physical state dim of the leading model
    u_lo: jnp.ndarray  # (H, nu) rollout control box, solver units
    u_hi: jnp.ndarray
    # optional factories for the Pallas field-major paths
    # (None when unsupported for this problem family)
    linesearch_kernel_factory: object = None
    derivs_kernel_factory: object = None
    backward_kernel_factory: object = None
    solve_kernel_factory: object = None  # (ALILQRConfig,) -> whole-solve kernel
    # (state0,) -> (X_pred, U_pred): physics-informed cold-start prediction
    # for a scenario dropped mid-track (curvature feed-forward); see
    # parallel.aligned_carry.  The plain initial_prediction (the reference's
    # standing-start seed) stays the simulator default.
    warm_start: object = None


def _sat_col(x, idx, lo, hi):
    """Saturating stop on one *integrated* state column.

    The reference enforces the steering box as a hard IPOPT constraint on
    every state column (kinematic_mpc.py:81-85, cascaded_mpc.py:103-106);
    the rollout-based analogue is a steering stop: clip the integrated delta
    at the bound so the constraint holds by construction instead of asking
    the AL loop to pull an overshot trajectory back inside (which stalls on
    cold mid-curve drops — the spatial steering dynamics delta' = w/s_dot
    are stiff at low speed).  Slice-and-restack so the identical code lowers
    inside Pallas kernels.
    """
    cols = [x[..., i] for i in range(x.shape[-1])]
    cols[idx] = jnp.clip(cols[idx], lo, hi)
    return jnp.stack(cols, axis=-1)


def _boundary(ey, ds, w, ey_min, ey_max):
    """Soft road-bound penalty (reference: cascaded_mpc.py:139-149)."""
    below = jnp.where(ey < ey_min, (ey - ey_min) ** 2, 0.0)
    above = jnp.where(ey > ey_max, (ey - ey_max) ** 2, 0.0)
    return w * ds * (below + above)


def _obstacle_barrier(obstacles, s, ey, ds, w):
    """sum_i w*ds/(dist_i - (r_i+0.1)), floored (reference: cascaded_mpc.py:173-177)."""
    if obstacles.shape[0] == 0:
        return jnp.zeros(jnp.shape(s))
    s = jnp.asarray(s)[..., None]
    ey = jnp.asarray(ey)[..., None]
    dist = jnp.sqrt((s - obstacles[:, 2]) ** 2 + (ey - obstacles[:, 3]) ** 2)
    den = jnp.maximum(dist - (obstacles[:, 4] + 0.1), OBSTACLE_EPS)
    return jnp.sum(w * jnp.asarray(ds)[..., None] / den, axis=-1)


def _obstacle_barrier_kc(obstacles, s, ey, ds, stage_idx):
    """ds/((n+1)*|dist - r|) (reference: cascaded_kinematic_mpc.py:183-188,255-260)."""
    if obstacles.shape[0] == 0:
        return jnp.zeros(jnp.shape(s))
    s = jnp.asarray(s)[..., None]
    ey = jnp.asarray(ey)[..., None]
    dist = jnp.sqrt((s - obstacles[:, 2]) ** 2 + (ey - obstacles[:, 3]) ** 2)
    den = jnp.maximum(jnp.abs(dist - obstacles[:, 4]), OBSTACLE_EPS)
    return jnp.sum(jnp.asarray(ds)[..., None] / ((stage_idx + 1.0) * den), axis=-1)


def _slip_penalty(x, Fx, p, w_slip):
    """Soft slip-angle penalty, front + rear (reference: cascaded_mpc.py:155-165)."""
    Ux, Uy, r, delta = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    ta_f = jnp.abs(tan(dc.alpha_f(Ux, Uy, r, delta, p)))
    tam_f = tan(dc.alphamod_f(Fx, Ux, p))
    ta_r = jnp.abs(tan(dc.alpha_r(Ux, Uy, r, delta, p)))
    tam_r = tan(dc.alphamod_r(Fx, Ux, p))
    pen_f = jnp.where(ta_f >= tam_f, (ta_f - tam_f) ** 2, 0.0)
    pen_r = jnp.where(ta_r >= tam_r, (ta_r - tam_r) ** 2, 0.0)
    return w_slip * (pen_f + pen_r)


def _mask_stage0_state_rows(n, c):
    """Disable the state-ONLY constraint rows (0: speed floor, 1-2: the
    steering box) at stage 0.

    Stage 0's state is the measured plant state — fixed, not a decision
    variable — and the plant (like the reference's, racing_car.py:34-46)
    integrates steering without a hard stop, so after an aggressive step it
    can sit O(1e-3) beyond delta_max.  A constraint on z0 alone is then
    *undecidable*: it has zero gradient w.r.t. every control, no iterate can
    reduce it, and it only poisons the convergence flag (measured: ALL of
    the kinematic fleet's steady-state non-converged lanes were stage-0
    delta/epsilon overshoots, solver residual exactly delta0 - delta_max).
    Rows that involve controls at stage 0 (engine power, steer rate,
    friction circle) stay active.  Mirrored in the fm_family closures.
    """
    keep = jnp.asarray(n != 0)
    rows = [c[..., i] for i in range(c.shape[-1])]
    for i in range(3):
        rows[i] = jnp.where(keep, rows[i], -1.0)
    return jnp.stack(rows, axis=-1)


def _st_constraints(x, Fx, w_act, p, cons_in, cons_st):
    """Single-track stage constraints c <= 0 (reference: cascaded_mpc.py:91-128).

    Order: Ux_min, delta box (2), engine power, w box (2), friction front (2),
    friction rear (2) — forces scaled to kN.
    """
    Ux, Uy, r, delta = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    fs = 1.0 / FORCE_SCALE
    bound_f = p.mu_f * dc.Fz_f(Ux, Fx, p) * jnp.cos(dc.alpha_f(Ux, Uy, r, delta, p))
    bound_r = p.mu_r * dc.Fz_r(Ux, Fx, p) * jnp.cos(dc.alpha_r(Ux, Uy, r, delta, p))
    fxf = dc.Fx_f(Fx, p)
    fxr = dc.Fx_r(Fx, p)
    return jnp.stack(
        [
            cons_st["Ux_min"] - Ux,
            delta - cons_st["delta_max"],
            cons_st["delta_min"] - delta,
            (Fx - p.Peng / jnp.maximum(Ux, 1.0)) * fs,
            w_act - cons_in["w_max"],
            cons_in["w_min"] - w_act,
            (fxf - bound_f) * fs,
            (-fxf - bound_f) * fs,
            (fxr - bound_r) * fs,
            (-fxr - bound_r) * fs,
        ],
        axis=-1,
    )


# ---------------------------------------------------------------------------
# Cascaded single-track (+ optional point-mass or kinematic tail)
# ---------------------------------------------------------------------------


def _floatify(params):
    """Dataclass copy with plain-float fields: arithmetic inlines them as
    literals, so problem closures capture no array constants (a requirement
    for running inside Pallas kernels)."""
    import dataclasses as _dc

    return type(params)(
        **{f.name: float(getattr(params, f.name)) for f in _dc.fields(params)}
    )


def _make_kernel_factories(family_fn):
    """Pallas field-major kernel factories for a lazily-built FM family.

    The family (solvers.fm_family) is the field-major twin of the problem
    closures; kernels are generic over it, so every family — cascaded pm/kc,
    single-track, kinematic, with or without obstacles — gets the TPU hot
    path.  Off-TPU the kernels run in (slow) interpret mode for parity tests.
    """

    def linesearch_kernel_factory(alphas):
        import jax

        from vehicle_control_tpu.solvers.rollout_kernel_fm import (
            build_linesearch_kernel_fm,
        )

        run = build_linesearch_kernel_fm(family_fn(), alphas)
        interp = jax.default_backend() != "tpu"
        return lambda *a: run(*a, interpret=interp)

    def derivs_kernel_factory():
        import jax

        from vehicle_control_tpu.solvers.derivs_kernel_fm import (
            build_derivs_kernel_fm,
        )

        run = build_derivs_kernel_fm(family_fn())
        interp = jax.default_backend() != "tpu"
        return lambda *a: run(*a, interpret=interp)

    def backward_kernel_factory():
        import jax

        from vehicle_control_tpu.solvers.backward_kernel_fm import (
            build_backward_kernel_fm,
        )

        run = build_backward_kernel_fm(family_fn())
        interp = jax.default_backend() != "tpu"
        return lambda *a: run(*a, interpret=interp)

    def solve_kernel_factory(solver_cfg):
        import jax

        from vehicle_control_tpu.solvers.solve_kernel_fm import (
            build_solve_kernel_fm,
        )

        run = build_solve_kernel_fm(family_fn(), solver_cfg)
        interp = jax.default_backend() != "tpu"
        return lambda *a: run(*a, interpret=interp)

    return (
        linesearch_kernel_factory,
        derivs_kernel_factory,
        backward_kernel_factory,
        solve_kernel_factory,
    )


def build_cascaded_problem(
    car_config, track: "track_mod.Track", cfg, tail: str = "pm",
    dtype=jnp.float64, p_override=None,
) -> MPCProblem:
    """Cascaded MPC problem (reference: cascaded_mpc.py /
    cascaded_kinematic_mpc.py).  ``tail``: "pm", "kc", or "none"
    (single-track-only, the `singletrack.yaml` M=0 configuration).

    ``p_override``: optional :class:`dc.DynamicCarParams` whose fields are
    jnp scalars — or vmap tracers — substituted for the YAML car/env
    parameters.  This is the per-scenario parameter-batching hook
    (parallel.make_param_batched_racing_step): friction/car sweeps become
    ONE compile + one vmap instead of one compiled problem per value.  The
    closures only ever do jnp arithmetic with ``p``, so tracing with tracer
    params is exact; the Pallas kernel factories require float-literal
    params and are disabled on this path (XLA solver only).
    """
    if p_override is None:
        p = _floatify(dc.DynamicCarParams.from_config(car_config))
    else:
        p = p_override
    track_data = track.data
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
    nz, nu, nc = 10, 2, 10
    mpc_dt = float(cfg["mpc_dt"])
    w = {k: float(v) for k, v in cfg["cost_weights"].items()}
    cons_in = {k: float(v) for k, v in cfg["input_constraints"].items()}
    cons_st = {k: float(v) for k, v in cfg["state_constraints"].items()}
    obstacles_on = bool(cfg.get("obstacles", False))
    obstacles = track_data.obstacles.astype(dtype)

    st_spatial = rk4(
        _regularized_spatial(
            lambda x, u, k: dc.temporal_ode(x, u, k, p),
            sdot_idx=4,
            floor=0.3,  # inactive on the feasible set (Ux >= 3)
            beta=10.0,
            clamps=[(0, 1.0, 1e3), (3, -1.0, 1.0), (5, -8.0, 8.0), (6, -1.3, 1.3)],  # Ux, delta, ey, epsi
        )
    )
    if tail == "pm":
        cons_tail = {k: float(v) for k, v in cfg["state_pm_constraints"].items()}
        tail_spatial = euler(
            _regularized_spatial(
                lambda x, u, k: pm.temporal_ode(x, u, k, p),
                sdot_idx=1,
                floor=0.3,
                beta=10.0,
                clamps=[(0, 0.5, 1e3), (2, -8.0, 8.0), (3, -1.3, 1.3)],  # V, ey, epsi
            )
        )
    elif tail == "kc":
        cons_tail = {k: float(v) for k, v in cfg["state_kc_constraints"].items()}
        kc_p = (
            kc.KinematicCarParams(l=float(car_config["car"]["l"]))
            if p_override is None
            else kc.KinematicCarParams(l=p.l)
        )
        tail_spatial = euler(
            _regularized_spatial(
                lambda x, u, k: kc.temporal_ode(x, u, k, kc_p),
                sdot_idx=2,
                floor=0.3,
                beta=10.0,
                clamps=[(0, 0.5, 1e3), (1, -1.0, 1.0), (3, -8.0, 8.0), (4, -1.2, 1.2)],  # v, delta, ey, epsi
            )
        )
        mpc_dt_kc = float(cfg["mpc_dt_kc"])
        K_total = int(cfg["horizon_kc"]) + N  # reference's self.K is horizon_kc
    else:
        cons_tail = None
        tail_spatial = None

    # Per-stage masks computed from the (traced) stage index rather than
    # looked up from constant arrays: no gathers, and the closures capture no
    # array constants (so they run unchanged inside Pallas kernels).
    m_st_dyn = lambda n: n < N - 1
    m_seam = lambda n: (n == N - 1) & (M > 0)
    m_st_cost = lambda n: n < N
    m_switch = lambda n: (n == N) & (N > 0) & (M > 0)
    m_tail_cost = lambda n: n >= N
    m_term = lambda n: n == H - 1
    m_st_slew = lambda n: (n >= 1) & (n < N)
    if tail == "kc":
        # replicates the reference's `if k < self.K - 1` with k the *global*
        # stage index (cascaded_kinematic_mpc.py:249-252): slew only while
        # n-1 < K-1, K = horizon_kc
        _K = int(cfg["horizon_kc"])
        m_tail_slew = lambda n: (n >= N + 1) & (n - 1 < _K - 1)
    else:
        m_tail_slew = lambda n: n >= N + 1
    m_st_con = lambda n: n < N

    def u_scale_at(n):
        # (nu,)-vector of action scales at stage n, computed (not gathered)
        # from the traced index so closures capture no constant arrays
        if tail == "pm":
            u1 = jnp.where(n < N, 1.0, FORCE_SCALE).astype(dtype)
        else:
            u1 = jnp.asarray(1.0, dtype)
        return jnp.stack([jnp.full_like(u1, FORCE_SCALE), u1])

    u_scale_np = np.ones((H, nu))
    u_scale_np[:, 0] = FORCE_SCALE  # Fx in kN at every stage
    if tail == "pm":
        u_scale_np[N:, 1] = FORCE_SCALE  # Fy in kN on point-mass stages
    u_scale = jnp.asarray(u_scale_np, dtype)

    def dynamics(n, z, u, params):
        # batch-polymorphic: z may be (nz,) or (..., nz)
        x = z[..., :8]
        u_phys = u * u_scale_at(n)
        kv = params.curvature[..., n]
        dsn = params.ds[..., n]
        st_next = _sat_col(
            st_spatial(x, u_phys, kv, dsn),
            3, cons_st["delta_min"], cons_st["delta_max"],
        )

        if tail == "none":
            next8 = st_next
        else:
            Ux, Uy, r, delta, s, ey, epsi, t = [x[..., i] for i in range(8)]
            V = jnp.sqrt(Ux**2 + Uy**2)
            beta = arctan(safe_div(Uy, Ux))
            zero = jnp.zeros_like(V)
            if tail == "pm":
                # switching equalities (reference: cascaded_mpc.py:256-277) +
                # lateral-force stash for the switching cost (:241-254)
                Fx_p = u_phys[..., 0]
                fy_tot = dc.Fy_f(Ux, Uy, r, delta, Fx_p, p) + dc.Fy_r(
                    Ux, Uy, r, delta, Fx_p, p
                )
                seam_next = jnp.stack(
                    [V, s, ey, beta + epsi, t, fy_tot, zero, zero], axis=-1
                )
                tail5 = tail_spatial(x[..., :5], u_phys, kv, dsn)
                tail_next = jnp.concatenate(
                    [tail5, jnp.zeros(x.shape[:-1] + (3,), x.dtype)], axis=-1
                )
            else:  # kc
                # switching equalities incl. delta continuity (reference:
                # cascaded_kinematic_mpc.py:278-305) + accel-magnitude stash
                # computed with the PREVIOUS action (reference uses
                # action[:, N-2] at :264-276) carried in z[..., 8:10]
                uprev_phys = z[..., 8:] * u_scale_at(jnp.maximum(n - 1, 0))
                xdot = dc.temporal_ode(x, uprev_phys, jnp.zeros((), x.dtype), p)
                a_final = jnp.sqrt(xdot[..., 0] ** 2 + xdot[..., 1] ** 2)
                seam_next = jnp.stack(
                    [V, delta, s, ey, beta + epsi, t, a_final, uprev_phys[..., 1]],
                    axis=-1,
                )
                tail6 = _sat_col(
                    tail_spatial(x[..., :6], u_phys, kv, dsn),
                    1, cons_tail["delta_min"], cons_tail["delta_max"],
                )
                tail_next = jnp.concatenate(
                    [tail6, jnp.zeros(x.shape[:-1] + (2,), x.dtype)], axis=-1
                )
            next8 = jnp.where(
                m_st_dyn(n), st_next, jnp.where(m_seam(n), seam_next, tail_next)
            )
        return jnp.concatenate([next8, u], axis=-1)

    def st_cost(n, z, u_phys, params):
        x = z[..., :8]
        ey, s, w_act, Fx = x[..., 5], x[..., 4], u_phys[..., 1], u_phys[..., 0]
        dsn = params.ds[..., n]
        cost = _boundary(ey, dsn, w["boundary"], cons_st["ey_min"], cons_st["ey_max"])
        cost += w["deviation_st"] * dsn * ey**2
        cost += w["w"] * w_act**2
        cost += _slip_penalty(x, Fx, p, w["slip"])
        # Fx slew vs previous action (reference: cascaded_mpc.py:167-171 uses
        # ds[n] with the *forward* difference; shifted here => ds[n-1])
        ds_prev = params.ds[..., jnp.maximum(n - 1, 0)]
        Fx_prev = z[..., 8] * u_scale_at(jnp.maximum(n - 1, 0))[0]
        cost += m_st_slew(n) * (w["Fx"] / ds_prev) * (Fx - Fx_prev) ** 2
        if obstacles_on:
            if tail == "kc":
                cost += _obstacle_barrier_kc(obstacles, s, ey, dsn, n.astype(dtype))
            else:
                cost += _obstacle_barrier(obstacles, s, ey, dsn, w["obstacles"])
        return cost

    def pm_cost(n, z, u_phys, params):
        V, s, ey = z[..., 0], z[..., 1], z[..., 2]
        dsn = params.ds[..., n]
        cost = _boundary(ey, dsn, w["boundary"], cons_tail["ey_min"], cons_tail["ey_max"])
        cost += w["deviation_pm"] * dsn * ey**2
        ds_prev = params.ds[..., jnp.maximum(n - 1, 0)]
        uprev_phys = z[..., 8:] * u_scale_at(jnp.maximum(n - 1, 0))
        slew = (w["Fx"] / ds_prev) * (u_phys[..., 0] - uprev_phys[..., 0]) ** 2
        slew += (w["Fy"] / ds_prev) * (u_phys[..., 1] - uprev_phys[..., 1]) ** 2
        cost += m_tail_slew(n) * slew
        if obstacles_on:
            cost += _obstacle_barrier(obstacles, s, ey, dsn, w["obstacles"])
        return cost

    def kc_cost(n, z, u_phys, params):
        v, delta, s, ey = z[..., 0], z[..., 1], z[..., 2], z[..., 3]
        a_act, w_act = u_phys[..., 0], u_phys[..., 1]
        dsn = params.ds[..., n]
        cost = _boundary(ey, dsn, w["boundary"], cons_tail["ey_min"], cons_tail["ey_max"])
        cost += w["deviation_kc"] * dsn * ey**2
        cost += w["w_kc"] * w_act**2
        uprev_phys = z[..., 8:] * u_scale_at(jnp.maximum(n - 1, 0))
        cost += m_tail_slew(n) * w["a"] * (a_act - uprev_phys[..., 0]) ** 2
        if obstacles_on:
            cost += _obstacle_barrier_kc(obstacles, s, ey, dsn, n.astype(dtype))
        return cost

    def switch_cost(n, z, u_phys, params):
        uprev_phys = z[..., 8:] * u_scale_at(jnp.maximum(n - 1, 0))
        if tail == "pm":
            # force continuity at the handoff (reference: cascaded_mpc.py:241-254)
            ds_seam = params.ds[..., N - 1]
            fy_stash = z[..., 5]
            return (w["switch_F"] / ds_seam) * (
                (u_phys[..., 0] - uprev_phys[..., 0]) ** 2
                + (u_phys[..., 1] - fy_stash) ** 2
            )
        else:  # kc: accel/steer-rate continuity (cascaded_kinematic_mpc.py:264-276)
            ds_n = params.ds[..., jnp.minimum(N, H - 1)]
            a_stash, w_stash = z[..., 6], z[..., 7]
            return (w["Fy"] / ds_n) * (
                (a_stash - u_phys[..., 0]) ** 2 + (w_stash - u_phys[..., 1]) ** 2
            )

    if tail == "pm":
        term_idx = {"speed": 0, "ey": 2, "epsi": 3, "t": 4}
    elif tail == "kc":
        term_idx = {"speed": 0, "ey": 3, "epsi": 4, "t": 5}
    else:
        term_idx = {"speed": 0, "ey": 5, "epsi": 6, "t": 7}

    def term_cost(z):
        # reference: cascaded_mpc.py:279-304
        speed = z[..., term_idx["speed"]]
        over = jnp.where(
            speed >= cons_st["max_speed"], (speed - cons_st["max_speed"]) ** 2, 0.0
        )
        return (
            w["speed"] * over
            + w["time"] * z[..., term_idx["t"]]
            + w["ey"] * z[..., term_idx["ey"]] ** 2
            + w["epsi"] * z[..., term_idx["epsi"]] ** 2
        )

    def stage_cost(n, z, u, params):
        u_phys = u * u_scale_at(n)
        cost = m_st_cost(n) * st_cost(n, z, u_phys, params)
        if tail == "pm":
            cost += m_tail_cost(n) * pm_cost(n, z, u_phys, params)
            cost += m_switch(n) * switch_cost(n, z, u_phys, params)
        elif tail == "kc":
            cost += m_tail_cost(n) * kc_cost(n, z, u_phys, params)
            cost += m_switch(n) * switch_cost(n, z, u_phys, params)
        cost += m_term(n) * term_cost(z)
        return cost

    def constraints(n, z, u, params):
        u_phys = u * u_scale_at(n)
        x = z[..., :8]
        c_st = _st_constraints(x, u_phys[..., 0], u_phys[..., 1], p, cons_in, cons_st)
        c_st = _mask_stage0_state_rows(n, c_st)
        if tail == "none":
            return c_st
        fs = 1.0 / FORCE_SCALE
        if tail == "pm":
            V = z[..., 0]
            pad = jnp.full_like(V, -1.0)
            c_tail = jnp.stack(
                [
                    cons_tail["V_min"] - V,
                    (u_phys[..., 0] - p.Peng / jnp.maximum(V, 1.0)) * fs,
                ]
                + [pad] * 8,
                axis=-1,
            )
        else:  # kc (reference: cascaded_kinematic_mpc.py:192-226)
            v, delta = z[..., 0], z[..., 1]
            pad = jnp.full_like(v, -1.0)
            c_tail = jnp.stack(
                [
                    cons_tail["v_min"] - v,
                    delta - cons_tail["delta_max"],
                    cons_tail["delta_min"] - delta,
                    u_phys[..., 0] - cons_in["a_max"],
                    cons_in["a_min"] - u_phys[..., 0],
                    u_phys[..., 1] - cons_in["w_max"],
                    cons_in["w_min"] - u_phys[..., 1],
                ]
                + [pad] * 3,
                axis=-1,
            )
        return jnp.where(m_st_con(n), c_st, c_tail)

    # -- horizon initialization (reference: cascaded_mpc.py:316-338) ---------

    def init_horizon(state0, X_prev, U_prev):
        state0 = jnp.asarray(state0, dtype)
        Ux_pred = X_prev[:N, 0]
        ds_st = mpc_dt * Ux_pred
        s_traj = jnp.cumsum(ds_st) - ds_st[0] + state0[4]
        k_st = track_mod.curvature(track_data, s_traj).astype(dtype)
        if tail == "pm":
            ds_tail = jnp.full((M,), float(cfg["ds_pm"]), dtype)
            s_tail = jnp.cumsum(ds_tail) - ds_st[-1] + s_traj[-1]
            k_tail = track_mod.curvature(track_data, s_tail).astype(dtype)
            ds_all = jnp.concatenate([ds_st, ds_tail])
            k_all = jnp.concatenate([k_st, k_tail])
        elif tail == "kc":
            v_pred = X_prev[N:H, 0]
            ds_tail = mpc_dt_kc * v_pred
            s_tail = jnp.cumsum(ds_tail) - ds_st[-1] + s_traj[-1]
            k_tail = track_mod.curvature(track_data, s_tail).astype(dtype)
            ds_all = jnp.concatenate([ds_st, ds_tail])
            k_all = jnp.concatenate([k_st, k_tail])
        else:
            ds_all, k_all = ds_st, k_st
        params = HorizonParams(curvature=k_all, ds=ds_all)
        z0 = jnp.concatenate([state0, jnp.zeros((2,), dtype)])
        return params, z0

    def initial_prediction():
        # reference: ones with Ux[:N] += 3 (cascaded_mpc.py:72-76); we seed
        # the tail speed at 4 as well — the tail rows' speed feeds the ds
        # warm start and a 1 m/s guess makes the first rollouts needlessly stiff
        X0 = np.ones((H, nz))
        X0[:, 0] = 4.0
        return jnp.asarray(X0, dtype), jnp.zeros((H, nu), dtype)

    def warm_start(state0):
        """Curvature feed-forward cold-start guess for a mid-track drop.

        A single-shooting rollout of U=0 diverges on the long low-fidelity
        tail (ey integrates away over M coarse Euler stages and the fixed
        iteration budget cannot crawl back); seeding speed-consistent ds and
        steady-state controls (Fx = drag, tail Fy = m V^2 k) puts the first
        rollout in the convergence basin for any physical drop state.
        """
        state0 = jnp.asarray(state0, dtype)
        Ux0 = jnp.maximum(state0[0], 1.0)
        X0 = jnp.ones((H, nz), dtype).at[:, 0].set(Ux0)
        dragF = p.Frr + p.Cd * Ux0**2
        U0 = jnp.zeros((H, nu), dtype).at[:, 0].set(dragF / FORCE_SCALE)
        if tail == "pm":
            s_st = state0[4] + mpc_dt * Ux0 * jnp.arange(N, dtype=dtype)
            s_tail = s_st[-1] + float(cfg["ds_pm"]) * jnp.arange(
                1, M + 1, dtype=dtype
            )
            k_tail = track_mod.curvature(track_data, s_tail).astype(dtype)
            U0 = U0.at[N:, 1].set(p.m * Ux0**2 * k_tail / FORCE_SCALE)
        elif tail == "kc":
            U0 = U0.at[N:, 0].set(0.0)  # kc tail: a = 0 holds speed
        return X0, U0

    # Rollout control boxes (solver units).  The steer-rate box is the real
    # constraint; the force boxes are loose physical sanity bounds (the tight,
    # state-dependent engine/friction limits live in the AL constraints) that
    # keep single-shooting rollouts of the stiff spatial dynamics bounded.
    # Physical force envelope ~ mu*m*g ~ 16 kN per axis; boxes are kept a
    # bit wider so they never bind at the optimum (engine power allows up to
    # Peng/Ux_min ~ 57 kN of drive force at the Ux_min bound).
    lo = np.empty((H, nu))
    hi = np.empty((H, nu))
    lo[:, 0], hi[:, 0] = -30.0, 60.0  # Fx in kN (brake, drive)
    lo[:N, 1], hi[:N, 1] = cons_in["w_min"], cons_in["w_max"]
    if tail == "pm":
        lo[N:, 1], hi[N:, 1] = -25.0, 25.0  # Fy in kN
    elif tail == "kc":
        # the a slot shares the Fx FORCE_SCALE (see u_scale_at), so its box
        # must be expressed in solver units
        lo[N:, 0] = cons_in["a_min"] / FORCE_SCALE
        hi[N:, 0] = cons_in["a_max"] / FORCE_SCALE
        lo[N:, 1], hi[N:, 1] = cons_in["w_min"], cons_in["w_max"]

    def _family():
        from vehicle_control_tpu.solvers.fm_family import build_cascaded_family

        return build_cascaded_family(car_config, cfg, tail, track_data)

    if p_override is None:
        (
            linesearch_kernel_factory,
            derivs_kernel_factory,
            backward_kernel_factory,
            solve_kernel_factory,
        ) = _make_kernel_factories(_family)
    else:
        # Pallas kernels inline params as float literals; with tracer params
        # only the XLA solver path is available
        linesearch_kernel_factory = derivs_kernel_factory = None
        backward_kernel_factory = solve_kernel_factory = None

    fns = OCPFunctions(dynamics, stage_cost, constraints)
    return MPCProblem(
        fns, H, nz, nu, nc, u_scale, init_horizon, initial_prediction, 8,
        jnp.asarray(lo, dtype), jnp.asarray(hi, dtype),
        linesearch_kernel_factory, derivs_kernel_factory,
        backward_kernel_factory, solve_kernel_factory, warm_start,
    )


# ---------------------------------------------------------------------------
# Pure kinematic MPC (reference: kinematic_mpc.py)
# ---------------------------------------------------------------------------


def build_kinematic_problem(
    car_config, track: "track_mod.Track", cfg, dtype=jnp.float64
) -> MPCProblem:
    p = _floatify(kc.KinematicCarParams.from_config(car_config))
    track_data = track.data
    N = int(cfg["horizon"])
    H = N + 1  # states 0..N as in the reference (opti.variable(ns, N+1))
    nz, nu, nc = 8, 2, 10
    mpc_dt = float(cfg["mpc_dt"])
    w = {k: float(v) for k, v in cfg["cost_weights"].items()}
    cons_in = {k: float(v) for k, v in cfg["input_constraints"].items()}
    cons_st = {k: float(v) for k, v in cfg["state_constraints"].items()}
    obstacles_on = bool(cfg.get("obstacles", False))
    obstacles = track_data.obstacles.astype(dtype)

    spatial = euler(
        _regularized_spatial(
            lambda x, u, k: kc.temporal_ode(x, u, k, p),
            sdot_idx=2,
            floor=0.02,  # must stay far below the 0.1 m/s start speed
            beta=50.0,
            clamps=[(1, -1.0, 1.0), (3, -8.0, 8.0), (4, -1.2, 1.2)],  # delta, ey, epsi
        )
    )

    m_stage = lambda n: n < N
    m_dyn = lambda n: n < N
    m_slew = lambda n: (n >= 1) & (n < N)
    m_term = lambda n: n == N
    u_scale = jnp.ones((H, nu), dtype)

    def dynamics(n, z, u, params):
        x = z[..., :6]
        nxt = _sat_col(
            spatial(x, u, params.curvature[..., n], params.ds[..., n]),
            1, cons_st["delta_min"], cons_st["delta_max"],
        )
        nxt = jnp.where(m_dyn(n), nxt, x)
        return jnp.concatenate([nxt, u], axis=-1)

    def stage_cost(n, z, u, params):
        v, delta, s, ey, epsi, t = [z[..., i] for i in range(6)]
        a_act, w_act = u[..., 0], u[..., 1]
        dsn = params.ds[..., n]
        cost = _boundary(ey, dsn, w["boundary"], cons_st["ey_min"], cons_st["ey_max"])
        cost += w["deviation"] * dsn * ey**2
        cost += w["w"] * w_act**2
        # a-slew (reference: kinematic_mpc.py:126-128, no ds factor)
        cost += m_slew(n) * w["a"] * (a_act - z[..., 6]) ** 2
        if obstacles_on:
            cost += _obstacle_barrier(obstacles, s, ey, dsn, w["obstacles"])
        cost = jnp.where(m_stage(n), cost, 0.0)
        # terminal (reference: kinematic_mpc.py:137-158)
        over = jnp.where(v >= cons_st["v_max"], (v - cons_st["v_max"]) ** 2, 0.0)
        term = w["v"] * over + w["time"] * t + w["ey"] * ey**2 + w["epsi"] * epsi**2
        return cost + m_term(n) * term

    def constraints(n, z, u, params):
        v, delta = z[..., 0], z[..., 1]
        pad = jnp.full_like(v, -1.0)
        c = jnp.stack(
            [
                cons_st["v_min"] - v,
                delta - cons_st["delta_max"],
                cons_st["delta_min"] - delta,
                u[..., 0] - cons_in["a_max"],
                cons_in["a_min"] - u[..., 0],
                u[..., 1] - cons_in["w_max"],
                cons_in["w_min"] - u[..., 1],
            ]
            + [pad] * 3,
            axis=-1,
        )
        c = _mask_stage0_state_rows(n, c)
        inactive = jnp.full_like(c, -1.0)
        return jnp.where(m_dyn(n), c, inactive)

    def init_horizon(state0, X_prev, U_prev):
        # reference: kinematic_mpc.py:170-187 (note the ds/k off-by-one quirk:
        # ds param uses v_pred[:N]+0.5 while the cumsum starts at 0)
        state0 = jnp.asarray(state0, dtype)
        v_pred = X_prev[:, 0]
        ds_traj = mpc_dt * v_pred + 0.5  # (H,) = (N+1,)
        ds_param = ds_traj[:N]
        steps = ds_traj.at[0].set(0.0)
        s_traj = jnp.cumsum(steps) + state0[2]
        k_param = track_mod.curvature(track_data, s_traj[:N]).astype(dtype)
        params = HorizonParams(
            curvature=jnp.concatenate([k_param, k_param[-1:]]),
            ds=jnp.concatenate([ds_param, ds_param[-1:]]),
        )
        z0 = jnp.concatenate([state0, jnp.zeros((2,), dtype)])
        return params, z0

    def initial_prediction():
        # reference: zeros with v += 0.1 (kinematic_mpc.py:64-68)
        X0 = np.zeros((H, nz))
        X0[:, 0] = 0.1
        return jnp.asarray(X0, dtype), jnp.zeros((H, nu), dtype)

    def warm_start(state0):
        """Speed-aligned cold-start guess (see the cascaded builder)."""
        state0 = jnp.asarray(state0, dtype)
        v0 = jnp.maximum(state0[0], 0.1)
        X0 = jnp.zeros((H, nz), dtype).at[:, 0].set(v0)
        return X0, jnp.zeros((H, nu), dtype)

    lo = np.tile([cons_in["a_min"], cons_in["w_min"]], (H, 1))
    hi = np.tile([cons_in["a_max"], cons_in["w_max"]], (H, 1))

    def _family():
        from vehicle_control_tpu.solvers.fm_family import build_kinematic_family

        return build_kinematic_family(car_config, cfg, track_data)

    ls_f, derivs_f, backward_f, solve_f = _make_kernel_factories(_family)
    fns = OCPFunctions(dynamics, stage_cost, constraints)
    return MPCProblem(
        fns, H, nz, nu, nc, u_scale, init_horizon, initial_prediction, 6,
        jnp.asarray(lo, dtype), jnp.asarray(hi, dtype),
        ls_f, derivs_f, backward_f, solve_f, warm_start,
    )
