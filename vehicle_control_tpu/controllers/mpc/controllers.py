"""MPC controllers: jitted step functions + reference-API stateful wrappers.

The reference controllers hold a persistent ``ca.Opti`` and mutate
``state_prediction``/``action_prediction`` between solves (warm start,
cascaded_mpc.py:306-338).  Here the per-step computation is one **pure
function** ``step(carry, state) -> (carry, action, info)`` — the carry is the
warm-start state (previous predictions + AL multipliers).  That function is
jitted once, scanned over by the closed-loop simulator, and vmapped /
shard_mapped over scenario batches.  The classes below are thin stateful
wrappers giving the reference's ``controller.command(state)`` API
(controller.py:13-19) for interactive use.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from vehicle_control_tpu.controllers.mpc import problems
from vehicle_control_tpu.environment import track as track_mod
from vehicle_control_tpu.solvers import ALILQRConfig, build_solver


class MPCCarry(NamedTuple):
    """Warm-start state threaded between control steps (the reference's
    state/action_prediction + IPOPT warm start, cascaded_mpc.py:316-321)."""

    X_pred: jnp.ndarray  # (H, nz) previous predicted trajectory
    U_pred: jnp.ndarray  # (H, nu) previous controls (solver scale)
    lam: jnp.ndarray  # (H, nc) AL multipliers


class MPCInfo(NamedTuple):
    cost: jnp.ndarray
    violation: jnp.ndarray
    converged: jnp.ndarray
    iterations: jnp.ndarray
    X_pred: jnp.ndarray  # (H, nz) predicted states (for plots/analysis)


def _solver_config(cfg) -> ALILQRConfig:
    """Read optional solver hyper-parameters from the controller YAML."""
    s = cfg.get("solver", None) or {}
    return ALILQRConfig(
        n_outer=int(s.get("n_outer", 3)),
        n_inner=int(s.get("n_inner", 8)),
        n_polish=int(s.get("n_polish", 0)),
        polish_mu_boost=float(s.get("polish_mu_boost", 1.0)),
        n_alpha=int(s.get("n_alpha", 8)),
        mu0=float(s.get("mu0", 10.0)),
        mu_scale=float(s.get("mu_scale", 10.0)),
        tol_con=float(s.get("tol_con", 1e-3)),
        tol_cost=float(s.get("tol_cost", 1e-7)),
        recover_viol=float(s.get("recover_viol", 5.0)),
    )


def make_mpc_step(problem: problems.MPCProblem, solver_cfg: ALILQRConfig):
    """Build the pure per-control-step function.

    step(carry, state) -> (carry', action_phys, info); trace-once, vmap-clean.
    Warm-start discipline matches the reference: previous solution seeds both
    the ds/curvature horizon parameters and the solver initial point.
    """
    any_kernel = (
        solver_cfg.use_ls_kernel
        or solver_cfg.use_derivs_kernel
        or solver_cfg.use_backward_kernel
        or solver_cfg.use_solve_kernel
    )
    if any_kernel and problem.u_scale.dtype != jnp.float32:
        import warnings

        warnings.warn(
            "Pallas kernel paths compute in f32; requesting them on a "
            f"{problem.u_scale.dtype} problem silently downgrades derivative/"
            "line-search precision (outputs are cast back). Build the problem "
            "with dtype=jnp.float32 for the kernel paths.",
            stacklevel=2,
        )
    ls_kernel = None
    if solver_cfg.use_ls_kernel and problem.linesearch_kernel_factory is not None:
        alphas = [
            solver_cfg.alpha_min ** (i / (solver_cfg.n_alpha - 1))
            for i in range(solver_cfg.n_alpha)
        ]
        ls_kernel = problem.linesearch_kernel_factory(alphas)
    derivs_kernel = None
    if solver_cfg.use_derivs_kernel and problem.derivs_kernel_factory is not None:
        derivs_kernel = problem.derivs_kernel_factory()
    backward_kernel = None
    if (
        solver_cfg.use_backward_kernel
        and problem.backward_kernel_factory is not None
    ):
        backward_kernel = problem.backward_kernel_factory()
    solve_kernel = None
    if solver_cfg.use_solve_kernel and problem.solve_kernel_factory is not None:
        solve_kernel = problem.solve_kernel_factory(solver_cfg)
    solve = build_solver(
        problem.fns,
        problem.horizon,
        solver_cfg,
        problem.u_lo,
        problem.u_hi,
        ls_kernel=ls_kernel,
        derivs_kernel=derivs_kernel,
        backward_kernel=backward_kernel,
        solve_kernel=solve_kernel,
    )

    def step(carry: MPCCarry, state):
        params, z0 = problem.init_horizon(state, carry.X_pred, carry.U_pred)
        sol = solve(params, z0, carry.U_pred, carry.lam)
        action = sol.U[0] * problem.u_scale[0]
        # Receding-horizon warm start: shift the solution one stage forward
        # (repeat the last stage).  The reference warm-starts unshifted
        # (cascaded_mpc.py:320-321) because IPOPT re-solves to optimality;
        # for a fixed-iteration solver the shifted start is decisively more
        # consistent (closed-loop ablation in tests/test_mpc.py).
        new_carry = MPCCarry(
            X_pred=jnp.concatenate([sol.X[1:], sol.X[-1:]]),
            U_pred=jnp.concatenate([sol.U[1:], sol.U[-1:]]),
            lam=jnp.concatenate([sol.lam[1:], sol.lam[-1:]]),
        )
        # Per-lane failure recovery.  A solve that diverged (non-finite cost/
        # violation, or violation orders of magnitude beyond any transient)
        # would otherwise poison the warm-start carry and the lane never
        # converges again — measured on TPU fleets: ~2.6% of obstacle-config
        # lanes stuck for 20+ consecutive steps with violations of 1e1..1e16
        # and NaN.  Reset such a lane to the physics-informed cold-start
        # guess (the drop-in warm start, which converges from any physical
        # state) and command its safe stage-0 control instead of the garbage
        # action.  The reference's analogue swallows the IPOPT exception and
        # crashes on unpack (racing.py:416-423); here recovery is masked,
        # per-scenario, and on-device.
        if problem.warm_start is not None and solver_cfg.recover_viol > 0.0:
            broken = (
                ~jnp.isfinite(sol.cost)
                | ~jnp.isfinite(sol.violation)
                | (sol.violation > solver_cfg.recover_viol)
            )
            Xw, Uw = problem.warm_start(state)
            Xw, Uw = Xw.astype(sol.X.dtype), Uw.astype(sol.U.dtype)
            new_carry = MPCCarry(
                X_pred=jnp.where(broken, Xw, new_carry.X_pred),
                U_pred=jnp.where(broken, Uw, new_carry.U_pred),
                lam=jnp.where(broken, jnp.zeros_like(new_carry.lam), new_carry.lam),
            )
            action = jnp.where(broken, Uw[0] * problem.u_scale[0], action)
        info = MPCInfo(sol.cost, sol.violation, sol.converged, sol.iterations, sol.X)
        return new_carry, action, info

    return step


def parity_solver_config(n_outer=12, n_inner=40, n_polish=12) -> ALILQRConfig:
    """Solve-to-optimality configuration for reference-parity measurement.

    The reference solves every step to IPOPT's convergence tolerance
    (cascaded_mpc.py:306-314); the production fixed-budget config
    (`_solver_config`) intentionally trades optimality for throughput, which
    leaves O(1e-3) action deviation.  This budget — large fixed iteration
    counts with per-lane convergence freezing, tight tolerances, full f64 on
    CPU — reproduces the reference's actions to ~1e-7 median normalized
    deviation (see PARITY.json / scripts/parity_probe.py).  Offline use
    only: ~1-3 s/step on CPU.
    """
    return ALILQRConfig(
        n_outer=n_outer,
        n_inner=n_inner,
        n_polish=n_polish,
        n_alpha=12,
        mu_max=1e10,
        tol_con=1e-8,
        tol_cost=1e-12,
        recover_viol=0.0,
    )


def make_parity_step(problem: problems.MPCProblem, solver_cfg=None):
    """The parity-measurement step: like :func:`make_mpc_step` but with the
    reference's UNSHIFTED warm start (the previous solution seeds the next
    solve as-is, cascaded_mpc.py:316-321 — correct when every solve reaches
    optimality; the shifted carry is better under a fixed budget but
    perturbs the ds/curvature horizon parameters vs the reference)."""
    from vehicle_control_tpu.solvers import build_solver

    cfg = solver_cfg or parity_solver_config()
    solve = build_solver(problem.fns, problem.horizon, cfg, problem.u_lo, problem.u_hi)

    def step(carry: MPCCarry, state):
        params, z0 = problem.init_horizon(state, carry.X_pred, carry.U_pred)
        sol = solve(params, z0, carry.U_pred, carry.lam)
        action = sol.U[0] * problem.u_scale[0]
        new_carry = MPCCarry(X_pred=sol.X, U_pred=sol.U, lam=sol.lam)
        info = MPCInfo(sol.cost, sol.violation, sol.converged, sol.iterations, sol.X)
        return new_carry, action, info

    return step


def initial_carry(problem: problems.MPCProblem, dtype=None) -> MPCCarry:
    X0, U0 = problem.initial_prediction()
    if dtype is not None:
        X0, U0 = X0.astype(dtype), U0.astype(dtype)
    lam0 = jnp.zeros((problem.horizon, problem.nc), X0.dtype)
    return MPCCarry(X0, U0, lam0)


class _MPCBase:
    """Stateful wrapper: the reference Controller API (command/state_prediction
    /get_state_prediction; reference: controllers/mpc/*.py)."""

    def __init__(self, problem: problems.MPCProblem, cfg, track, dtype):
        self.config = cfg
        self.track = track
        self.problem = problem
        self.dtype = dtype
        self._step = jax.jit(make_mpc_step(problem, _solver_config(cfg)))
        self._carry = initial_carry(problem, dtype)
        self.last_info: MPCInfo | None = None

    def command(self, state):
        """One control step: returns the first optimal action (physical units)."""
        state = jnp.asarray(state, self.dtype)[: self.problem.ns_model]
        pad = self.problem.nz - 2 - state.shape[0]
        if pad > 0:
            state = jnp.concatenate([state, jnp.zeros((pad,), self.dtype)])
        self._carry, action, info = self._step(self._carry, state)
        self.last_info = info
        return action

    @property
    def state_prediction(self):
        """(H, ns_model) predicted physical states."""
        return self._carry.X_pred[:, : self.problem.ns_model]

    @property
    def action_prediction(self):
        """(H, nu) predicted physical actions."""
        return self._carry.U_pred * self.problem.u_scale

    def get_state_prediction(self):
        """Global-frame (x, y, psi) of the predicted trajectory
        (reference: cascaded_mpc.py:340-352)."""
        X = self.state_prediction
        s_idx, ey_idx, epsi_idx = self._frenet_indices()
        x, y, psi = track_mod.rel2glob(
            self.track.data, X[:, s_idx], X[:, ey_idx], X[:, epsi_idx]
        )
        return jnp.stack([x, y, psi], axis=-1)

    def _frenet_indices(self):
        raise NotImplementedError

    def reset(self):
        self._carry = initial_carry(self.problem, self.dtype)


class CascadedMPC(_MPCBase):
    """Single-track + point-mass cascaded MPC (reference: cascaded_mpc.py)."""

    def __init__(self, car_config, track, cfg, dtype=jnp.float64):
        problem = problems.build_cascaded_problem(
            car_config, track, cfg, tail="pm", dtype=dtype
        )
        super().__init__(problem, cfg, track, dtype)
        self.N = int(cfg["horizon"])

    def _frenet_indices(self):
        # NOTE: valid for the single-track rows; pm rows use (1, 2, 3).
        return 4, 5, 6

    def get_state_prediction(self):
        X = self._carry.X_pred
        N = self.N
        xs, ys, psis = track_mod.rel2glob(
            self.track.data, X[:N, 4], X[:N, 5], X[:N, 6]
        )
        if self.problem.horizon > N:
            xp, yp, psip = track_mod.rel2glob(
                self.track.data, X[N:, 1], X[N:, 2], X[N:, 3]
            )
            xs = jnp.concatenate([xs, xp])
            ys = jnp.concatenate([ys, yp])
            psis = jnp.concatenate([psis, psip])
        return jnp.stack([xs, ys, psis], axis=-1)


class SingleTrackMPC(CascadedMPC):
    """Single-track-only MPC — the reference's `singletrack.yaml` (M = 0)
    configuration of CascadedMPC."""


class CascadedKinematicMPC(_MPCBase):
    """Single-track + kinematic-tail cascaded MPC
    (reference: cascaded_kinematic_mpc.py)."""

    def __init__(self, car_config, track, cfg, dtype=jnp.float64):
        problem = problems.build_cascaded_problem(
            car_config, track, cfg, tail="kc", dtype=dtype
        )
        super().__init__(problem, cfg, track, dtype)
        self.N = int(cfg["horizon"])

    def get_state_prediction(self):
        X = self._carry.X_pred
        N = self.N
        xs, ys, psis = track_mod.rel2glob(
            self.track.data, X[:N, 4], X[:N, 5], X[:N, 6]
        )
        if self.problem.horizon > N:
            xp, yp, psip = track_mod.rel2glob(
                self.track.data, X[N:, 2], X[N:, 3], X[N:, 4]
            )
            xs = jnp.concatenate([xs, xp])
            ys = jnp.concatenate([ys, yp])
            psis = jnp.concatenate([psis, psip])
        return jnp.stack([xs, ys, psis], axis=-1)


class KinematicMPC(_MPCBase):
    """Pure kinematic-bicycle MPC (reference: kinematic_mpc.py)."""

    def __init__(self, car_config, track, cfg, dtype=jnp.float64):
        problem = problems.build_kinematic_problem(car_config, track, cfg, dtype=dtype)
        super().__init__(problem, cfg, track, dtype)

    def _frenet_indices(self):
        return 2, 3, 4
