"""Augmented-Lagrangian iLQR: the TPU-native NLP engine.

This module replaces the reference's per-step CasADi ``Opti('nlp')`` + IPOPT +
HSL MA27 stack (reference: vehicle_control/controllers/mpc/cascaded_mpc.py:53-66,
solve at :308).  Instead of an interior-point method over a sparse symbolic
graph, the trajectory NLP is solved by:

* an **outer augmented-Lagrangian loop** (PHR formulation) that turns the
  stage inequality constraints ``c(n, z, u) <= 0`` into smooth penalties with
  multiplier updates — playing the role of IPOPT's barrier/filter machinery;
* an **inner iLQR loop**: stage-wise Jacobians/Hessians via ``jax.jacfwd``
  (replacing CasADi AD), a Riccati backward sweep over the horizon (replacing
  the MA27 sparse KKT factorization — the KKT system of this OCP is exactly
  block-tridiagonal, which the Riccati recursion factorizes in one pass), and
  a **parallel line search**: all backtracking candidates are rolled out at
  once under ``vmap`` instead of sequentially — extra parallel FLOPs are free
  on the VPU, wall-clock is not.

Everything is static-shaped and fixed-iteration-count with convergence masks,
so one ``solve`` traces once under ``jit`` and batches cleanly under ``vmap``
/ ``shard_map`` over thousands of scenarios — the primary TPU scaling axis
(SURVEY §2.3).  A non-converged scenario is a masked status in ``stats``,
never an exception (SURVEY §5: solver failure must be first-class, unlike the
reference's try/except at racing.py:416-423).

Problem form (all shapes static):

    minimize   sum_n  stage_cost(n, z_n, u_n, params)
    subject to z_{n+1} = dynamics(n, z_n, u_n, params)     n = 0..H-2
               constraints(n, z_n, u_n, params) <= 0       n = 0..H-1
               z_0 fixed

Terminal costs are folded into ``stage_cost`` at ``n == H-1`` (the dynamics
output at the last stage is computed but unused).  Controls are single-
shooting decision variables; states come from the rollout, so dynamics hold
exactly at every iterate — matching the reference NLP at its solution.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from vehicle_control_tpu.solvers.riccati import _mv, riccati_backward


class OCPFunctions(NamedTuple):
    """The three problem callbacks.  Each takes the stage index ``n`` (traced
    int32), the augmented state ``z`` (nz,), the control ``u`` (nu,) and the
    parameter pytree, and must be pure jnp (trace-once, vmap-clean)."""

    dynamics: Callable  # (n, z, u, params) -> z_next (nz,)
    stage_cost: Callable  # (n, z, u, params) -> scalar
    constraints: Callable  # (n, z, u, params) -> (nc,)  with c <= 0 feasible


@dataclasses.dataclass(frozen=True)
class ALILQRConfig:
    """Static solver hyper-parameters (baked into the trace)."""

    n_outer: int = 4  # augmented-Lagrangian multiplier updates
    n_inner: int = 10  # iLQR iterations per outer loop
    n_polish: int = 0  # extra iLQR iterations AFTER the final multiplier
    # update: without them the returned trajectory was optimized against the
    # *previous* multipliers, so near-converged lanes keep O(tol_con..1e-3)
    # residuals the last lam/mu update would have fixed.  2 polish iterations
    # cost ~n_polish/(n_outer*n_inner) and convert those marginal lanes.
    polish_mu_boost: float = 1.0  # extra penalty factor for the polish
    # phase only: the AL residual of a near-optimal lane scales ~1/mu, so
    # polishing against boost*mu pulls marginal (1-5x tol_con) flicker
    # lanes under tolerance without extra iterations.  Safe at warm starts
    # (the iterate barely moves); 1.0 = previous behavior.
    n_alpha: int = 8  # parallel line-search candidates
    alpha_min: float = 1e-3  # smallest candidate step
    mu0: float = 10.0  # initial penalty
    mu_scale: float = 10.0  # penalty growth per outer iteration
    mu_max: float = 1e8
    rho0: float = 1e-6  # initial LM regularization
    rho_scale: float = 10.0
    rho_min: float = 1e-8
    rho_max: float = 1e10
    tol_cost: float = 1e-7  # relative cost-decrease convergence tol
    tol_con: float = 1e-4  # constraint-violation tolerance
    armijo: float = 1e-4
    record_trace: bool = False  # also return per-iteration diagnostics
    use_ls_kernel: bool = False  # Pallas field-major line-search costs
    use_derivs_kernel: bool = False  # Pallas field-major stage derivatives
    use_backward_kernel: bool = False  # fully-fused Pallas derivs+Riccati
    # (all honored by make_mpc_step when the problem family supports them)
    use_parallel_riccati: bool = False  # associative-scan Riccati: O(log H)
    # serial depth — the single-scenario latency path (SURVEY §2.3 SP axis);
    # the sequential sweep stays default for the batched throughput path
    use_solve_kernel: bool = False  # ONE Pallas kernel for the entire solve
    # (warm rollout + all AL/iLQR iterations + multiplier updates in VMEM);
    # supersedes the per-phase kernels on the batched TPU throughput path
    ls_fast_path: bool = False  # solve kernel only: sweep ONLY alpha=1 and
    # run the remaining line-search ladder iff some live lane rejected it
    # (lax.cond on a tile-wide reduction).  Bitwise-identical (skipped
    # candidates' costs are never read); saves ~(A-1)/A of the line-search
    # work per iteration in warm steady state
    early_exit: bool = True  # solve kernel only: stop the inner loop once
    # every lane in the 1024-scenario tile is done.  Iterations past that
    # point are exact no-ops (all updates masked by was_done), so the early
    # exit is bitwise-identical; in warm steady state most tiles drain in
    # 1-3 of the n_inner budgeted iterations
    unroll: int = 4  # lax.scan unroll for the per-stage sweeps: the stages
    # are tiny (10x10 blocks), so dispatch overhead dominates a rolled scan
    # on TPU; unrolling lets XLA fuse several stages per loop iteration
    recover_viol: float = 5.0  # per-lane failure recovery threshold used by
    # make_mpc_step: a solve whose max violation is non-finite or above this
    # resets that lane's warm-start carry to the problem's physics-informed
    # cold-start guess (poisoned carries otherwise zombie the lane forever;
    # normal standing-start transients are O(0.1-1)).  0 disables.


class Solution(NamedTuple):
    X: jnp.ndarray  # (H, nz) state trajectory
    U: jnp.ndarray  # (H, nu) control trajectory
    lam: jnp.ndarray  # (H, nc) final AL multipliers
    cost: jnp.ndarray  # scalar: raw objective (no penalty)
    violation: jnp.ndarray  # scalar: max constraint violation
    converged: jnp.ndarray  # bool
    iterations: jnp.ndarray  # int32: accepted inner steps


def _al_penalty(c, lam, mu):
    """PHR augmented-Lagrangian penalty for c <= 0 (smooth a.e.)."""
    lam_hat = jnp.maximum(0.0, lam + mu * c)
    return (jnp.sum(lam_hat**2) - jnp.sum(lam**2)) / (2.0 * mu)


def rollout(fns: OCPFunctions, params, z0, U):
    """Open-loop rollout of a control sequence; returns (X, cost)."""
    H = U.shape[0]

    def step(z, n):
        u = U[n]
        cost = fns.stage_cost(n, z, u, params)
        z_next = fns.dynamics(n, z, u, params)
        return z_next, (z, cost)

    _, (X, costs) = lax.scan(step, z0, jnp.arange(H))
    return X, jnp.sum(costs)


def build_solver(
    fns: OCPFunctions,
    horizon: int,
    config: ALILQRConfig | None = None,
    u_lo=None,
    u_hi=None,
    ls_kernel=None,
    derivs_kernel=None,
    backward_kernel=None,
    solve_kernel=None,
):
    """Return ``solve(params, z0, U_init, lam_init) -> Solution``.

    The returned function is pure: jit it, vmap it over (params, z0, U_init,
    lam_init) for scenario batching, shard_map it over a device mesh.

    ``u_lo``/``u_hi`` (optional, (H, nu) or broadcastable): hard control
    boxes applied by projection inside every rollout (boxed iLQR).  They keep
    single-shooting rollouts of stiff dynamics bounded — the precise
    constraint set is still enforced by the AL machinery.
    """
    cfg = config or ALILQRConfig()
    H = horizon
    if u_lo is not None:
        u_lo = jnp.asarray(u_lo)
        u_hi = jnp.asarray(u_hi)

    def clamp_u(n, u):
        if u_lo is None:
            return u
        return jnp.clip(u, u_lo[n], u_hi[n])
    ns_range = jnp.arange(H)
    # Line-search candidates: geometric ladder from 1 down to alpha_min.
    alphas = jnp.asarray(
        [cfg.alpha_min ** (i / (cfg.n_alpha - 1)) for i in range(cfg.n_alpha)]
    )

    # -- per-stage AL cost and its derivatives -------------------------------

    def al_cost_w(n, w, lam_n, mu, params, nz):
        z, u = w[:nz], w[nz:]
        c = fns.constraints(n, z, u, params)
        return fns.stage_cost(n, z, u, params) + _al_penalty(c, lam_n, mu)

    def stage_derivs(n, z, u, lam_n, mu, params):
        nz = z.shape[0]
        w = jnp.concatenate([z, u])
        cost_fn = lambda w_: al_cost_w(n, w_, lam_n, mu, params, nz)
        g = jax.grad(cost_fn)(w)
        Hw = jax.jacfwd(jax.grad(cost_fn))(w)
        Hw = 0.5 * (Hw + Hw.T)
        dyn_fn = lambda w_: fns.dynamics(n, w_[:nz], w_[nz:], params)
        J = jax.jacfwd(dyn_fn)(w)
        return (
            g[:nz],  # lz
            g[nz:],  # lu
            Hw[:nz, :nz],  # lzz
            Hw[nz:, :nz],  # luz
            Hw[nz:, nz:],  # luu
            J[:, :nz],  # A
            J[:, nz:],  # B
        )

    batched_derivs = jax.vmap(stage_derivs, in_axes=(0, 0, 0, 0, None, None))

    def total_al_cost(X, U, lam, mu, params):
        def body(acc, n):
            return (
                acc
                + fns.stage_cost(n, X[n], U[n], params)
                + _al_penalty(fns.constraints(n, X[n], U[n], params), lam[n], mu),
                None,
            )

        acc, _ = lax.scan(body, jnp.zeros(()), ns_range, unroll=cfg.unroll)
        return acc

    def raw_cost_and_violation(X, U, lam, params):
        def per_stage(n):
            c = fns.constraints(n, X[n], U[n], params)
            return fns.stage_cost(n, X[n], U[n], params), jnp.max(c)

        costs, viols = jax.vmap(per_stage)(ns_range)
        return jnp.sum(costs), jnp.maximum(jnp.max(viols), 0.0)

    # -- Riccati backward pass (see solvers/riccati.py) -----------------------

    def backward(derivs, rho, nu):
        lz, lu, lzz, luz, luu, A, B = derivs
        if cfg.use_parallel_riccati:
            from vehicle_control_tpu.solvers.riccati_parallel import (
                riccati_backward_parallel,
            )

            return riccati_backward_parallel(lz, lu, lzz, luz, luu, A, B, rho)
        return riccati_backward(lz, lu, lzz, luz, luu, A, B, rho, cfg.unroll)

    # -- closed-loop forward pass (one line-search candidate) ----------------

    def forward(alpha, Xref, Uref, kffs, Kfbs, lam, mu, params, z0):
        def fstep(carry, n):
            z, acc = carry
            u = clamp_u(n, Uref[n] + alpha * kffs[n] + _mv(Kfbs[n], z - Xref[n]))
            cost = fns.stage_cost(n, z, u, params) + _al_penalty(
                fns.constraints(n, z, u, params), lam[n], mu
            )
            z_next = fns.dynamics(n, z, u, params)
            return (z_next, acc + cost), (z, u)

        (zH, total), (X, U) = lax.scan(
            fstep, (z0, jnp.zeros(())), ns_range, unroll=cfg.unroll
        )
        # reject divergent rollouts even if their cost happens to be finite
        diverged = ~jnp.all(jnp.isfinite(X)) | (jnp.max(jnp.abs(X)) > 1e7)
        total = jnp.where(jnp.isfinite(total) & ~diverged, total, jnp.inf)
        return X, U, total

    forward_all = jax.vmap(forward, in_axes=(0,) + (None,) * 8)

    # -- optional Pallas line-search-costs path -------------------------------
    # ``ls_kernel(Xref, Uref, kffs, Kfbs, lam, mu, curv, ds, z0) -> (A, B)``
    # is inherently batched (field-major SoA over 1024-scenario tiles); it is
    # spliced under the solver's outer scenario vmap with custom_vmap.  The
    # unbatched fallback (single solve, no vmap) stays on the XLA path.
    if ls_kernel is not None:
        from jax import custom_batching

        @custom_batching.custom_vmap
        def ls_costs(Xref, Uref, kffs, Kfbs, lam, mu, params, z0):
            _, _, costs = forward_all(
                alphas.astype(Uref.dtype), Xref, Uref, kffs, Kfbs, lam, mu, params, z0
            )
            return costs  # (A,)

        @ls_costs.def_vmap
        def _ls_costs_rule(axis_size, in_batched, *args):
            B = axis_size
            # broadcast any unbatched operand (e.g. the scalar AL penalty mu,
            # which vmap never batches) to the full batch
            args = jax.tree.map(
                lambda a, b: a if b else jnp.broadcast_to(
                    jnp.asarray(a), (B,) + jnp.shape(a)
                ),
                tuple(args),
                tuple(in_batched),
            )
            Xref, Uref, kffs, Kfbs, lam, mu, params, z0 = args
            pad = (-B) % 1024
            if pad:
                def padb(a):
                    return jnp.concatenate(
                        [a, jnp.broadcast_to(a[-1:], (pad,) + a.shape[1:])], axis=0
                    )

                Xref, Uref, kffs, Kfbs, lam, mu, z0 = map(
                    padb, (Xref, Uref, kffs, Kfbs, lam, mu, z0)
                )
                params = jax.tree.map(padb, params)
            costs = ls_kernel(
                Xref, Uref, kffs, Kfbs, lam, mu, params.curvature, params.ds, z0
            )  # (A, B+pad)
            return jnp.moveaxis(costs[:, :B], 0, 1), True  # (B, A)
    else:
        ls_costs = None

    # -- optional Pallas per-stage-derivatives path ---------------------------
    # ``derivs_kernel(X, U, lam, mu, curv, ds) -> (g (B,H,nw),
    # Hw (B,H,nw,nw), J (B,H,nz,nw))``; same custom_vmap splice.
    if derivs_kernel is not None:
        from jax import custom_batching

        @custom_batching.custom_vmap
        def stage_derivs_all(X, U, lam, mu, params):
            g, Hw, J = jax.vmap(
                lambda n, z, u, l: _raw_stage_derivs(n, z, u, l, mu, params)
            )(ns_range, X, U, lam)
            return g, Hw, J

        @stage_derivs_all.def_vmap
        def _derivs_rule(axis_size, in_batched, *args):
            B = axis_size
            args = jax.tree.map(
                lambda a, b: a if b else jnp.broadcast_to(
                    jnp.asarray(a), (B,) + jnp.shape(a)
                ),
                tuple(args),
                tuple(in_batched),
            )
            X, U, lam, mu, params = args
            pad = (-B) % 1024
            if pad:
                def padb(a):
                    return jnp.concatenate(
                        [a, jnp.broadcast_to(a[-1:], (pad,) + a.shape[1:])], axis=0
                    )

                X, U, lam, mu = map(padb, (X, U, lam, mu))
                params = jax.tree.map(padb, params)
            g, Hw, J = derivs_kernel(X, U, lam, mu, params.curvature, params.ds)
            return (g[:B], Hw[:B], J[:B]), (True, True, True)
    else:
        stage_derivs_all = None

    # -- optional fully-fused Pallas backward pass ----------------------------
    # ``backward_kernel(X, U, lam, mu, rho, curv, ds) -> (kffs, Kfbs, dV1,
    # dV2, fail)`` computes derivatives AND the Riccati sweep in one kernel.
    if backward_kernel is not None:
        from jax import custom_batching

        @custom_batching.custom_vmap
        def fused_backward(X, U, lam, mu, rho, params):
            d = jax.vmap(
                lambda n, z, u, l: stage_derivs(n, z, u, l, mu, params)
            )(ns_range, X, U, lam)
            return riccati_backward(*d, rho, cfg.unroll)

        @fused_backward.def_vmap
        def _fused_rule(axis_size, in_batched, *args):
            B = axis_size
            args = jax.tree.map(
                lambda a, b: a if b else jnp.broadcast_to(
                    jnp.asarray(a), (B,) + jnp.shape(a)
                ),
                tuple(args),
                tuple(in_batched),
            )
            X, U, lam, mu, rho, params = args
            pad = (-B) % 1024
            if pad:
                def padb(a):
                    return jnp.concatenate(
                        [a, jnp.broadcast_to(a[-1:], (pad,) + a.shape[1:])], axis=0
                    )

                X, U, lam, mu, rho = map(padb, (X, U, lam, mu, rho))
                params = jax.tree.map(padb, params)
            kffs, Kfbs, dV1, dV2, fail = backward_kernel(
                X, U, lam, mu, rho, params.curvature, params.ds
            )
            out = (kffs[:B], Kfbs[:B], dV1[:B], dV2[:B], fail[:B])
            return out, (True,) * 5
    else:
        fused_backward = None

    def _raw_stage_derivs(n, z, u, lam_n, mu, params):
        """(g, Hw, J) without the block split (the kernel's output contract)."""
        nz = z.shape[0]
        w = jnp.concatenate([z, u])
        cost_fn = lambda w_: al_cost_w(n, w_, lam_n, mu, params, nz)
        g = jax.grad(cost_fn)(w)
        Hw = jax.jacfwd(jax.grad(cost_fn))(w)
        dyn_fn = lambda w_: fns.dynamics(n, w_[:nz], w_[nz:], params)
        J = jax.jacfwd(dyn_fn)(w)
        return g, Hw, J

    # -- inner iLQR iteration --------------------------------------------------

    def inner_step(state, _, lam, mu, params, z0):
        X, U, cost_al, rho, done, n_acc = state
        nu = U.shape[-1]
        alphas_l = alphas.astype(U.dtype)

        if fused_backward is not None:
            kffs, Kfbs, dV1, dV2, bp_fail = fused_backward(
                X, U, lam, mu, rho, params
            )
            kffs = kffs.astype(U.dtype)
            Kfbs = Kfbs.astype(U.dtype)
        elif stage_derivs_all is not None:
            g, Hw, J = stage_derivs_all(X, U, lam, mu, params)
            g = g.astype(U.dtype)
            Hw = Hw.astype(U.dtype)
            J = J.astype(U.dtype)
            Hw = 0.5 * (Hw + Hw.swapaxes(-1, -2))
            nzd = X.shape[-1]
            derivs = (
                g[:, :nzd],
                g[:, nzd:],
                Hw[:, :nzd, :nzd],
                Hw[:, nzd:, :nzd],
                Hw[:, nzd:, nzd:],
                J[..., :nzd],
                J[..., nzd:],
            )
            kffs, Kfbs, dV1, dV2, bp_fail = backward(derivs, rho, nu)
        else:
            derivs = batched_derivs(ns_range, X, U, lam, mu, params)
            kffs, Kfbs, dV1, dV2, bp_fail = backward(derivs, rho, nu)

        if ls_costs is not None:
            costs = ls_costs(X, U, kffs, Kfbs, lam, mu, params, z0).astype(U.dtype)
            Xc = Uc = None  # selected candidate re-rolled below
        else:
            Xc, Uc, costs = forward_all(
                alphas_l, X, U, kffs, Kfbs, lam, mu, params, z0
            )
        expected = -(alphas_l * dV1 + alphas_l**2 * dV2)
        improvement = cost_al - costs
        # Armijo on the quadratic model — but when the model's predicted
        # decrease exceeds the entire current cost the expansion is garbage
        # (e.g. exponentially amplified sensitivities through a long unstable
        # rollout chain); fall back to accepting plain descent.
        model_sane = expected <= jnp.abs(cost_al) + 1.0
        ok = (~model_sane) | (improvement > cfg.armijo * jnp.maximum(expected, 0.0))
        ok = ok & jnp.isfinite(costs) & (improvement > 0.0) & (~bp_fail)
        any_ok = jnp.any(ok)
        # prefer the largest accepted step (alphas are sorted descending)
        idx = jnp.argmax(ok)

        if ls_costs is not None:
            # kernel computed costs only: re-roll the selected candidate
            Xs, Us, cost_sel = forward(
                alphas_l[idx], X, U, kffs, Kfbs, lam, mu, params, z0
            )
            X_new = jnp.where(any_ok, Xs, X)
            U_new = jnp.where(any_ok, Us, U)
            cost_new = jnp.where(any_ok, cost_sel, cost_al)
        else:
            X_new = jnp.where(any_ok, Xc[idx], X)
            U_new = jnp.where(any_ok, Uc[idx], U)
            cost_new = jnp.where(any_ok, costs[idx], cost_al)
        # Asymmetric LM schedule: climb fast on failure (ill-conditioned
        # problems need rho ~ curvature scale within a few iterations), relax
        # slowly on success.
        rho_new = jnp.where(
            any_ok,
            jnp.maximum(rho / cfg.rho_scale, cfg.rho_min),
            jnp.minimum(jnp.maximum(rho, cfg.rho0) * cfg.rho_scale**2, cfg.rho_max),
        )
        rel_impr = (cost_al - cost_new) / (jnp.abs(cost_al) + 1e-12)
        # Converged only when a (near-)full Newton step yields no progress, or
        # the expected decrease itself is tiny — a small backtracked step with
        # small improvement is NOT convergence, just a hard iteration.
        alpha_sel = alphas_l[idx]
        converged_now = any_ok & (rel_impr < cfg.tol_cost) & (alpha_sel >= 0.99)
        small_grad = (~bp_fail) & (
            -dV1 < cfg.tol_cost * (jnp.abs(cost_al) + 1.0)
        )
        stuck = (~any_ok) & (rho >= cfg.rho_max)
        done_new = done | converged_now | small_grad | stuck

        # freeze once done (results stay, work is still traced — static shape)
        X = jnp.where(done, X, X_new)
        U = jnp.where(done, U, U_new)
        cost_al = jnp.where(done, cost_al, cost_new)
        rho = jnp.where(done, rho, rho_new)
        n_acc = n_acc + jnp.where(done | ~any_ok, 0, 1)
        trace = {
            "cost_al": cost_al,
            "accepted": any_ok & ~done,
            "bp_fail": bp_fail,
            "rho": rho,
            "dV1": dV1,
            "alpha": jnp.where(any_ok, alphas[idx], 0.0),
        }
        return (X, U, cost_al, rho, done_new, n_acc), trace

    # -- full solve -------------------------------------------------------------

    def solve_core(params, z0, U_init, lam):
        mu0 = jnp.asarray(cfg.mu0, dtype=U_init.dtype)

        def outer_step_closed(carry, _):
            X, U, lam, mu, n_acc, rho = carry
            cost_al = total_al_cost(X, U, lam, mu, params)

            def istep(s, __):
                return inner_step(s, __, lam, mu, params, z0)

            # rho persists across outer iterations: the curvature scale the
            # LM schedule discovered does not reset when multipliers update
            init = (X, U, cost_al, rho, jnp.asarray(False), n_acc)
            (X, U, _, rho, _, n_acc), trace = lax.scan(
                istep, init, None, length=cfg.n_inner
            )

            C = jax.vmap(lambda n: fns.constraints(n, X[n], U[n], params))(ns_range)
            lam = jnp.maximum(0.0, lam + mu * C)
            mu = jnp.minimum(mu * cfg.mu_scale, cfg.mu_max)
            return (X, U, lam, mu, n_acc, rho), trace

        if u_lo is not None:
            U_init = jnp.clip(U_init, u_lo, u_hi)
        X0, _ = rollout(fns, params, z0, U_init)
        # A divergent warm-start rollout must not poison the derivatives: with
        # finite (if large) states, the first inner iteration's candidates are
        # finite and any of them beats the +inf incumbent cost.
        X0 = jnp.nan_to_num(X0, nan=0.0, posinf=1e6, neginf=-1e6)
        carry = (
            X0,
            U_init,
            lam,
            mu0,
            jnp.zeros((), jnp.int32),
            jnp.asarray(cfg.rho0, U_init.dtype),
        )
        (X, U, lam, mu, n_acc, rho), trace = lax.scan(
            outer_step_closed, carry, None, length=cfg.n_outer
        )

        if cfg.n_polish > 0:
            # optimize against the FINAL multipliers (see ALILQRConfig),
            # optionally with a boosted penalty (polish_mu_boost)
            mu_p = jnp.minimum(mu * cfg.polish_mu_boost, cfg.mu_max)
            cost_al = total_al_cost(X, U, lam, mu_p, params)

            def pstep(s, __):
                return inner_step(s, __, lam, mu_p, params, z0)

            init = (X, U, cost_al, rho, jnp.asarray(False), n_acc)
            (X, U, _, rho, _, n_acc), _ = lax.scan(
                pstep, init, None, length=cfg.n_polish
            )

        cost, violation = raw_cost_and_violation(X, U, lam, params)
        converged = (violation < cfg.tol_con) & jnp.isfinite(cost)
        sol = Solution(X, U, lam, cost, violation, converged, n_acc)
        if cfg.record_trace:
            return sol, jax.tree.map(lambda a: a.reshape((-1,) + a.shape[2:]), trace)
        return sol

    # -- optional whole-solve Pallas kernel -----------------------------------
    # ``solve_kernel(z0, U_init, lam, curv, ds) -> Solution fields`` runs the
    # full AL-iLQR solve in one kernel launch; spliced under the scenario
    # vmap exactly like the per-phase kernels (XLA path for unbatched use).
    if solve_kernel is not None and cfg.use_solve_kernel:
        assert not cfg.record_trace, "solve kernel has no trace output"
        from jax import custom_batching

        @custom_batching.custom_vmap
        def solve_cv(params, z0, U_init, lam):
            return solve_core(params, z0, U_init, lam)

        @solve_cv.def_vmap
        def _solve_rule(axis_size, in_batched, *args):
            B = axis_size
            args = jax.tree.map(
                lambda a, b: a if b else jnp.broadcast_to(
                    jnp.asarray(a), (B,) + jnp.shape(a)
                ),
                tuple(args),
                tuple(in_batched),
            )
            params, z0, U_init, lam = args
            pad = (-B) % getattr(solve_kernel, "b_tile", 1024)
            if pad:
                def padb(a):
                    return jnp.concatenate(
                        [a, jnp.broadcast_to(a[-1:], (pad,) + a.shape[1:])],
                        axis=0,
                    )

                z0, U_init, lam = map(padb, (z0, U_init, lam))
                params = jax.tree.map(padb, params)
            X, U, lamf, cost, viol, conv, iters = solve_kernel(
                z0, U_init, lam, params.curvature, params.ds
            )
            dt = U_init.dtype
            sol = Solution(
                X[:B].astype(dt),
                U[:B].astype(dt),
                lamf[:B].astype(dt),
                cost[:B].astype(dt),
                viol[:B].astype(dt),
                conv[:B],
                iters[:B],
            )
            return sol, Solution(*(True,) * 7)

        solve_inner = solve_cv
    else:
        solve_inner = solve_core

    def solve(params, z0, U_init, lam_init=None):
        nc_probe = jax.eval_shape(
            lambda: fns.constraints(0, z0, U_init[0], params)
        ).shape[0]
        lam = (
            lam_init
            if lam_init is not None
            else jnp.zeros((H, nc_probe), dtype=U_init.dtype)
        )
        return solve_inner(params, z0, U_init, lam)

    return solve
