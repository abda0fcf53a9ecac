"""Pallas TPU kernel: the ENTIRE AL-iLQR solve in one kernel launch.

Round-1 ran one kernel per phase (fused backward, line-search costs) with
XLA glue between them; the remaining ~half of the step time was kernel-
boundary overhead — HBM round-trips of X/U/lam/gains, tile/untile
relayouts, candidate re-rolls and selection glue, dispatch.  This kernel
keeps the *whole* optimization state in VMEM for the full solve:

    warm rollout -> [ outer AL loop (python-unrolled, static n_outer):
        incumbent AL cost sweep
        -> inner fori (n_inner): fused backward (in-kernel AD + Riccati)
           -> A-candidate line-search rollout (all alphas in one sweep)
           -> Armijo selection (per-lane)
           -> selected-alpha re-roll -> masked accept/copy-back
           -> rho/done/n_acc updates
        -> multiplier update lam += mu c, mu *= scale ]
    -> raw cost + max-violation sweep -> outputs

Trajectories, multipliers and gains live in VMEM scratch for the entire
solve; only (z0, U_init, lam_init, curvature, ds) enter and the Solution
fields leave.  Semantics replicate solvers.al_ilqr.build_solver's
inner_step/outer_step_closed exactly (same Armijo/LM/convergence masks);
parity vs the XLA path is checked on hardware by
scripts/verify_kernels_tpu.py (interpret mode is impractically slow for
in-kernel AD, see tests/test_backward_kernel.py).

Generic over any :class:`solvers.fm_family.FMFamily` with NU == 2.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vehicle_control_tpu.solvers import fm_family

# Tile shape.  The kernel is issue-bound, not op-bound (measured ~6-7 VPU
# cycles per (8, 128) tile-op: the tiny-minor-dim ops can't fill the
# pipeline), so widening the sublane dim packs 2-4x more scenarios into
# each op node at the same op count — FM_SUB=16/32 processes 2048/4096
# scenarios per kernel instance.  Default 8 = one (8, 128) vreg per op.
import os as _os

SUB = int(_os.environ.get("FM_SUB", "8"))
LANE = 128
B_TILE = SUB * LANE

# Loop-primitive indirection: the kernel body calls these instead of
# jax.lax.* directly so tests/test_solve_kernel_flow.py can swap in eager
# Python loops and execute the ENTIRE kernel body on concrete CPU arrays
# (numpy-backed fake refs) — numerically verifying the 600-line control flow
# (Armijo ladder, accept/copy-back masks, early-exit, multiplier updates)
# against the XLA solver without Mosaic or interpret mode.
_fori_loop = jax.lax.fori_loop
_while_loop = jax.lax.while_loop


def _nan_to_num(x):
    """jnp.nan_to_num(x, nan=0, posinf=1e6, neginf=-1e6) without the
    convenience wrapper (explicit compares lower cleanly in Mosaic)."""
    x = jnp.where(jnp.isnan(x), 0.0, x)
    x = jnp.where(x == jnp.inf, 1e6, x)
    return jnp.where(x == -jnp.inf, -1e6, x)


def build_solve_kernel_fm(family, cfg):
    """Returns ``run(z0, U_init, lam_init, curv, ds, interpret=False) ->
    (X (B,H,NZ), U (B,H,NU), lam (B,H,NC), cost (B,), violation (B,),
    converged (B,), iterations (B,))`` — one fused solve per scenario lane.

    ``cfg`` is the ALILQRConfig whose schedule constants are baked in as
    float literals.
    """
    NZ, NU, NC, H = family.NZ, family.NU, family.NC, family.H
    NW = NZ + NU
    assert NU == 2, "closed-form Quu solve is specialized to 2 controls"
    A = cfg.n_alpha
    alphas = [
        float(cfg.alpha_min ** (i / (cfg.n_alpha - 1))) for i in range(A)
    ]
    n_outer, n_inner = int(cfg.n_outer), int(cfg.n_inner)
    n_polish = int(cfg.n_polish)
    polish_boost = float(getattr(cfg, "polish_mu_boost", 1.0))
    early_exit = bool(getattr(cfg, "early_exit", True))
    ls_fast_path = bool(getattr(cfg, "ls_fast_path", False))
    # static stage segments (fm_family.Seg): loop the horizon one segment at
    # a time so stage-switched physics (cascaded st/seam/tail) specializes at
    # trace time instead of computing every branch masked.  (None,) => the
    # original single fori over [0, H) with the generic closures.
    SEGS = family.segments if family.segments else (None,)

    def _kw(seg):
        return {} if seg is None else {"seg": seg}

    def staged_fori(make_body, carry, reverse=False):
        """Run ``make_body(seg)`` as a fori body over each segment in stage
        order (or reversed).  Reverse bodies receive the loop counter ``i``
        with ``n = H - 1 - i`` exactly like the original full-range loop."""
        segs = tuple(reversed(SEGS)) if reverse else SEGS
        for seg in segs:
            lo, hi = (0, H) if seg is None else (seg.lo, seg.hi)
            if reverse:
                lo, hi = H - hi, H - lo
            carry = _fori_loop(lo, hi, make_body(seg), carry)
        return carry
    armijo = float(cfg.armijo)
    tol_cost, tol_con = float(cfg.tol_cost), float(cfg.tol_con)
    mu0, mu_scale, mu_max = float(cfg.mu0), float(cfg.mu_scale), float(cfg.mu_max)
    rho0, rho_scale = float(cfg.rho0), float(cfg.rho_scale)
    rho_min, rho_max = float(cfg.rho_min), float(cfg.rho_max)

    def kernel(
        z0_ref,  # (1, NZ, 8, 128)
        u0_ref,  # (1, H, NU, 8, 128)
        lam0_ref,  # (1, H, NC, 8, 128)
        curv_ref,  # (1, H, 8, 128)
        ds_ref,  # (1, H, 8, 128)
        x_out,  # (1, H, NZ, 8, 128)
        u_out,  # (1, H, NU, 8, 128)
        lam_out,  # (1, H, NC, 8, 128)
        cost_out,  # (1, 1, 8, 128)
        viol_out,  # (1, 1, 8, 128)
        conv_out,  # (1, 1, 8, 128)
        iters_out,  # (1, 1, 8, 128)
        X_s,  # scratch (H, NZ, 8, 128)
        U_s,  # scratch (H, NU, 8, 128)
        lam_s,  # scratch (H, NC, 8, 128)
        kff_s,  # scratch (H, NU, 8, 128)
        kfb_s,  # scratch (H, NU, NZ, 8, 128)
    ):
        ones = jnp.ones((SUB, LANE), jnp.float32)
        zeros = jnp.zeros((SUB, LANE), jnp.float32)
        ds_read = lambda i: ds_ref[0, i]

        # ---- init: clamp U, copy lam, warm rollout --------------------------
        def init_make(seg):
            def body(n, c):
                for j in range(NU):
                    lo, hi = family.u_box(n, j, **_kw(seg))
                    U_s[n, j] = jnp.clip(u0_ref[0, n, j], lo, hi)
                for j in range(NC):
                    lam_s[n, j] = lam0_ref[0, n, j]
                return c

            return body

        staged_fori(init_make, 0.0)

        def roll_make(seg):
            def body(n, z):
                for i in range(NZ):
                    X_s[n, i] = _nan_to_num(z[i])
                wf = z + tuple(U_s[n, j] for j in range(NU))
                z2 = family.dyn(n, wf, curv_ref[0, n], ds_read, **_kw(seg))
                return tuple(z2)

            return body

        staged_fori(roll_make, tuple(z0_ref[0, i] for i in range(NZ)))

        # ---- helpers --------------------------------------------------------

        def al_cost_at(n, wf, mu, seg=None):
            return family.al_cost(
                n, wf, lambda j: lam_s[n, j], mu, curv_ref[0, n], ds_read,
                **_kw(seg),
            )

        def total_al_cost(mu):
            def make(seg):
                def body(n, acc):
                    wf = tuple(X_s[n, i] for i in range(NZ)) + tuple(
                        U_s[n, j] for j in range(NU)
                    )
                    return acc + al_cost_at(n, wf, mu, seg)

                return body

            return staged_fori(make, zeros)

        def backward(mu, rho):
            """Fused in-kernel derivatives + Riccati; writes kff_s/kfb_s.

            Identical math to backward_kernel_fm (same family closures)."""

            def stage_derivs(n, seg):
                kv = curv_ref[0, n]
                lam = [lam_s[n, j] for j in range(NC)]
                wf = tuple(X_s[n, i] for i in range(NZ)) + tuple(
                    U_s[n, j] for j in range(NU)
                )
                g, Hcols, Jcols = fm_family.stage_derivs_cols(
                    family, n, wf, lam, mu, kv, ds_read, seg=seg
                )
                Hs = [
                    [0.5 * (Hcols[c][r] + Hcols[r][c]) for c in range(NW)]
                    for r in range(NW)
                ]
                Am = [[Jcols[c][r] for c in range(NZ)] for r in range(NZ)]
                Bm = [[Jcols[NZ + j][r] for j in range(NU)] for r in range(NZ)]
                return g, Hs, Am, Bm

            def body(i, carry, seg):
                n = H - 1 - i
                Vx = list(carry[0])
                Vxx = [list(row) for row in carry[1]]
                dV1, dV2, fail = carry[2], carry[3], carry[4]
                g, Hs, Am, Bm = stage_derivs(n, seg)
                Qx = [
                    g[r] + sum(Am[k][r] * Vx[k] for k in range(NZ))
                    for r in range(NZ)
                ]
                Qu = [
                    g[NZ + j] + sum(Bm[k][j] * Vx[k] for k in range(NZ))
                    for j in range(NU)
                ]
                VxxA = [
                    [
                        sum(Vxx[r][k] * Am[k][c] for k in range(NZ))
                        for c in range(NZ)
                    ]
                    for r in range(NZ)
                ]
                VxxB = [
                    [
                        sum(Vxx[r][k] * Bm[k][j] for k in range(NZ))
                        for j in range(NU)
                    ]
                    for r in range(NZ)
                ]
                Qxx = [
                    [
                        Hs[r][c] + sum(Am[k][r] * VxxA[k][c] for k in range(NZ))
                        for c in range(NZ)
                    ]
                    for r in range(NZ)
                ]
                Qux = [
                    [
                        Hs[NZ + j][c]
                        + sum(Bm[k][j] * VxxA[k][c] for k in range(NZ))
                        for c in range(NZ)
                    ]
                    for j in range(NU)
                ]
                Quu = [
                    [
                        Hs[NZ + j][NZ + l]
                        + sum(Bm[k][j] * VxxB[k][l] for k in range(NZ))
                        for l in range(NU)
                    ]
                    for j in range(NU)
                ]
                a = Quu[0][0] + rho
                b = 0.5 * (Quu[0][1] + Quu[1][0])
                d = Quu[1][1] + rho
                det = a * d - b * b
                bad = (a <= 0.0) | (det <= 0.0)
                inv_det = jnp.where(bad, 1.0, 1.0 / jnp.where(bad, 1.0, det))

                def solve2(r0, r1):
                    return (
                        (d * r0 - b * r1) * inv_det,
                        (a * r1 - b * r0) * inv_det,
                    )

                k0, k1 = solve2(-Qu[0], -Qu[1])
                Kfb = [[None] * NZ, [None] * NZ]
                for c in range(NZ):
                    K0, K1 = solve2(-Qux[0][c], -Qux[1][c])
                    Kfb[0][c] = K0
                    Kfb[1][c] = K1
                kff_s[n, 0] = k0
                kff_s[n, 1] = k1
                for c in range(NZ):
                    kfb_s[n, 0, c] = Kfb[0][c]
                    kfb_s[n, 1, c] = Kfb[1][c]
                Quu_r = [[a, b], [b, d]]
                Quuk = [
                    Quu_r[0][0] * k0 + Quu_r[0][1] * k1,
                    Quu_r[1][0] * k0 + Quu_r[1][1] * k1,
                ]
                QuuK = [
                    [
                        Quu_r[j][0] * Kfb[0][c] + Quu_r[j][1] * Kfb[1][c]
                        for c in range(NZ)
                    ]
                    for j in range(NU)
                ]
                Vx_n = [
                    Qx[c]
                    + Kfb[0][c] * (Quuk[0] + Qu[0])
                    + Kfb[1][c] * (Quuk[1] + Qu[1])
                    + Qux[0][c] * k0
                    + Qux[1][c] * k1
                    for c in range(NZ)
                ]
                Vxx_n = [
                    [
                        Qxx[r][c]
                        + Kfb[0][r] * QuuK[0][c]
                        + Kfb[1][r] * QuuK[1][c]
                        + Kfb[0][r] * Qux[0][c]
                        + Kfb[1][r] * Qux[1][c]
                        + Qux[0][r] * Kfb[0][c]
                        + Qux[1][r] * Kfb[1][c]
                        for c in range(NZ)
                    ]
                    for r in range(NZ)
                ]
                Vxx_sym = [
                    [
                        0.5 * (Vxx_n[r][c] + Vxx_n[c][r])
                        for c in range(NZ)
                    ]
                    for r in range(NZ)
                ]
                return (
                    tuple(Vx_n),
                    tuple(tuple(row) for row in Vxx_sym),
                    dV1 + k0 * Qu[0] + k1 * Qu[1],
                    dV2 + 0.5 * (k0 * Quuk[0] + k1 * Quuk[1]),
                    jnp.maximum(fail, bad.astype(jnp.float32)),
                )

            init = (
                tuple(zeros for _ in range(NZ)),
                tuple(tuple(zeros for _ in range(NZ)) for _ in range(NZ)),
                zeros,
                zeros,
                zeros,
            )
            _, _, dV1, dV2, fail = staged_fori(
                lambda seg: (lambda i, c: body(i, c, seg)), init, reverse=True
            )
            return dV1, dV2, fail

        def linesearch_costs(mu, alpha_list=None):
            """Candidate rollouts in one sweep over ``alpha_list`` (default
            the full ladder); returns one cost tile per candidate (inf where
            a rollout diverged)."""
            als = alphas if alpha_list is None else alpha_list
            nA = len(als)

            def make(seg):
                def body(n, carry):
                    zs = [list(carry[a * NZ : (a + 1) * NZ]) for a in range(nA)]
                    accs = list(carry[nA * NZ :])
                    xref = [X_s[n, i] for i in range(NZ)]
                    uref = [U_s[n, j] for j in range(NU)]
                    kff = [kff_s[n, j] for j in range(NU)]
                    kfb = [[kfb_s[n, j, i] for i in range(NZ)] for j in range(NU)]
                    kv = curv_ref[0, n]
                    boxes = [family.u_box(n, j, **_kw(seg)) for j in range(NU)]
                    out = []
                    for a in range(nA):
                        z = zs[a]
                        dz = [z[i] - xref[i] for i in range(NZ)]
                        u = []
                        for j in range(NU):
                            fb = dz[0] * kfb[j][0]
                            for i in range(1, NZ):
                                fb += dz[i] * kfb[j][i]
                            uj = uref[j] + als[a] * kff[j] + fb
                            lo, hi = boxes[j]
                            u.append(jnp.clip(uj, lo, hi))
                        wf = tuple(z) + tuple(u)
                        c = al_cost_at(n, wf, mu, seg)
                        z2 = family.dyn(n, wf, kv, ds_read, **_kw(seg))
                        finite = ones > 0.0
                        for f in z2:
                            finite &= jnp.isfinite(f) & (jnp.abs(f) < 1e7)
                        accs[a] = jnp.where(finite, accs[a] + c, jnp.inf)
                        out.extend(z2)
                    return tuple(out) + tuple(accs)

                return body

            init = tuple(
                z0_ref[0, i] for _ in range(nA) for i in range(NZ)
            ) + tuple(zeros for _ in range(nA))
            res = staged_fori(make, init)
            accs = res[nA * NZ :]
            return [jnp.where(jnp.isfinite(a_), a_, jnp.inf) for a_ in accs]

        def reroll_accept(alpha_sel, upd):
            """Roll the per-lane selected step and write it into X_s/U_s on
            lanes where ``upd`` (float mask), in place.

            The accepted cost is NOT recomputed here: the candidate sweep
            already accumulated the identical per-stage sequence, so the
            caller selects it from ``costs`` by alpha.  In-place is safe:
            stage n reads X_s[n] (old) before overwriting it, and later
            stages only read their own rows.
            """

            def make(seg):
                def body(n, z):
                    dz = [z[i] - X_s[n, i] for i in range(NZ)]
                    u = []
                    for j in range(NU):
                        fb = dz[0] * kfb_s[n, j, 0]
                        for i in range(1, NZ):
                            fb += dz[i] * kfb_s[n, j, i]
                        uj = U_s[n, j] + alpha_sel * kff_s[n, j] + fb
                        lo, hi = family.u_box(n, j, **_kw(seg))
                        u.append(jnp.clip(uj, lo, hi))
                    wf = tuple(z) + tuple(u)
                    z2 = family.dyn(n, wf, curv_ref[0, n], ds_read, **_kw(seg))
                    for i in range(NZ):
                        X_s[n, i] = jnp.where(upd > 0.5, z[i], X_s[n, i])
                    for j in range(NU):
                        U_s[n, j] = jnp.where(upd > 0.5, u[j], U_s[n, j])
                    return tuple(z2)

                return body

            staged_fori(make, tuple(z0_ref[0, i] for i in range(NZ)))

        # ---- outer AL loop (static unroll) ----------------------------------
        n_acc = zeros
        rho = jnp.full((SUB, LANE), rho0, jnp.float32)
        mu_val = mu0

        def run_inner(mu, rho, n_acc, length):
            cost_al = total_al_cost(mu)
            done = zeros

            def _armijo_ok(al, cost_a, cost_al, dV1, dV2, bp_fail):
                expected = -(al * dV1 + al * al * dV2)
                improvement = cost_al - cost_a
                model_sane = expected <= jnp.abs(cost_al) + 1.0
                ok = (~model_sane) | (
                    improvement > armijo * jnp.maximum(expected, 0.0)
                )
                return (
                    ok
                    & jnp.isfinite(cost_a)
                    & (improvement > 0.0)
                    & (bp_fail < 0.5)
                )

            def inner_body(carry):
                cost_al, rho, done, n_acc = carry
                dV1, dV2, bp_fail = backward(mu, rho)
                if ls_fast_path and A > 1:
                    # Warm steady state accepts the full Newton step almost
                    # always; sweep ONLY alpha=1 first and run the remaining
                    # ladder iff some live lane rejected it.  When the ladder
                    # is skipped, no live lane could have selected a smaller
                    # alpha (its costs are never read), so the skip is
                    # bitwise-identical — the early-exit argument applied
                    # within one iteration.
                    cost0 = linesearch_costs(mu, alphas[:1])[0]
                    ok0 = _armijo_ok(
                        alphas[0], cost0, cost_al, dV1, dV2, bp_fail
                    )
                    need = (
                        jnp.sum(((~ok0) & (done < 0.5)).astype(jnp.float32))
                        > 0.0
                    )
                    rest = jax.lax.cond(
                        need,
                        lambda: tuple(linesearch_costs(mu, alphas[1:])),
                        lambda: tuple(
                            jnp.full((SUB, LANE), jnp.inf, jnp.float32)
                            for _ in alphas[1:]
                        ),
                    )
                    costs = [cost0, *rest]
                else:
                    costs = linesearch_costs(mu)
                # Armijo selection over the descending alpha ladder
                alpha_sel = jnp.full((SUB, LANE), alphas[0], jnp.float32)
                found = zeros > 1.0
                for a in range(A):
                    ok = _armijo_ok(
                        alphas[a], costs[a], cost_al, dV1, dV2, bp_fail
                    )
                    alpha_sel = jnp.where(ok & ~found, alphas[a], alpha_sel)
                    found = found | ok
                any_ok = found
                # accepted cost = the selected candidate's sweep accumulator
                # (identical op sequence to a re-roll, so bitwise the same)
                cost_sel = costs[0]
                for a in range(1, A):
                    cost_sel = jnp.where(
                        alpha_sel == alphas[a], costs[a], cost_sel
                    )
                upd = (any_ok & (done < 0.5)).astype(jnp.float32)
                reroll_accept(alpha_sel, upd)
                cost_new = jnp.where(any_ok, cost_sel, cost_al)
                rho_new = jnp.where(
                    any_ok,
                    jnp.maximum(rho / rho_scale, rho_min),
                    jnp.minimum(
                        jnp.maximum(rho, rho0) * rho_scale * rho_scale, rho_max
                    ),
                )
                rel_impr = (cost_al - cost_new) / (jnp.abs(cost_al) + 1e-12)
                converged_now = (
                    any_ok & (rel_impr < tol_cost) & (alpha_sel >= 0.99)
                )
                small_grad = (bp_fail < 0.5) & (
                    -dV1 < tol_cost * (jnp.abs(cost_al) + 1.0)
                )
                stuck = (~any_ok) & (rho >= rho_max)
                done_new = jnp.maximum(
                    done,
                    (converged_now | small_grad | stuck).astype(jnp.float32),
                )
                was_done = done > 0.5
                cost_al = jnp.where(was_done, cost_al, cost_new)
                rho = jnp.where(was_done, rho, rho_new)
                n_acc = n_acc + jnp.where(was_done | ~any_ok, 0.0, 1.0)
                return (cost_al, rho, done_new, n_acc)

            if early_exit:
                # Iterations after every lane in the tile is done are exact
                # no-ops (all updates are masked by was_done); skipping them
                # is bitwise-identical and skips the dominant per-iteration
                # work in warm steady state.
                def cond(c):
                    it, _, _, done, _ = c
                    return (it < length) & (
                        jnp.sum(done) < float(SUB * LANE)
                    )

                def wbody(c):
                    it, cost_al, rho, done, n_acc = c
                    cost_al, rho, done, n_acc = inner_body(
                        (cost_al, rho, done, n_acc)
                    )
                    return (it + 1, cost_al, rho, done, n_acc)

                _, cost_al, rho, done, n_acc = _while_loop(
                    cond,
                    wbody,
                    (jnp.asarray(0, jnp.int32), cost_al, rho, done, n_acc),
                )
            else:
                cost_al, rho, done, n_acc = _fori_loop(
                    0,
                    length,
                    lambda _it, c: inner_body(c),
                    (cost_al, rho, done, n_acc),
                )
            return rho, n_acc

        for _outer in range(n_outer):
            mu = jnp.full((SUB, LANE), mu_val, jnp.float32)
            rho, n_acc = run_inner(mu, rho, n_acc, n_inner)

            # multiplier update (uses this outer iteration's mu)
            def lam_make(seg):
                def body(n, c):
                    wf = tuple(X_s[n, i] for i in range(NZ)) + tuple(
                        U_s[n, j] for j in range(NU)
                    )
                    cons = family.constraints(n, wf, **_kw(seg))
                    for j in range(NC):
                        lam_s[n, j] = jnp.maximum(
                            0.0, lam_s[n, j] + mu * cons[j]
                        )
                    return c

                return body

            staged_fori(lam_make, 0.0)
            mu_val = min(mu_val * mu_scale, mu_max)

        if n_polish > 0:
            # optimize against the FINAL multipliers (ALILQRConfig.n_polish),
            # optionally with a boosted penalty (polish_mu_boost)
            mu = jnp.full(
                (SUB, LANE), min(mu_val * polish_boost, mu_max), jnp.float32
            )
            rho, n_acc = run_inner(mu, rho, n_acc, n_polish)

        # ---- finalize: raw cost, violation, outputs -------------------------
        def final_make(seg):
            def body(n, carry):
                cost, viol = carry
                wf = tuple(X_s[n, i] for i in range(NZ)) + tuple(
                    U_s[n, j] for j in range(NU)
                )
                cost = cost + family.stage_cost(
                    n, wf, curv_ref[0, n], ds_read, **_kw(seg)
                )
                cons = family.constraints(n, wf, **_kw(seg))
                for j in range(NC):
                    viol = jnp.maximum(viol, cons[j])
                for i in range(NZ):
                    x_out[0, n, i] = X_s[n, i]
                for j in range(NU):
                    u_out[0, n, j] = U_s[n, j]
                for j in range(NC):
                    lam_out[0, n, j] = lam_s[n, j]
                return cost, viol

            return body

        cost, viol = staged_fori(final_make, (zeros, zeros))
        viol = jnp.maximum(viol, 0.0)
        cost_out[0, 0] = cost
        viol_out[0, 0] = viol
        conv_out[0, 0] = (
            (viol < tol_con) & jnp.isfinite(cost)
        ).astype(jnp.float32)
        iters_out[0, 0] = n_acc

    # ---- host wrapper -------------------------------------------------------

    def tile(a, nb):
        rest = a.shape[1:]
        a = a.reshape((nb, SUB, LANE) + rest)
        return jnp.moveaxis(a, (1, 2), (-2, -1))

    def untile(a, B):
        a = jnp.moveaxis(a, (-2, -1), (1, 2))
        return a.reshape((B,) + a.shape[3:])

    def run(z0, U_init, lam_init, curv, ds, interpret=False):
        B = z0.shape[0]
        assert B % B_TILE == 0, f"batch {B} must be a multiple of {B_TILE}"
        nb = B // B_TILE
        f32 = jnp.float32
        inputs = [
            tile(z0.astype(f32), nb),
            tile(U_init.astype(f32), nb),
            tile(lam_init.astype(f32), nb),
            tile(curv.astype(f32), nb),
            tile(ds.astype(f32), nb),
        ]

        def in_spec(x):
            blk = (1,) + x.shape[1:]
            nd = len(blk)
            return pl.BlockSpec(
                blk, lambda b, nd=nd: (b,) + (0,) * (nd - 1),
                memory_space=pltpu.VMEM,
            )

        out_shapes = [
            (nb, H, NZ, SUB, LANE),
            (nb, H, NU, SUB, LANE),
            (nb, H, NC, SUB, LANE),
            (nb, 1, SUB, LANE),
            (nb, 1, SUB, LANE),
            (nb, 1, SUB, LANE),
            (nb, 1, SUB, LANE),
        ]

        def out_spec(shape):
            blk = (1,) + shape[1:]
            nd = len(blk)
            return pl.BlockSpec(
                blk, lambda b, nd=nd: (b,) + (0,) * (nd - 1),
                memory_space=pltpu.VMEM,
            )

        scratch = [
            pltpu.VMEM((H, NZ, SUB, LANE), f32),
            pltpu.VMEM((H, NU, SUB, LANE), f32),
            pltpu.VMEM((H, NC, SUB, LANE), f32),
            pltpu.VMEM((H, NU, SUB, LANE), f32),
            pltpu.VMEM((H, NU, NZ, SUB, LANE), f32),
        ]
        X, U, lam, cost, viol, conv, iters = pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[in_spec(x) for x in inputs],
            out_specs=[out_spec(s) for s in out_shapes],
            out_shape=[jax.ShapeDtypeStruct(s, f32) for s in out_shapes],
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024
            ),
            interpret=interpret,
        )(*inputs)
        return (
            untile(X, B),
            untile(U, B),
            untile(lam, B),
            untile(cost, B)[:, 0],
            untile(viol, B)[:, 0],
            untile(conv, B)[:, 0] > 0.5,
            untile(iters, B)[:, 0].astype(jnp.int32),
        )

    # Expose the raw kernel body + layout helpers for the eager control-flow
    # test (tests/test_solve_kernel_flow.py): it builds numpy-backed fake
    # refs with these shapes, patches _fori_loop/_while_loop with Python
    # loops, and runs `kernel` on concrete arrays.
    run.kernel = kernel
    run.tile = tile
    run.untile = untile
    run.b_tile = B_TILE
    run.dims = dict(NZ=NZ, NU=NU, NC=NC, H=H)
    run.scratch_shapes = [
        (H, NZ, SUB, LANE),
        (H, NU, SUB, LANE),
        (H, NC, SUB, LANE),
        (H, NU, SUB, LANE),
        (H, NU, NZ, SUB, LANE),
    ]
    return run
