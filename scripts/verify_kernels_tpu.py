"""Kernel <-> XLA parity on real TPU hardware.

Interpret-mode Pallas emulation of the fused kernels is impractically slow
on CPU (the in-kernel AD unrolls thousands of ops), so CI covers the shared
family closures (tests/test_fm_family.py) and this script covers the Mosaic
lowering itself: for each problem family it runs one batched tile through
the fused backward kernel and the line-search kernel on the TPU and checks
the results against the solver's XLA path.

Run on TPU:  python scripts/verify_kernels_tpu.py  (one process at a time —
the tunnel deadlocks on concurrent TPU clients).  Exit code 0 = parity.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

from vehicle_control_tpu.controllers.mpc import problems
from vehicle_control_tpu.controllers.mpc.controllers import initial_carry
from vehicle_control_tpu.environment.track import Track
from vehicle_control_tpu.solvers.al_ilqr import _al_penalty, rollout
from vehicle_control_tpu.solvers.backward_kernel_fm import build_backward_kernel_fm
from vehicle_control_tpu.solvers.fm_family import build_cascaded_family, build_kinematic_family
from vehicle_control_tpu.solvers.riccati import riccati_backward
from vehicle_control_tpu.solvers.rollout_kernel_fm import build_linesearch_kernel_fm
from vehicle_control_tpu.utils.config import load_config, project_root

B = 1024


def _data(prob, seed=0):
    rng = np.random.default_rng(seed)
    H, nz, nu, nc = prob.horizon, prob.nz, prob.nu, prob.nc
    ns = prob.ns_model
    z0 = np.zeros((B, nz - 2), np.float32)
    z0[:, 0] = 5.0 + rng.uniform(0, 8, B)
    z0[:, 2 if ns == 6 else 4] = rng.uniform(0, 250, B)
    U = (rng.normal(size=(B, H, nu)) * 0.05).astype(np.float32)
    c0 = initial_carry(prob, jnp.float32)
    pv, zv = jax.vmap(prob.init_horizon, in_axes=(0, None, None))(
        jnp.asarray(z0), c0.X_pred, c0.U_pred
    )
    X = jax.vmap(lambda p_, z_, u_: rollout(prob.fns, p_, z_, u_)[0])(
        pv, zv, jnp.asarray(U)
    )
    lam = np.abs(rng.normal(size=(B, H, nc)) * 0.1).astype(np.float32)
    mu = np.full((B,), 10.0, np.float32)
    rho = np.full((B,), 1e-4, np.float32)
    kff = (rng.normal(size=(B, H, nu)) * 0.02).astype(np.float32)
    Kfb = (rng.normal(size=(B, H, nu, nz)) * 0.01).astype(np.float32)
    return X, jnp.asarray(U), jnp.asarray(lam), jnp.asarray(mu), jnp.asarray(rho), pv, zv, jnp.asarray(kff), jnp.asarray(Kfb)


def xla_backward(prob, X, U, lam, mu, rho, pv):
    fns = prob.fns
    H, nz = prob.horizon, prob.nz
    ns = jnp.arange(H)

    def stage_derivs(n, z, u, lam_n, m, params):
        w = jnp.concatenate([z, u])
        cost_fn = lambda ww: (
            fns.stage_cost(n, ww[:nz], ww[nz:], params)
            + _al_penalty(fns.constraints(n, ww[:nz], ww[nz:], params), lam_n, m)
        )
        g = jax.grad(cost_fn)(w)
        Hw = jax.jacfwd(jax.grad(cost_fn))(w)
        Hw = 0.5 * (Hw + Hw.T)
        J = jax.jacfwd(lambda ww: fns.dynamics(n, ww[:nz], ww[nz:], params))(w)
        return (
            g[:nz], g[nz:], Hw[:nz, :nz], Hw[nz:, :nz], Hw[nz:, nz:],
            J[:, :nz], J[:, nz:],
        )

    def one(X1, U1, lam1, mu1, rho1, pv1):
        d = jax.vmap(lambda n, z, u, l: stage_derivs(n, z, u, l, mu1, pv1))(ns, X1, U1, lam1)
        return riccati_backward(*d, rho1, 1)

    return jax.jit(jax.vmap(one))(X, U, lam, mu, rho, pv)


def xla_ls_costs(prob, alphas, X, U, kff, Kfb, lam, mu, pv, zv):
    fns = prob.fns
    H = prob.horizon

    def fwd_one(alpha, Xr, Ur, kf, Kf, lm, m, pp, zz):
        def fstep(carry, n):
            z, acc = carry
            u = jnp.clip(
                Ur[n] + alpha * kf[n] + Kf[n] @ (z - Xr[n]), prob.u_lo[n], prob.u_hi[n]
            )
            c = fns.stage_cost(n, z, u, pp) + _al_penalty(
                fns.constraints(n, z, u, pp), lm[n], m
            )
            return (fns.dynamics(n, z, u, pp), acc + c), None
        (zH, tot), _ = jax.lax.scan(fstep, (zz, jnp.zeros((), jnp.float32)), jnp.arange(H))
        return tot

    f = jax.vmap(jax.vmap(fwd_one, in_axes=(0,) + (None,) * 8), in_axes=(None,) + (0,) * 8)
    return jax.jit(f)(alphas, X, U, kff, Kfb, lam, mu, pv, zv)


def check_family(name, prob, fam):
    """Per-phase kernel parity.

    Gains through near-singular Quu amplify f32 accumulation-order noise
    (kernel sums fields in a different order than XLA), so raw-gain parity
    is judged by median + p99 relative deviation on non-failed lanes; the
    behavioral gate is the whole-solve comparison (check_solve_kernel),
    where all families agree to ~1e-6 in final actions."""
    X, U, lam, mu, rho, pv, zv, kff, Kfb = _data(prob)
    run_bw = build_backward_kernel_fm(fam)
    kff_k, Kfb_k, dV1_k, dV2_k, fail_k = jax.jit(
        lambda *a: run_bw(*a)
    )(X, U, lam, mu, rho, pv.curvature, pv.ds)
    kff_r, Kfb_r, dV1_r, dV2_r, fail_r = xla_backward(prob, X, U, lam, mu, rho, pv)
    ok = ~np.asarray(fail_r)
    agree_fail = (np.asarray(fail_k) == np.asarray(fail_r)).mean()
    rel_kff = np.abs(np.asarray(kff_k)[ok] - np.asarray(kff_r)[ok]) / (
        1.0 + np.abs(np.asarray(kff_r)[ok])
    )
    rel_Kfb = np.abs(np.asarray(Kfb_k)[ok] - np.asarray(Kfb_r)[ok]) / (
        1.0 + np.abs(np.asarray(Kfb_r)[ok])
    )
    med_kff, p99_kff = np.median(rel_kff), np.percentile(rel_kff, 99)
    med_Kfb, p99_Kfb = np.median(rel_Kfb), np.percentile(rel_Kfb, 99)
    print(
        f"[{name}] backward: fail-agree {agree_fail:.4f}  "
        f"rel|dkff| med {med_kff:.2e} p99 {p99_kff:.2e}  "
        f"rel|dKfb| med {med_Kfb:.2e} p99 {p99_Kfb:.2e}"
    )
    ok_bw = (
        agree_fail > 0.97
        and med_kff < 1e-3
        and med_Kfb < 1e-3
        and p99_kff < 0.2
        and p99_Kfb < 0.2
    )

    alphas = jnp.asarray([1.0, 0.373, 0.139, 0.019], jnp.float32)
    run_ls = build_linesearch_kernel_fm(fam, alphas)
    costs_k = jax.jit(lambda *a: run_ls(*a))(
        X, U, kff, Kfb, lam, mu, pv.curvature, pv.ds, zv
    )  # (A, B)
    costs_r = xla_ls_costs(prob, alphas, X, U, kff, Kfb, lam, mu, pv, zv)  # (B, A)
    ck, cr = np.asarray(costs_k).T, np.asarray(costs_r)
    finite = np.isfinite(cr) & np.isfinite(ck)
    rel = np.abs(ck[finite] - cr[finite]) / (1.0 + np.abs(cr[finite]))
    med_ls, p99_ls = np.median(rel), np.percentile(rel, 99)
    inf_agree = ((~np.isfinite(ck)) == (~np.isfinite(cr))).mean()
    print(
        f"[{name}] linesearch: rel|dcost| med {med_ls:.2e} p99 {p99_ls:.2e}  "
        f"inf-agree {inf_agree:.4f}  finite {finite.mean():.3f}"
    )
    ok_ls = med_ls < 1e-4 and p99_ls < 5e-2 and inf_agree > 0.99
    return ok_bw and ok_ls


def check_solve_kernel(name, prob, fam, n_outer=2, n_inner=6):
    """Whole-solve fused kernel vs the XLA solve on one batched tile."""
    from vehicle_control_tpu.solvers import ALILQRConfig, build_solver
    from vehicle_control_tpu.solvers.solve_kernel_fm import build_solve_kernel_fm

    # VERIFY_LS_FAST=1 exercises the alpha=1 fast path (cond-gated ladder)
    fast = bool(int(os.environ.get("VERIFY_LS_FAST", "0")))
    cfg = ALILQRConfig(n_outer=n_outer, n_inner=n_inner, ls_fast_path=fast)
    X, U, lam, mu, rho, pv, zv, _, _ = _data(prob)
    solve = build_solver(prob.fns, prob.horizon, cfg, prob.u_lo, prob.u_hi)
    sol_ref = jax.jit(jax.vmap(solve))(pv, zv, U, lam)
    run = build_solve_kernel_fm(fam, cfg)
    Xk, Uk, lamk, cost, viol, conv, iters = jax.jit(lambda *a: run(*a))(
        zv, U, lam, pv.curvature, pv.ds
    )
    conv_ref = float(jnp.mean(sol_ref.converged.astype(jnp.float32)))
    conv_k = float(jnp.mean(conv.astype(jnp.float32)))
    # line-search ties can break differently in f32 kernel arithmetic;
    # compare solution quality, not per-lane bit patterns
    u0_ref = np.asarray(sol_ref.U[:, 0, :])
    u0_k = np.asarray(Uk[:, 0, :])
    both = np.asarray(sol_ref.converged) & np.asarray(conv)
    du0 = np.abs(u0_k[both] - u0_ref[both])
    rel = np.median(du0 / (1.0 + np.abs(u0_ref[both])), axis=0)
    cost_rel = np.median(
        np.abs(np.asarray(cost)[both] - np.asarray(sol_ref.cost)[both])
        / (1.0 + np.abs(np.asarray(sol_ref.cost)[both]))
    )
    print(
        f"[{name}] solve-kernel: conv {conv_k:.4f} (xla {conv_ref:.4f})  "
        f"median rel|du0| {rel}  median rel|dcost| {cost_rel:.2e}"
    )
    return conv_k >= conv_ref - 0.02 and cost_rel < 5e-2


def main():
    root = project_root()
    track = Track(load_config(os.path.join(root, "configs/environment/ippodromo.yaml")))
    car = load_config(os.path.join(root, "configs/models/dynamic_car.yaml"))
    kin_car = load_config(os.path.join(root, "configs/models/kinematic_car.yaml"))
    all_ok = True
    cases = [
        ("singletrack", "singletrack.yaml", "none", False, 30),
        ("cascaded", "cascaded.yaml", "pm", False, None),
        ("cascaded_obst", "cascaded.yaml", "pm", True, None),
        ("cascaded_kc", "cascaded_kinematic.yaml", "kc", False, None),
    ]
    only = os.environ.get("VERIFY_ONLY")  # comma-separated case names
    solve_too = bool(int(os.environ.get("VERIFY_SOLVE_KERNEL", "1")))
    for name, yaml, tail, obst, N in cases:
        if only and name not in only.split(","):
            continue
        cfg = load_config(os.path.join(root, "configs/controllers", yaml))
        cfg["obstacles"] = obst
        if N:
            cfg["horizon"] = N
        prob = problems.build_cascaded_problem(car, track, cfg, tail, jnp.float32)
        fam = build_cascaded_family(car, cfg, tail, track.data)
        all_ok &= check_family(name, prob, fam)
        if solve_too:
            all_ok &= check_solve_kernel(name, prob, fam)
    if not only or "kinematic" in (only or "").split(","):
        cfg = load_config(os.path.join(root, "configs/controllers/kinematic.yaml"))
        prob = problems.build_kinematic_problem(kin_car, track, cfg, jnp.float32)
        fam = build_kinematic_family(kin_car, cfg, track.data)
        all_ok &= check_family("kinematic", prob, fam)
        if solve_too:
            all_ok &= check_solve_kernel("kinematic", prob, fam)
    print("PARITY OK" if all_ok else "PARITY FAIL")
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
