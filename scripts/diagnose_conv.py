"""Diagnose steady-state non-convergence in the bench fleets.

Replicates bench.py's fleet protocol (same families, same initial-state
distribution, XLA path, f32) for K steps, then dissects the non-converged
lanes of the FINAL step: which constraint is violated, at which stage, at
what magnitude, where the lane is on track, whether the lane is persistently
stuck or flickering, and whether more inner iterations would have converged
it (re-solve the stuck lanes with a doubled budget).

Usage:  python scripts/diagnose_conv.py [kinematic|cascaded_kinematic|...]
Knobs:  DIAG_BATCH (512), DIAG_STEPS (40).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# DIAG_TPU=1 runs the census on the device backend (the axon TPU plugin
# self-registers, so we must NOT touch jax_platforms in that case);
# default forces CPU like every other offline script.
if os.environ.get("DIAG_TPU", "0") != "1":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

if os.environ.get("DIAG_TPU", "0") != "1":
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import dataclasses

import jax.numpy as jnp
import numpy as np

import bench
from vehicle_control_tpu.parallel import aligned_carry, make_batched_racing_step
from vehicle_control_tpu.solvers import ALILQRConfig, build_solver


def main():
    config_name = sys.argv[1] if len(sys.argv) > 1 else "kinematic"
    B = int(os.environ.get("DIAG_BATCH", "512"))
    K = int(os.environ.get("DIAG_STEPS", "40"))
    dtype = jnp.float32

    problem, temporal, track, solver, s_index, ns = bench.build(
        config_name, 30, dtype
    )
    solver_cfg = ALILQRConfig(
        n_outer=int(os.environ.get("DIAG_OUTER", solver["n_outer"])),
        n_inner=int(os.environ.get("DIAG_INNER", solver["n_inner"])),
        mu0=float(os.environ.get("DIAG_MU0", solver.get("mu0", 10.0))),
        mu_scale=float(os.environ.get("DIAG_MU_SCALE", solver.get("mu_scale", 10.0))),
        n_alpha=solver.get("n_alpha", 8),
        n_polish=int(os.environ.get("DIAG_POLISH", solver.get("n_polish", 0))),
        polish_mu_boost=float(os.environ.get("DIAG_POLISH_BOOST", "1.0")),
    )
    step = jax.jit(
        make_batched_racing_step(
            problem, solver_cfg, temporal, track.data, 0.05, s_index
        )
    )

    rng = np.random.default_rng(0)
    avoid = "obstacles" in config_name or config_name == "kinematic"
    states = jnp.asarray(
        bench.initial_states(track, ns, B, rng, avoid), dtype
    )
    carries = aligned_carry(problem, states, dtype)

    nc_hist = []
    for k in range(K):
        carries, states, actions, infos = step(carries, states)
        nc_hist.append(~np.asarray(infos.converged))
    nc_hist = np.asarray(nc_hist)  # (K, B)
    bad = nc_hist[-1]
    print(
        f"{config_name}: B={B} K={K} budget {solver_cfg.n_outer}x"
        f"{solver_cfg.n_inner}+{solver_cfg.n_polish} -> "
        f"converged {1 - bad.mean():.4f} ({bad.sum()} bad lanes)"
    )
    if not bad.any():
        return

    # persistence: how many of the final bad lanes were bad in the last 5 steps
    persist = nc_hist[-5:].all(axis=0)
    print(f"persistently bad (last 5 steps): {persist.sum()} / {bad.sum()}")

    st = np.asarray(states)[bad]
    viol = np.asarray(infos.violation)[bad]
    iters = np.asarray(infos.iterations)[bad]
    Xp = np.asarray(carries.X_pred)[bad]
    Up = np.asarray(carries.U_pred)[bad]
    lam = np.asarray(carries.lam)[bad]

    # per-lane constraint profile at the final iterate
    fns = problem.fns
    H = problem.horizon

    def lane_constraints(Xl, Ul, s0l):
        params, z0 = problem.init_horizon(s0l, Xl, Ul)
        C = jax.vmap(lambda n: fns.constraints(n, Xl[n], Ul[n], params))(
            jnp.arange(H)
        )
        return C

    print("\nlane  s      speed   viol     iters  worst(stage,con)  persist")
    order = np.argsort(-viol)
    for i in order[:15]:
        C = np.asarray(lane_constraints(jnp.asarray(Xp[i]), jnp.asarray(Up[i]), jnp.asarray(st[i])))
        stage, con = np.unravel_index(np.argmax(C), C.shape)
        s_pos = st[i][s_index]
        print(
            f"  {i:3d}  {s_pos:6.1f} {st[i][0]:6.2f}  {viol[i]:.2e}  "
            f"{iters[i]:4d}   ({stage},{con})={C[stage,con]:.2e}   "
            f"{bool(persist[np.flatnonzero(bad)[i]])}"
        )

    # would a bigger budget converge them? re-solve stuck lanes 2x budget
    big_cfg = dataclasses.replace(
        solver_cfg,
        n_outer=solver_cfg.n_outer + 1,
        n_inner=solver_cfg.n_inner * 2,
        n_polish=max(4, solver_cfg.n_polish),
    )
    solve_big = build_solver(
        problem.fns, problem.horizon, big_cfg, problem.u_lo, problem.u_hi
    )

    def resolve(s0l, Xl, Ul, lml):
        params, z0 = problem.init_horizon(s0l, Xl, Ul)
        return solve_big(params, z0, Ul, lml)

    sols = jax.jit(jax.vmap(resolve))(
        jnp.asarray(st), jnp.asarray(Xp), jnp.asarray(Up), jnp.asarray(lam)
    )
    conv_big = np.asarray(sols.converged)
    print(
        f"\nre-solve with {big_cfg.n_outer}x{big_cfg.n_inner}+{big_cfg.n_polish}: "
        f"{conv_big.sum()}/{len(conv_big)} of the stuck lanes converge "
        f"(residual viol median {np.median(np.asarray(sols.violation)):.2e})"
    )
    # and from a fresh cold start (is the carry the problem?)
    Xw, Uw = jax.vmap(problem.warm_start)(jnp.asarray(st))
    sols2 = jax.jit(jax.vmap(resolve))(
        jnp.asarray(st), Xw.astype(dtype), Uw.astype(dtype),
        jnp.zeros_like(jnp.asarray(lam)),
    )
    conv_cold = np.asarray(sols2.converged)
    print(
        f"re-solve same budget from the drop-in cold start: "
        f"{conv_cold.sum()}/{len(conv_cold)} converge "
        f"(residual viol median {np.median(np.asarray(sols2.violation)):.2e})"
    )


if __name__ == "__main__":
    main()
