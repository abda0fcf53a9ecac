"""Parity diagnostic probe: is the residual full-lap deviation (PARITY.json)
solver suboptimality or formulation mismatch?

Runs a window of teacher-forced steps from a reference golden run under
(a) the production fixed-budget config and (b) a "parity mode": much larger
iteration budget + UNSHIFTED warm-start carry (the reference warm-starts
from the previous solution as-is and builds ds from it,
cascaded_mpc.py:316-338 — our production step shifts by one stage).

Usage: python scripts/parity_probe.py [run_dir] [controller] [tail] [t0] [T]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import time

import jax.numpy as jnp
import numpy as np

from vehicle_control_tpu.controllers.mpc import problems
from vehicle_control_tpu.controllers.mpc.controllers import (
    MPCCarry,
    _solver_config,
    initial_carry,
    make_mpc_step,
)
from vehicle_control_tpu.environment.track import Track
from vehicle_control_tpu.simulation.analysis import load_reference_run
from vehicle_control_tpu.solvers import ALILQRConfig
from vehicle_control_tpu.utils.config import load_config, project_root

REF_DATA = "/root/reference/experiments/data"


def make_parity_step(problem, solver_cfg):
    """Like make_mpc_step but with the reference's UNSHIFTED warm start."""
    from vehicle_control_tpu.solvers import build_solver

    solve = build_solver(
        problem.fns, problem.horizon, solver_cfg, problem.u_lo, problem.u_hi
    )

    def step(carry, state):
        params, z0 = problem.init_horizon(state, carry.X_pred, carry.U_pred)
        sol = solve(params, z0, carry.U_pred, carry.lam)
        action = sol.U[0] * problem.u_scale[0]
        new_carry = MPCCarry(X_pred=sol.X, U_pred=sol.U, lam=sol.lam)
        return new_carry, action, (sol.cost, sol.violation, sol.converged, sol.iterations)

    return step


def run(step, carry0, states, T):
    carry = carry0
    acts, infos = [], []
    for i in range(T):
        carry, act, info = step(carry, jnp.asarray(states[i]))
        acts.append(np.asarray(act))
        infos.append([float(x) for x in info[:4]])  # cost, viol, conv, iters
    return np.asarray(acts), np.asarray(infos)


def main():
    run_dir = sys.argv[1] if len(sys.argv) > 1 else "race1_ippodromo"
    controller = sys.argv[2] if len(sys.argv) > 2 else "cascaded"
    tail = sys.argv[3] if len(sys.argv) > 3 else "pm"
    t0 = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    T = int(sys.argv[5]) if len(sys.argv) > 5 else 120

    root = project_root()
    track = Track(load_config(os.path.join(root, "configs/environment/ippodromo.yaml")))
    carcfg = load_config(os.path.join(root, "configs/models/dynamic_car.yaml"))
    ref = load_reference_run(os.path.join(REF_DATA, run_dir), controller)
    prob = problems.build_cascaded_problem(carcfg, track, ref.config, tail=tail)

    states = ref.states[t0 : t0 + T]
    theirs = ref.actions[t0 + 1 : t0 + 1 + T]

    no = int(os.environ.get("P_OUTER", "12"))
    ni = int(os.environ.get("P_INNER", "40"))
    np_ = int(os.environ.get("P_POLISH", "12"))
    variants = {}
    if int(os.environ.get("P_PROD", "1")):
        variants["prod(3x8,shifted)"] = (
            make_mpc_step(prob, _solver_config(ref.config)), False,
        )
    variants[f"parity({no}x{ni}+{np_},unshifted)"] = (
        make_parity_step(
            prob,
            ALILQRConfig(
                n_outer=no,
                n_inner=ni,
                n_polish=np_,
                n_alpha=12,
                mu0=10.0,
                mu_scale=10.0,
                mu_max=1e10,
                tol_con=1e-8,
                tol_cost=1e-12,
                recover_viol=0.0,
            ),
        ),
        True,
    )

    results = {}
    for name, (step, _) in variants.items():
        stepj = jax.jit(step)
        t_start = time.time()
        acts, infos = run(stepj, initial_carry(prob), states, T)
        dt_wall = time.time() - t_start
        dev = acts - theirs[: len(acts)]
        rms_ref = np.sqrt((theirs**2).mean(axis=0))
        nd = np.abs(dev) / rms_ref
        results[name] = (acts, nd, infos)
        print(f"\n== {name}  ({dt_wall:.1f}s, {dt_wall/T*1e3:.0f} ms/step)")
        print(f"   median normalized dev: {np.median(nd, axis=0)}")
        print(f"   p90    normalized dev: {np.percentile(nd, 90, axis=0)}")
        print(f"   max    normalized dev: {nd.max(axis=0)} at steps {nd.argmax(axis=0) + t0}")
        print(f"   mean iterations {infos[:,3].mean():.1f}, max viol {infos[:,1].max():.2e}, conv frac {infos[:,2].mean():.2f}")

    # worst steps under parity mode
    _, nd, _ = results[f"parity({no}x{ni}+{np_},unshifted)"]
    worst = np.argsort(-nd[:, 1])[:10]
    print("\nworst w-channel steps (parity mode): step, nd_Fx, nd_w")
    for i in worst:
        print(f"  {t0+i:4d}  {nd[i,0]:.2e}  {nd[i,1]:.2e}")


if __name__ == "__main__":
    main()
