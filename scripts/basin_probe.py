"""Probe the single ours-suboptimal parity-tail step (PARITY_BASINS.json).

race1_ippodromo/cascaded step 205 is the one deviant full-lap step (of 209)
where the biased re-solve found a better feasible basin (cost 66.63 vs our
67.97).  Question: does our parity solve miss that basin because of the
iteration budget (fixable) or because its warm-start lineage leads to a
different local optimum (inherent multi-modality)?

Method: replay the lap to step 205 exactly as parity_basins does (8x16+8),
then re-solve step 205 from OUR own carry with escalating budgets
(12x40+12, 16x60+16).  If bigger budgets stay at ~67.97, the iterate is a
genuine local optimum of our NLP from that start — a basin-selection
property, not a solver defect.

Run (CPU f64):  python scripts/basin_probe.py   (~10 min)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import json

import jax.numpy as jnp
import numpy as np

from vehicle_control_tpu.controllers.mpc import problems
from vehicle_control_tpu.controllers.mpc.controllers import (
    MPCCarry,
    initial_carry,
    parity_solver_config,
)
from vehicle_control_tpu.environment.track import Track
from vehicle_control_tpu.simulation.analysis import load_reference_run
from vehicle_control_tpu.solvers import build_solver
from vehicle_control_tpu.utils.config import load_config, project_root

REF_DATA = "/root/reference/experiments/data"
STEP = 205


def main():
    root = project_root()
    track = Track(
        load_config(os.path.join(root, "configs/environment/ippodromo.yaml"))
    )
    carcfg = load_config(os.path.join(root, "configs/models/dynamic_car.yaml"))
    ref = load_reference_run(os.path.join(REF_DATA, "race1_ippodromo"), "cascaded")
    prob = problems.build_cascaded_problem(carcfg, track, ref.config, tail="pm")
    base_cfg = parity_solver_config(8, 16, 8)
    solve = jax.jit(
        build_solver(prob.fns, prob.horizon, base_cfg, prob.u_lo, prob.u_hi)
    )
    u_scale0 = np.asarray(prob.u_scale[0], np.float64)

    carry = initial_carry(prob)
    for i in range(STEP):
        state = jnp.asarray(ref.states[i])
        params, z0 = prob.init_horizon(state, carry.X_pred, carry.U_pred)
        sol = solve(params, z0, carry.U_pred, carry.lam)
        carry = MPCCarry(X_pred=sol.X, U_pred=sol.U, lam=sol.lam)

    state = jnp.asarray(ref.states[STEP])
    params, z0 = prob.init_horizon(state, carry.X_pred, carry.U_pred)
    u_ref = ref.actions[1 + STEP]
    out = {"step": STEP, "u_ref": [float(x) for x in u_ref], "solves": []}
    for budget in [(8, 16, 8), (12, 40, 12), (16, 60, 16)]:
        cfg = parity_solver_config(*budget)
        s = jax.jit(
            build_solver(prob.fns, prob.horizon, cfg, prob.u_lo, prob.u_hi)
        )(params, z0, carry.U_pred, carry.lam)
        u0 = np.asarray(s.U[0]) * u_scale0
        rec = {
            "budget": f"{budget[0]}x{budget[1]}+{budget[2]}",
            "u0": [float(x) for x in u0],
            "cost": float(s.cost),
            "violation": float(s.violation),
        }
        out["solves"].append(rec)
        print(rec)
    # biased solve at the largest budget for the basin cost comparison
    U_bias = carry.U_pred.at[0].set(jnp.asarray(u_ref / u_scale0))
    cfg = parity_solver_config(16, 60, 16)
    sb = jax.jit(build_solver(prob.fns, prob.horizon, cfg, prob.u_lo, prob.u_hi))(
        params, z0, U_bias, carry.lam
    )
    out["biased_16x60"] = {
        "u0": [float(x) for x in np.asarray(sb.U[0]) * u_scale0],
        "cost": float(sb.cost),
        "violation": float(sb.violation),
    }
    print(out["biased_16x60"])
    own = [r["cost"] for r in out["solves"]]
    out["budget_invariant"] = bool(max(own) - min(own) < 1e-3 * (1 + abs(own[0])))
    out["conclusion"] = (
        "basin-selection (our iterate is a genuine local optimum from our "
        "warm-start lineage; bigger budgets do not move it)"
        if out["budget_invariant"]
        else "budget-sensitive (bigger budgets change the iterate - solver miss)"
    )
    with open(os.path.join(root, "BASIN_PROBE.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"written": "BASIN_PROBE.json", "conclusion": out["conclusion"]}))


if __name__ == "__main__":
    main()
