"""Prove (or refute) the parity-tail multi-modality claim (VERDICT r3 #3).

PARITY.json's residual tail — ~1-3% of full-lap steps with normalized
action deviation > 1e-2 vs the reference's IPOPT actions — has been
*asserted* to be multi-modality ("isolated curve-entry steps land in a
different local basin"), never demonstrated.  This script demonstrates or
refutes it, step by step:

For every full-lap parity step (parity mode: solve-to-optimality, f64,
unshifted warm start — scripts/parity_report.py) whose max per-channel
normalized deviation exceeds DEV_THRESHOLD (1e-2):

  A. our parity iterate: cost_A, violation_A, first action u0_A;
  B. a second solve-to-optimality from a warm start biased INTO the
     reference's basin: the same incoming carry with the first action row
     replaced by the reference's recorded action.  If the reference's
     action lies in a different basin of OUR NLP, this solve stays there
     (u0_B ~ u_ref) and returns that basin's cost.

Classification per deviant step:
  * ours-no-worse      cost_A <= cost_B + tol (our basin is as good or
                       better IN OUR OWN NLP — deviation is benign
                       multi-modality, the claim holds for this step);
  * ours-suboptimal    cost_B < cost_A - tol with violation_B feasible:
                       the reference's basin is better and our parity
                       solve missed it — a real solver defect to fix;
  * ref-not-retained   the biased solve walks away from the reference
                       action (|u0_B - u_ref| > |u0_A - u_ref| / 2): the
                       reference's action is not near a stationary point
                       of our NLP — counts as ours-no-worse when
                       cost_A <= cost_B + tol, else flagged.

Writes PARITY_BASINS.json with per-step records and per-case counts.

Run (CPU, f64):  python scripts/parity_basins.py
Knobs: BASINS_BUDGET (default "8x16+8" — the faster parity budget, still
~1e-7 median), BASINS_THRESHOLD (1e-2), BASINS_STEPS (truncate, debug).
Wall: ~45-90 min for the three north-star laps.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

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
COST_TOL = 1e-6  # relative cost tolerance for "no worse"


def _budget():
    b = os.environ.get("BASINS_BUDGET", "8x16+8")
    outer_inner, polish = b.split("+")
    outer, inner = outer_inner.split("x")
    return parity_solver_config(int(outer), int(inner), int(polish))


def run_case(track, carcfg, run_dir, controller, tail, threshold, n_steps):
    ref = load_reference_run(os.path.join(REF_DATA, run_dir), controller)
    prob = problems.build_cascaded_problem(carcfg, track, ref.config, tail=tail)
    cfg = _budget()
    solve = jax.jit(
        build_solver(prob.fns, prob.horizon, cfg, prob.u_lo, prob.u_hi)
    )
    u_scale0 = np.asarray(prob.u_scale[0], np.float64)

    T = len(ref.states) if n_steps is None else min(n_steps, len(ref.states))
    theirs = ref.actions[1 : 1 + T]  # reference logs action i at index i+1
    rms_ref = np.sqrt((ref.actions[1:] ** 2).mean(axis=0))

    carry = initial_carry(prob)
    records = []
    for i in range(min(T, len(theirs))):
        state = jnp.asarray(ref.states[i])
        params, z0 = prob.init_horizon(state, carry.X_pred, carry.U_pred)
        sol = solve(params, z0, carry.U_pred, carry.lam)
        u0_A = np.asarray(sol.U[0]) * u_scale0
        dev = np.abs(u0_A - theirs[i]) / np.maximum(rms_ref, 1e-12)
        if dev.max() > threshold:
            # biased re-solve: same carry, first action pinned to the
            # reference's (solver units) as the warm-start seed
            U_bias = carry.U_pred.at[0].set(
                jnp.asarray(theirs[i] / u_scale0)
            )
            sol_B = solve(params, z0, U_bias, carry.lam)
            u0_B = np.asarray(sol_B.U[0]) * u_scale0
            cost_A = float(sol.cost)
            cost_B = float(sol_B.cost)
            d_ref_A = float(np.max(np.abs(u0_A - theirs[i]) / np.maximum(rms_ref, 1e-12)))
            d_ref_B = float(np.max(np.abs(u0_B - theirs[i]) / np.maximum(rms_ref, 1e-12)))
            retained = d_ref_B < d_ref_A / 2.0
            no_worse = cost_A <= cost_B + COST_TOL * (1.0 + abs(cost_B))
            feas_B = float(sol_B.violation) < 1e-6
            if no_worse:
                cls = "ours-no-worse" if retained else "ref-not-retained-no-worse"
            elif feas_B:
                cls = "ours-suboptimal"
            else:
                cls = "ref-basin-infeasible"
            records.append(
                {
                    "step": i,
                    "dev_normalized": float(dev.max()),
                    "u0_ours": [float(x) for x in u0_A],
                    "u0_ref": [float(x) for x in theirs[i]],
                    "u0_biased": [float(x) for x in u0_B],
                    "cost_ours": cost_A,
                    "cost_ref_basin": cost_B,
                    "viol_ours": float(sol.violation),
                    "viol_ref_basin": float(sol_B.violation),
                    "ref_retained": bool(retained),
                    "class": cls,
                }
            )
            print(
                f"  step {i:4d}: dev {dev.max():.3f}  cost A {cost_A:.6f} "
                f"B {cost_B:.6f}  retained={retained}  -> {cls}"
            )
        carry = MPCCarry(X_pred=sol.X, U_pred=sol.U, lam=sol.lam)
    counts = {}
    for r in records:
        counts[r["class"]] = counts.get(r["class"], 0) + 1
    print(f"== {run_dir}/{controller}: {len(records)} deviant steps {counts}")
    return {
        "run": run_dir,
        "controller": controller,
        "n_steps": int(T),
        "deviant_steps": len(records),
        "deviant_fraction": len(records) / max(T, 1),
        "counts": counts,
        "records": records,
    }


def main():
    root = project_root()
    track = Track(
        load_config(os.path.join(root, "configs/environment/ippodromo.yaml"))
    )
    carcfg = load_config(os.path.join(root, "configs/models/dynamic_car.yaml"))
    threshold = float(os.environ.get("BASINS_THRESHOLD", "1e-2"))
    n_steps = int(os.environ.get("BASINS_STEPS", "0")) or None
    cases = [
        ("race1_ippodromo", "cascaded", "pm"),
        ("race3_ippodromo", "cascaded", "pm"),
        ("race1_ippodromo", "singletrack", "none"),
    ]
    results = [
        run_case(track, carcfg, d, c, t, threshold, n_steps)
        for d, c, t in cases
    ]
    n_subopt = sum(r["counts"].get("ours-suboptimal", 0) for r in results)
    n_dev = sum(r["deviant_steps"] for r in results)
    flip_frac = 1.0 - n_subopt / max(n_dev, 1)
    out = {
        "metric": "classification of full-lap parity-tail steps "
        "(normalized action deviation > threshold) by basin analysis",
        "threshold": threshold,
        "mode": f"parity budget {os.environ.get('BASINS_BUDGET', '8x16+8')}, "
        "f64, unshifted warm start; biased re-solve seeds the reference "
        "action into the warm start",
        # the multi-modality claim (VERDICT r4 #5): >= 95% of the parity
        # tail must be basin flips, i.e. steps where our solution is no
        # worse in OUR OWN NLP and the deviation is a different local basin
        "basin_flip_fraction": flip_frac,
        "claim_holds": flip_frac >= 0.95,
        "ours_suboptimal_total": n_subopt,
        "deviant_steps_total": n_dev,
        "results": results,
    }
    with open(os.path.join(root, "PARITY_BASINS.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(
        json.dumps(
            {
                "written": "PARITY_BASINS.json",
                "claim_holds": out["claim_holds"],
                "ours_suboptimal_total": n_subopt,
            }
        )
    )


if __name__ == "__main__":
    main()
