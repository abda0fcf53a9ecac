"""North-star parity metric: full-lap control-sequence deviation vs the
reference, per channel, normalized by the reference signal magnitude
(BASELINE.json: '<=1e-3 control-sequence deviation vs reference over a full
track lap').

Feeds every recorded state of the reference's golden runs into our
controllers (identical config snapshots) in **parity mode** — solve to
optimality (controllers.parity_solver_config: large frozen-lane iteration
budget, tol_con 1e-8, f64) with the reference's unshifted warm start — and
measures the produced action sequences against the reference's IPOPT
actions over the FULL lap.  The reference solves each step to IPOPT's
tolerance, so parity is a statement about the *formulation*; the production
fixed-budget config trades ~1e-3 of per-step optimality for 4 orders of
magnitude of throughput (its envelope is tracked separately by
tests/test_golden_parity.py::TestProductionEnvelope).

Writes ``PARITY.json``.  Run (CPU, f64):  python scripts/parity_report.py
[~1 h: ~1-3 s/step x 3 full laps.  PARITY_BUDGET="8x16+8" trades headroom
for a 3x faster pass; PARITY_STEPS=N truncates each lap (diagnostics only).]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from vehicle_control_tpu.controllers.mpc import problems
from vehicle_control_tpu.controllers.mpc.controllers import (
    initial_carry,
    make_parity_step,
    parity_solver_config,
)
from vehicle_control_tpu.environment.track import Track
from vehicle_control_tpu.simulation.analysis import action_parity, load_reference_run
from vehicle_control_tpu.utils.config import load_config, project_root

REF_DATA = "/root/reference/experiments/data"


def _budget():
    b = os.environ.get("PARITY_BUDGET", "12x40+12")
    outer_inner, polish = b.split("+")
    outer, inner = outer_inner.split("x")
    return parity_solver_config(int(outer), int(inner), int(polish))


def run_case(track, carcfg, run_dir, controller, tail, n_steps=None):
    ref = load_reference_run(os.path.join(REF_DATA, run_dir), controller)
    prob = problems.build_cascaded_problem(carcfg, track, ref.config, tail=tail)
    step = jax.jit(make_parity_step(prob, _budget()))
    rep = action_parity(step, initial_carry(prob), ref, n_steps=n_steps)
    print(f"== {run_dir}/{controller} (full lap, {rep.n_steps} steps)")
    print(rep)
    return {
        "run": run_dir,
        "controller": controller,
        "n_steps": int(rep.n_steps),
        "median_abs_dev": [float(x) for x in rep.median_abs_dev],
        "median_normalized_dev": [float(x) for x in rep.median_normalized_dev],
        "p99_normalized_dev": [float(x) for x in rep.p99_normalized_dev],
        "max_normalized_dev": [float(x) for x in rep.max_normalized_dev],
        "rms_normalized_dev": [float(x) for x in rep.rms_normalized_dev],
        "correlation": [float(x) for x in rep.correlation],
        "meets_north_star": bool(np.all(rep.median_normalized_dev <= 1e-3)),
    }


def main():
    root = project_root()
    tracks = {}

    def _track(name):
        if name not in tracks:
            tracks[name] = Track(
                load_config(os.path.join(root, f"configs/environment/{name}.yaml"))
            )
        return tracks[name]

    carcfg = load_config(os.path.join(root, "configs/models/dynamic_car.yaml"))
    n_steps = int(os.environ.get("PARITY_STEPS", "0")) or None
    # shoe cases (VERDICT r4 #3): different curvature content exercises the
    # spline pipeline + formulation parity off the ippodromo happy path
    cases = [
        ("race1_ippodromo", "cascaded", "pm", "ippodromo"),
        ("race3_ippodromo", "cascaded", "pm", "ippodromo"),
        ("race1_ippodromo", "singletrack", "none", "ippodromo"),
        ("race1_shoe", "cascaded", "pm", "shoe"),
        ("race1_shoe", "singletrack", "none", "shoe"),
    ]
    results = [
        run_case(_track(tr), carcfg, d, c, t, n_steps) for d, c, t, tr in cases
    ]
    out = {
        "metric": "full-lap control deviation vs reference IPOPT actions, "
        "median |dev| per channel normalized by reference RMS signal",
        "north_star": 1e-3,
        "mode": "parity (solve-to-optimality, unshifted warm start, f64; "
        f"budget {os.environ.get('PARITY_BUDGET', '12x40+12')})",
        "all_meet_north_star": bool(all(r["meets_north_star"] for r in results)),
        "results": results,
    }
    with open(os.path.join(root, "PARITY.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"written": "PARITY.json", "all_meet_north_star": out["all_meet_north_star"]}))
    return out


if __name__ == "__main__":
    main()
