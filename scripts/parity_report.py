"""North-star parity metric: full-lap control-sequence deviation vs the
reference, per channel, normalized by the reference signal magnitude
(BASELINE.json: '<=1e-3 control-sequence deviation vs reference over a full
track lap').

Feeds every recorded state of the reference's golden runs into our
controllers (identical config snapshots) and measures the produced action
sequences against the reference's IPOPT actions over the FULL lap — the
same protocol as tests/test_golden_parity.py but unabbreviated and with the
metric in its own units.  Writes ``PARITY.json``.

Run (CPU, f64):  python scripts/parity_report.py
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
    _solver_config,
    initial_carry,
    make_mpc_step,
)
from vehicle_control_tpu.environment.track import Track
from vehicle_control_tpu.simulation.analysis import action_parity, load_reference_run
from vehicle_control_tpu.utils.config import load_config, project_root

REF_DATA = "/root/reference/experiments/data"


def run_case(track, carcfg, run_dir, controller, tail):
    ref = load_reference_run(os.path.join(REF_DATA, run_dir), controller)
    prob = problems.build_cascaded_problem(carcfg, track, ref.config, tail=tail)
    step = jax.jit(make_mpc_step(prob, _solver_config(ref.config)))
    rep = action_parity(step, initial_carry(prob), ref, n_steps=None)
    print(f"== {run_dir}/{controller} (full lap, {rep.n_steps} steps)")
    print(rep)
    return {
        "run": run_dir,
        "controller": controller,
        "n_steps": int(rep.n_steps),
        "median_abs_dev": [float(x) for x in rep.median_abs_dev],
        "median_normalized_dev": [float(x) for x in rep.median_normalized_dev],
        "rms_normalized_dev": [float(x) for x in rep.rms_normalized_dev],
        "correlation": [float(x) for x in rep.correlation],
    }


def main():
    root = project_root()
    track = Track(load_config(os.path.join(root, "configs/environment/ippodromo.yaml")))
    carcfg = load_config(os.path.join(root, "configs/models/dynamic_car.yaml"))
    cases = [
        ("race1_ippodromo", "cascaded", "pm"),
        ("race3_ippodromo", "cascaded", "pm"),
        ("race1_ippodromo", "singletrack", "none"),
    ]
    results = [run_case(track, carcfg, d, c, t) for d, c, t in cases]
    out = {
        "metric": "full-lap control deviation vs reference IPOPT actions, "
        "median |dev| per channel normalized by reference RMS signal",
        "north_star": 1e-3,
        "results": results,
    }
    with open(os.path.join(root, "PARITY.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"written": "PARITY.json"}))


if __name__ == "__main__":
    main()
