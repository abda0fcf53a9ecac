"""Golden-fixture parity vs the reference's shipped experiment artifacts
(SURVEY §4: 'closed-loop golden (vs reference .npy)').

Two distinct claims, gated separately:

* **North star** (`TestNorthStarParity`): in parity mode — solve to
  optimality with the reference's unshifted warm start
  (controllers.make_parity_step) — our actions must match the reference's
  IPOPT actions to <= 1e-3 median normalized deviation (BASELINE.json).
  Measured envelope: ~1e-7 median, so the 1e-3 gate has 4 orders of
  magnitude of headroom.  CI runs 100-step windows that include the known
  worst transients (race1 steps ~27-35, race3 steps ~27-29/86-91); the
  full-lap version regenerates PARITY.json and runs under PARITY_FULL=1.
* **Production envelope** (`TestProductionEnvelope`): the fixed-budget
  throughput config (3x8, shifted warm start) intentionally returns a
  near-optimal iterate each step; these gates pin how far from the
  reference it is allowed to drift (a closed-loop-quality regression
  tripwire, NOT the north-star metric).
"""

import os

import pytest

from vehicle_control_tpu.simulation.analysis import action_parity, load_reference_run

REF_DATA = "/root/reference/experiments/data"

needs_reference = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference not mounted"
)


def _parity_report(track, run_dir, controller, tail, n_steps, budget=(8, 16, 8)):
    import jax

    from vehicle_control_tpu.controllers.mpc import problems
    from vehicle_control_tpu.controllers.mpc.controllers import (
        initial_carry,
        make_parity_step,
        parity_solver_config,
    )
    from vehicle_control_tpu.utils.config import load_config, project_root

    ref = load_reference_run(os.path.join(REF_DATA, run_dir), controller)
    carcfg = load_config(
        os.path.join(project_root(), "configs/models/dynamic_car.yaml")
    )
    prob = problems.build_cascaded_problem(carcfg, track, ref.config, tail=tail)
    step = jax.jit(make_parity_step(prob, parity_solver_config(*budget)))
    rep = action_parity(step, initial_carry(prob), ref, n_steps=n_steps)
    print()
    print(rep)
    return rep


@needs_reference
class TestNorthStarParity:
    """<= 1e-3 median normalized control deviation, both channels."""

    def test_cascaded_race1(self, ippodromo_track):
        rep = _parity_report(ippodromo_track, "race1_ippodromo", "cascaded", "pm", 100)
        assert rep.median_normalized_dev[0] <= 1e-3
        assert rep.median_normalized_dev[1] <= 1e-3
        # measured ~1e-7: a order-of-magnitude regression still passes the
        # north star but should be noticed
        assert rep.median_normalized_dev[0] <= 1e-5
        assert rep.median_normalized_dev[1] <= 1e-5
        # all but isolated multi-modal curve-entry steps are exact
        # (step ~27 lands in a different local basin than IPOPT: ~1.3e-2)
        assert rep.p99_normalized_dev[1] <= 5e-2

    def test_cascaded_race3_long_tail(self, ippodromo_track):
        """The N=20+M=35 config that was the round-2 worst case."""
        rep = _parity_report(ippodromo_track, "race3_ippodromo", "cascaded", "pm", 100)
        assert rep.median_normalized_dev[0] <= 1e-3
        assert rep.median_normalized_dev[1] <= 1e-3
        assert rep.median_normalized_dev[0] <= 1e-5
        assert rep.median_normalized_dev[1] <= 1e-5
        assert rep.p99_normalized_dev[1] <= 5e-2

    def test_singletrack_race1(self, ippodromo_track):
        rep = _parity_report(
            ippodromo_track, "race1_ippodromo", "singletrack", "none", 60
        )
        assert rep.median_normalized_dev[0] <= 1e-3
        assert rep.median_normalized_dev[1] <= 1e-3

    def test_cascaded_race1_shoe(self, shoe_track):
        """Shoe track (VERDICT r4 #3): different curvature content — the
        spline pipeline + formulation parity off the ippodromo happy path."""
        rep = _parity_report(shoe_track, "race1_shoe", "cascaded", "pm", 100)
        assert rep.median_normalized_dev[0] <= 1e-3
        assert rep.median_normalized_dev[1] <= 1e-3
        assert rep.median_normalized_dev[0] <= 1e-5
        assert rep.median_normalized_dev[1] <= 1e-5

    def test_singletrack_race1_shoe(self, shoe_track):
        rep = _parity_report(shoe_track, "race1_shoe", "singletrack", "none", 60)
        assert rep.median_normalized_dev[0] <= 1e-3
        assert rep.median_normalized_dev[1] <= 1e-3

    @pytest.mark.skipif(
        not int(os.environ.get("PARITY_FULL", "0")),
        reason="full-lap parity run (~1 h): PARITY_FULL=1 to enable",
    )
    def test_full_lap_regenerates_parity_json(self):
        """One command reproduces PARITY.json and asserts the 1e-3 gate
        over ALL full laps (VERDICT r2 Next #8)."""
        import importlib.util

        from vehicle_control_tpu.utils.config import project_root

        spec = importlib.util.spec_from_file_location(
            "parity_report",
            os.path.join(project_root(), "scripts/parity_report.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        out = mod.main()
        assert out["all_meet_north_star"], out


@needs_reference
class TestProductionEnvelope:
    """Fixed-budget production config vs the reference (see module doc)."""

    @pytest.fixture(scope="class")
    def report(self, ippodromo_track):
        import jax

        from vehicle_control_tpu.controllers.mpc import problems
        from vehicle_control_tpu.controllers.mpc.controllers import (
            _solver_config,
            initial_carry,
            make_mpc_step,
        )
        from vehicle_control_tpu.utils.config import load_config, project_root

        ref = load_reference_run(os.path.join(REF_DATA, "race1_ippodromo"), "cascaded")
        carcfg = load_config(
            os.path.join(project_root(), "configs/models/dynamic_car.yaml")
        )
        prob = problems.build_cascaded_problem(
            carcfg, ippodromo_track, ref.config, tail="pm"
        )
        step = jax.jit(make_mpc_step(prob, _solver_config(ref.config)))
        rep = action_parity(step, initial_carry(prob), ref, n_steps=150)
        print()
        print(rep)
        return rep

    def test_typical_step_agreement(self, report):
        # production envelope (round-4 measured, fixed budget): median
        # 1.16 N / 9.6e-5 rad/s on race1; gates at ~1.5-2x so a genuine
        # closed-loop quality regression trips CI (VERDICT r4 #6)
        assert report.median_abs_dev[0] < 2.5  # Fx [N] of ~2500 N RMS signal
        assert report.median_abs_dev[1] < 2e-4  # w [rad/s]

    def test_sequence_correlation(self, report):
        # measured full-lap fixed-budget: 0.960 / 0.926; gate at ~1.5x the
        # measured correlation deficit
        assert report.correlation[0] > 0.94
        assert report.correlation[1] > 0.89

    def test_rms_bounded(self, report):
        # RMS deviation dominated by a handful of multi-modal curve-entry
        # steps; measured full-lap normalized RMS 0.231 / 0.413 — the gate
        # already sits ~1.3x over measured
        assert report.rms_dev[0] < 0.30 * report.rms_ref[0]
        assert report.rms_dev[1] < 0.50 * report.rms_ref[1]


@needs_reference
class TestSingletrackProductionEnvelope:
    def test_actions_track_reference(self, ippodromo_track):
        import jax

        from vehicle_control_tpu.controllers.mpc import problems
        from vehicle_control_tpu.controllers.mpc.controllers import (
            _solver_config,
            initial_carry,
            make_mpc_step,
        )
        from vehicle_control_tpu.utils.config import load_config, project_root

        ref = load_reference_run(
            os.path.join(REF_DATA, "race1_ippodromo"), "singletrack"
        )
        carcfg = load_config(
            os.path.join(project_root(), "configs/models/dynamic_car.yaml")
        )
        # must match the reference horizon exactly: steering decisions at
        # the same state are strongly lookahead-dependent (N=30 vs the
        # recorded N=50 run anti-correlates)
        prob = problems.build_cascaded_problem(
            carcfg, ippodromo_track, ref.config, tail="none"
        )
        step = jax.jit(make_mpc_step(prob, _solver_config(ref.config)))
        rep = action_parity(step, initial_carry(prob), ref, n_steps=100)
        print()
        print(rep)
        # measured full-lap fixed-budget: corr 0.99998 / 0.9994, median
        # 4.36 N / 1.4e-4 rad/s
        assert rep.correlation[0] > 0.995
        assert rep.correlation[1] > 0.99
        assert rep.median_abs_dev[0] < 15.0
        assert rep.median_abs_dev[1] < 1e-3


@needs_reference
class TestObstacleRunParity:
    """Obstacle avoidance is multi-modal (pass-left vs pass-right is a
    discrete choice), so per-step action correlation is not meaningful;
    parity is judged closed-loop: comparable laptime and genuine clearance.
    Our golden run (experiments/data/verify_obs_ippodromo) was produced by
    the full simulator with obstacles enabled."""

    OURS = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "experiments/data/verify_obs_ippodromo",
    )

    @pytest.mark.skipif(
        not os.path.isdir(OURS), reason="golden obstacle run not present"
    )
    def test_laptime_and_clearance(self, ippodromo_track):
        import numpy as np

        ours = np.load(os.path.join(self.OURS, "cascaded_state_traj.npy"))
        ref = np.load(
            os.path.join(REF_DATA, "cascaded_obstacles1_ippodromo/cascaded_state_traj.npy")
        )
        laptime_ours = float(ours[-1, 7])
        laptime_ref = float(ref[-1, 7])
        assert laptime_ours < 1.15 * laptime_ref  # within 15% (measured ~7%)
        for o in ippodromo_track.obstacles:
            d = np.sqrt((ours[:, 4] - o.s) ** 2 + (ours[:, 5] - o.ey) ** 2).min()
            assert d > o.radius

    DATA = os.path.join(os.path.dirname(OURS))

    @pytest.mark.parametrize(
        "run,giant",
        [
            ("cascaded_giantObstacle1_ippodromo", (30.0, 0.0, 5.0)),
            ("cascaded_giantObstacle2_ippodromo", (180.0, 0.0, 5.0)),
            ("cascaded_giantObstacle3_ippodromo", (180.0, 0.0, 5.0)),
        ],
    )
    def test_giant_obstacle_runs(self, run, giant):
        """The giant-obstacle stress runs (radius-5 disc spanning the whole
        road; layout reconstructed from the reference's commented-out
        ippodromo entry + trajectory bulges — see scripts/make_run_matrix).
        Gate: completes the lap within 10% of the reference laptime and
        genuinely clears the giant."""
        import numpy as np

        ours_dir = os.path.join(self.DATA, run)
        if not os.path.isdir(ours_dir):
            pytest.skip(f"{run} not regenerated")
        ours = np.load(os.path.join(ours_dir, "cascaded_state_traj.npy"))
        ref = np.load(os.path.join(REF_DATA, run, "cascaded_state_traj.npy"))
        assert np.isfinite(ours).all()
        assert float(ours[-1, 7]) < 1.10 * float(ref[-1, 7])
        s0, ey0, r = giant
        d = np.sqrt((ours[:, 4] - s0) ** 2 + (ours[:, 5] - ey0) ** 2).min()
        assert d > r

    @pytest.mark.parametrize(
        "run,controller",
        [
            ("cascaded_obstacles_shoe", "cascaded"),
            ("singletrack_obstacles_shoe", "singletrack"),
        ],
    )
    def test_obstacles_shoe_runs(self, run, controller):
        import numpy as np
        import yaml

        from vehicle_control_tpu.utils.config import load_config, project_root

        ours_dir = os.path.join(self.DATA, run)
        if not os.path.isdir(ours_dir):
            pytest.skip(f"{run} not regenerated")
        ours = np.load(os.path.join(ours_dir, f"{controller}_state_traj.npy"))
        ref = np.load(os.path.join(REF_DATA, run, f"{controller}_state_traj.npy"))
        assert np.isfinite(ours).all()
        assert float(ours[-1, 7]) < 1.10 * float(ref[-1, 7])
        shoe = load_config(
            os.path.join(project_root(), "configs/environment/shoe.yaml")
        )
        for s0, ey0, r in shoe["obstacle_data"]:
            d = np.sqrt((ours[:, 4] - s0) ** 2 + (ours[:, 5] - ey0) ** 2).min()
            assert d > r, (s0, ey0, r, d)
