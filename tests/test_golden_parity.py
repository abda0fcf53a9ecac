"""Golden-fixture parity vs the reference's shipped experiment artifacts
(SURVEY §4: 'closed-loop golden (vs reference .npy)').

These tests feed the reference's recorded closed-loop states into our
controllers (configured from the recorded config snapshots) and require the
produced action sequences to track the reference's IPOPT solutions."""

import os

import pytest

from vehicle_control_tpu.simulation.analysis import action_parity, load_reference_run

REF_DATA = "/root/reference/experiments/data"


@pytest.mark.skipif(not os.path.isdir(REF_DATA), reason="reference not mounted")
class TestCascadedGoldenParity:
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
        # gates pinned to the measured full-lap envelope (PARITY.json:
        # median 1.16 N / 9.6e-5 rad/s on race1) with ~4x headroom
        assert report.median_abs_dev[0] < 8.0  # Fx [N] of ~2500 N RMS signal
        assert report.median_abs_dev[1] < 1e-3  # w [rad/s]

    def test_sequence_correlation(self, report):
        # measured full-lap: 0.960 / 0.926 (PARITY.json race1)
        assert report.correlation[0] > 0.93
        assert report.correlation[1] > 0.88

    def test_rms_bounded(self, report):
        # RMS deviation dominated by a handful of multi-modal curve-entry
        # steps; measured full-lap normalized RMS 0.231 / 0.413
        assert report.rms_dev[0] < 0.30 * report.rms_ref[0]
        assert report.rms_dev[1] < 0.50 * report.rms_ref[1]


@pytest.mark.skipif(not os.path.isdir(REF_DATA), reason="reference not mounted")
class TestSingletrackGoldenParity:
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
        # measured full-lap (PARITY.json): corr 0.99998 / 0.9994, median
        # 4.36 N / 1.4e-4 rad/s — gates with generous headroom but 10-25x
        # tighter than the round-1 0.8/0.8
        assert rep.correlation[0] > 0.995
        assert rep.correlation[1] > 0.99
        assert rep.median_abs_dev[0] < 15.0
        assert rep.median_abs_dev[1] < 1e-3


@pytest.mark.skipif(not os.path.isdir(REF_DATA), reason="reference not mounted")
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
