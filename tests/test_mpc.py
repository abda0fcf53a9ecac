"""Controller-level closed-loop tests.

The reference has no tests; its de-facto verification is golden closed-loop
runs + summary metrics (SURVEY §4).  These tests run the real controllers in
short closed loops and assert physical sanity: progress along the track,
bounded lateral error, near-zero constraint violation.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vehicle_control_tpu.controllers import (
    CascadedKinematicMPC,
    CascadedMPC,
    KinematicMPC,
    SingleTrackMPC,
)
from vehicle_control_tpu.environment.track import curvature
from vehicle_control_tpu.models import dynamic_car as dc
from vehicle_control_tpu.models import kinematic_car as kc
from vehicle_control_tpu.utils.config import load_config, project_root

import os


def _cfg(rel):
    return load_config(os.path.join(project_root(), "configs", rel))


@pytest.fixture(scope="module")
def car_cfg():
    return _cfg("models/dynamic_car.yaml")


@pytest.fixture(scope="module")
def kin_cfg():
    return _cfg("models/kinematic_car.yaml")


def _closed_loop(mpc, transition, track, state, n_steps, s_index):
    viols, eys = [], []
    for _ in range(n_steps):
        act = mpc.command(state)
        viols.append(float(mpc.last_info.violation))
        k = curvature(track.data, state[s_index])
        state = transition(state, act, k, 0.05)
    return state, max(viols)


class TestKinematicMPC:
    def test_drives_forward_within_bounds(self, ippodromo_track, kin_cfg):
        ctrl = _cfg("controllers/kinematic.yaml")
        ctrl["obstacles"] = False
        mpc = KinematicMPC(kin_cfg, ippodromo_track, ctrl)
        p = kc.KinematicCarParams.from_config(kin_cfg)
        temporal, _ = kc.make_transitions(p)
        state = jnp.array([0.1, 0.0, 1.0, 0.0, 0.0, 0.0])
        state, maxviol = _closed_loop(
            mpc, temporal, ippodromo_track, state, 60, s_index=2
        )
        assert float(state[2]) > 4.0  # made progress
        assert float(state[0]) > 1.0  # accelerated
        assert abs(float(state[3])) < 3.2  # on the road
        assert maxviol < 0.5


class TestCascadedMPC:
    def test_accelerates_and_tracks(self, ippodromo_track, car_cfg):
        ctrl = _cfg("controllers/cascaded.yaml")
        ctrl["obstacles"] = False
        ctrl["horizon_pm"] = 15  # the reference's race1 configuration
        mpc = CascadedMPC(car_cfg, ippodromo_track, ctrl)
        p = dc.DynamicCarParams.from_config(car_cfg)
        temporal, _ = dc.make_transitions(p)
        state = jnp.zeros(8).at[0].set(4.0).at[4].set(1.0)
        state, maxviol = _closed_loop(
            mpc, temporal, ippodromo_track, state, 40, s_index=4
        )
        assert float(state[0]) > 6.0  # accelerated from 4 m/s
        assert abs(float(state[5])) < 3.2
        assert maxviol < 1e-2

    def test_prediction_is_on_track(self, ippodromo_track, car_cfg):
        ctrl = _cfg("controllers/cascaded.yaml")
        ctrl["obstacles"] = False
        ctrl["horizon_pm"] = 15
        mpc = CascadedMPC(car_cfg, ippodromo_track, ctrl)
        state = jnp.zeros(8).at[0].set(4.0).at[4].set(1.0)
        mpc.command(state)
        preds = np.asarray(mpc.get_state_prediction())
        assert preds.shape == (35, 3)
        assert np.all(np.isfinite(preds))


class TestSingleTrackMPC:
    def test_progresses(self, ippodromo_track, car_cfg):
        ctrl = _cfg("controllers/singletrack.yaml")
        ctrl["obstacles"] = False
        ctrl["horizon"] = 30  # shorter than the shipped N=60 to keep CI fast
        mpc = SingleTrackMPC(car_cfg, ippodromo_track, ctrl)
        p = dc.DynamicCarParams.from_config(car_cfg)
        temporal, _ = dc.make_transitions(p)
        state = jnp.zeros(8).at[0].set(4.0).at[4].set(1.0)
        state, maxviol = _closed_loop(
            mpc, temporal, ippodromo_track, state, 25, s_index=4
        )
        assert float(state[0]) > 5.0
        assert abs(float(state[5])) < 3.2
        assert maxviol < 1e-2


class TestCascadedKinematicMPC:
    def test_progresses(self, ippodromo_track, car_cfg):
        ctrl = _cfg("controllers/cascaded_kinematic.yaml")
        ctrl["obstacles"] = False
        mpc = CascadedKinematicMPC(car_cfg, ippodromo_track, ctrl)
        p = dc.DynamicCarParams.from_config(car_cfg)
        temporal, _ = dc.make_transitions(p)
        state = jnp.zeros(8).at[0].set(4.0).at[4].set(1.0)
        state, maxviol = _closed_loop(
            mpc, temporal, ippodromo_track, state, 25, s_index=4
        )
        assert float(state[0]) > 5.0
        assert abs(float(state[5])) < 3.2
        assert maxviol < 0.1


class TestSolverConfigPlumbing:
    def test_yaml_solver_section_reaches_alilqr_config(self):
        """Every key the tuned-budget YAML blocks use (incl. the r5 polish
        stage) must round-trip through _solver_config; a silently-dropped
        key would run the production loop at the wrong budget."""
        from vehicle_control_tpu.controllers.mpc.controllers import _solver_config

        cfg = {
            "solver": {
                "n_outer": 2,
                "n_inner": 6,
                "n_polish": 3,
                "polish_mu_boost": 2.0,
                "n_alpha": 6,
                "mu0": 300,
                "mu_scale": 100,
                "tol_con": 1e-3,
                "tol_cost": 1e-7,
                "recover_viol": 0.5,
            }
        }
        sc = _solver_config(cfg)
        assert (sc.n_outer, sc.n_inner, sc.n_polish) == (2, 6, 3)
        assert sc.polish_mu_boost == 2.0
        assert (sc.n_alpha, sc.mu0, sc.mu_scale) == (6, 300.0, 100.0)
        assert sc.recover_viol == 0.5
        # defaults unchanged when the section is absent
        sd = _solver_config({})
        assert (sd.n_outer, sd.n_inner, sd.n_polish) == (3, 8, 0)
        assert sd.polish_mu_boost == 1.0
