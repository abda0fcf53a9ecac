"""Feedback-linearization controller tests (reference demo:
scripts/traj_tracking_main.py — DFBL tracking a circle)."""

import jax.numpy as jnp
import numpy as np

from vehicle_control_tpu.controllers.feedback_linearization import DFBL, FBL
from vehicle_control_tpu.environment.trajectory import Circle
from vehicle_control_tpu.models.differential_drive import DifferentialDrive
from vehicle_control_tpu.simulation.trajectory_tracking import (
    TrajectoryTrackingSimulation,
)


def _robot():
    return DifferentialDrive({"dt": 0.05})


class TestDFBL:
    def test_tracks_circle(self):
        robot = _robot()
        robot.input = robot.input.at[0].set(0.1)
        ctrl = DFBL(kp=jnp.array([5.0, 5.0]), kd=jnp.array([2.0, 2.0]))
        sim = TrajectoryTrackingSimulation("t", robot, ctrl, Circle())
        run = sim.run(N=200)
        # reference demo: converges onto the unit circle within ~10 s
        tail_err = np.linalg.norm(np.asarray(run.e_p[-50:]), axis=-1)
        assert tail_err.max() < 0.05
        assert np.all(np.isfinite(np.asarray(run.states)))

    def test_tail_on_circle(self):
        robot = _robot()
        robot.input = robot.input.at[0].set(0.1)
        ctrl = DFBL(kp=jnp.array([5.0, 5.0]), kd=jnp.array([2.0, 2.0]))
        run = TrajectoryTrackingSimulation("t", robot, ctrl, Circle()).run(N=300)
        xy = np.asarray(run.states[-50:, :2])
        radii = np.linalg.norm(xy, axis=-1)
        np.testing.assert_allclose(radii, 1.0, atol=0.05)


class TestFBL:
    def test_reduces_error(self):
        robot = _robot()
        ctrl = FBL(kp=jnp.array([1.0, 1.0]), kd=jnp.array([1.0, 1.0]))
        run = TrajectoryTrackingSimulation("t", robot, ctrl, Circle()).run(N=300)
        err = np.linalg.norm(np.asarray(run.e_p), axis=-1)
        # static FBL on point-B: bounded tracking with residual offset
        assert err[-50:].max() < 0.3
        assert err[-50:].mean() < err[:20].mean()
