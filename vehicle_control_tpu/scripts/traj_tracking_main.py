"""Trajectory-tracking entry point
(reference: vehicle_control/scripts/traj_tracking_main.py)."""

import os

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from vehicle_control_tpu.controllers.feedback_linearization import DFBL
from vehicle_control_tpu.environment.trajectory import Circle
from vehicle_control_tpu.models.differential_drive import DifferentialDrive
from vehicle_control_tpu.simulation.trajectory_tracking import (
    TrajectoryTrackingSimulation,
)
from vehicle_control_tpu.utils.config import load_config, project_root


def main():
    reference = Circle()
    robot_config = load_config(
        os.path.join(project_root(), "configs/models/differential_drive.yaml")
    )
    robot = DifferentialDrive(config=robot_config)
    robot.input = robot.input.at[0].set(0.1)  # v = 0.1 (reference main:18)
    controller = DFBL(kp=jnp.array([5.0, 5.0]), kd=jnp.array([2.0, 2.0]))
    sim = TrajectoryTrackingSimulation("traj_tracking", robot, controller, reference)
    sim.run(N=200)
    sim.summarize()


if __name__ == "__main__":
    main()
