"""Trajectory-tracking simulation for the FBL demos
(reference: vehicle_control/simulation/trajectory_tracking.py:16-61).

The loop (command -> drive -> log) is a ``lax.scan``; rendering is decoupled
and handled by :mod:`vehicle_control_tpu.simulation.render` from the returned
arrays (the reference animates inline, :63-177).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from vehicle_control_tpu.models import differential_drive as dd


class TrackingRun(NamedTuple):
    states: jnp.ndarray  # (N, 4)
    actions: jnp.ndarray  # (N, 2)
    p_ref: jnp.ndarray  # (N, 2)
    e_p: jnp.ndarray  # (N, 2)


class TrajectoryTrackingSimulation:
    """reference API: TrajectoryTrackingSimulation(name, robot, controller,
    reference).run(N)."""

    def __init__(self, name, robot, controller, reference):
        self.name = name
        self.robot = robot
        self.controller = controller
        self.reference = reference

    def run(self, N: int = 200) -> TrackingRun:
        transition = dd.make_transition()
        controller = self.controller
        reference = self.reference
        dt = self.robot.dt
        is_dfbl = hasattr(controller, "h")

        def step(carry, _):
            state, prev_input = carry
            if is_dfbl:
                action, p_ref, e_p = controller.control(state, prev_input, reference)
            else:
                action, p_ref, e_p = controller.control(state, reference)
            next_state = transition(state, action, 0.0, dt)
            return (next_state, action), (state, action, p_ref, e_p)

        (final_state, final_input), outs = jax.jit(
            lambda c: lax.scan(step, c, None, length=N)
        )((self.robot.state, self.robot.input))
        self.robot.state = final_state
        self.robot.input = final_input
        self.result = TrackingRun(*outs)
        return self.result

    def summarize(self) -> str:
        r = self.result
        import numpy as np

        mse = float(jnp.mean(jnp.sum(r.e_p**2, axis=-1)))
        final_err = float(jnp.linalg.norm(r.e_p[-1]))
        text = (
            f"Tracking MSE ({self.name}): {mse:.5f}\n"
            f"Final position error ({self.name}): {final_err:.5f}"
        )
        print(text)
        return text
