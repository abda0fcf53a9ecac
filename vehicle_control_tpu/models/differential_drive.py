"""Differential-drive (unicycle) model in global coordinates
(reference: vehicle_control/models/differential_drive.py:22-48).

State  (ns=4): x, y, psi, t
Action (na=2): v, w

RK4 discretization (the reference routes through Robot.integrate,
models/robot.py:45-67 — a plain RK4).
"""

from __future__ import annotations

import jax.numpy as jnp

from vehicle_control_tpu.utils.integrators import rk4
from vehicle_control_tpu.utils.structs import VectorSpec

STATE = VectorSpec("differential_drive_state", ["x", "y", "psi", "t"])
ACTION = VectorSpec("differential_drive_action", ["v", "w"])


def temporal_ode(x, u, k=None, params=None):
    """Unicycle kinematics (reference: differential_drive.py:22-35)."""
    psi = x[..., 2]
    v, w = u[..., 0], u[..., 1]
    return jnp.stack(
        [v * jnp.cos(psi), v * jnp.sin(psi), w, jnp.ones_like(psi)], axis=-1
    )


def make_transition():
    return rk4(lambda x, u, k: temporal_ode(x, u))


class DifferentialDrive:
    state_spec = STATE
    action_spec = ACTION

    def __init__(self, config):
        self.config = config
        self.dt = float(config["dt"])
        self.transition = make_transition()
        self.state = STATE.zeros(dtype=jnp.float64)
        self.input = ACTION.zeros(dtype=jnp.float64)

    def drive(self, action):
        self.state = self.transition(self.state, jnp.asarray(action), 0.0, self.dt)
        self.input = jnp.asarray(action)
        return self.state
