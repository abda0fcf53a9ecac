"""Feedback-linearization controllers for the differential-drive robot.

Pure-jnp re-derivation of the reference controllers
(vehicle_control/controllers/feedback_linearization/differential_drive.py):

* :class:`FBL` — static feedback linearization of the point at distance ``b``
  ahead of the wheel axis (reference :13-40).
* :class:`DFBL` — dynamic feedback linearization with an internal
  longitudinal-velocity integrator state (reference :43-87; the internal
  RK4 on ``v_dot = a`` collapses to ``v + h*a`` exactly, which is what we
  compute).

Both expose ``command(robot_state, robot_input, reference, t)`` as a pure
function plus the reference's stateful ``command(robot, reference)`` API.
Batched (vmapped) fleets of robots tracking different references work out of
the box since everything is jnp.
"""

from __future__ import annotations

import jax.numpy as jnp

from vehicle_control_tpu.utils.math import safe_div


class FBL:
    """Static feedback linearization (reference: differential_drive.py:13-40)."""

    def __init__(self, kp, kd, b: float = 0.1):
        self.kp = jnp.asarray(kp)
        self.kd = jnp.asarray(kd)
        self.b = b

    def control(self, state, reference):
        """Pure control law: state (4,) [x, y, psi, t] -> action (2,) [v, w]."""
        x, y, psi, t = state[..., 0], state[..., 1], state[..., 2], state[..., 3]
        cp, sp = jnp.cos(psi), jnp.sin(psi)
        x_b = x + self.b * cp
        y_b = y + self.b * sp
        ref = reference.update(t)
        e_p = ref["p"] - jnp.stack([x_b, y_b], axis=-1)
        u_io = ref["pd"] + self.kp * e_p
        v = cp * u_io[..., 0] + sp * u_io[..., 1]
        w = (-sp * u_io[..., 0] + cp * u_io[..., 1]) / self.b
        return jnp.stack([v, w], axis=-1), ref["p"], e_p

    def command(self, robot, reference):
        action, p_ref, e_p = self.control(robot.state, reference)
        return action, p_ref, e_p


class DFBL:
    """Dynamic feedback linearization (reference: differential_drive.py:43-87).

    Carries the commanded longitudinal speed as controller state: the
    linearizing output is acceleration; it is integrated (RK4 of v_dot = a,
    exactly v + h*a) into the velocity command.
    """

    def __init__(self, kp, kd, h: float = 0.05):
        self.kp = jnp.asarray(kp)
        self.kd = jnp.asarray(kd)
        self.h = h

    def control(self, state, robot_input, reference):
        """Pure law: (state (4,), previous input (2,)) -> (action, p_ref, e_p)."""
        x, y, psi, t = state[..., 0], state[..., 1], state[..., 2], state[..., 3]
        v_in = robot_input[..., 0]
        cp, sp = jnp.cos(psi), jnp.sin(psi)
        xd = cp * v_in
        yd = sp * v_in
        ref = reference.update(t)
        e_p = ref["p"] - jnp.stack([x, y], axis=-1)
        e_d = ref["pd"] - jnp.stack([xd, yd], axis=-1)
        u_io = ref["pdd"] + self.kp * e_p + self.kd * e_d
        a = cp * u_io[..., 0] + sp * u_io[..., 1]
        w = safe_div(-sp * u_io[..., 0] + cp * u_io[..., 1], v_in)
        v = v_in + self.h * a  # RK4 of v_dot = a is exact (reference :77-87)
        return jnp.stack([v, w], axis=-1), ref["p"], e_p

    def command(self, robot, reference):
        action, p_ref, e_p = self.control(robot.state, robot.input, reference)
        return action, p_ref, e_p
