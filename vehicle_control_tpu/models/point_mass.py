"""Dynamic point-mass model: the low-fidelity long-horizon tail of the
cascaded MPC (reference: vehicle_control/models/dynamic_point_mass.py:26-103).

State  (ns=5): V, s, ey, epsi, t
Action (na=2): Fx, Fy

The force split / normal-load helpers mirror the dynamic car's and exist for
the controller's friction-circle machinery, not the ODE (SURVEY §2.1 #4).
Discretization is explicit Euler, matching the reference
(dynamic_point_mass.py:88-103).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from vehicle_control_tpu.models import dynamic_car as dc
from vehicle_control_tpu.utils.integrators import euler
from vehicle_control_tpu.utils.math import safe_div
from vehicle_control_tpu.utils.structs import VectorSpec

STATE = VectorSpec("point_mass_state", ["V", "s", "ey", "epsi", "t"])
ACTION = VectorSpec("point_mass_action", ["Fx", "Fy"], [r"$F_x$", r"$F_y$"])

# The point mass shares the car/env parameter schema.
PointMassParams = dc.DynamicCarParams


def Fz_f(V, Fx, p: PointMassParams):
    """Front normal load (reference: dynamic_point_mass.py:68)."""
    return dc.Fz_f(V, Fx, p)


def Fz_r(V, Fx, p: PointMassParams):
    return dc.Fz_r(V, Fx, p)


def temporal_ode(x, u, k, p: PointMassParams):
    """Temporal point-mass dynamics (reference: dynamic_point_mass.py:81-87)."""
    V, s, ey, epsi, t = [x[..., i] for i in range(5)]
    Fx, Fy = u[..., 0], u[..., 1]
    Fb = 0.0
    Fd = p.Frr + p.Cd * V**2
    V_dot = (Fx - Fd) / p.m
    s_dot = (V * jnp.cos(epsi)) / (1.0 - k * ey)
    ey_dot = V * jnp.sin(epsi)
    epsi_dot = (Fy + Fb) / (p.m * jnp.where(jnp.abs(V) > 1e-3, V, 1e-3)) - k * s_dot
    t_dot = jnp.ones_like(V)
    return jnp.stack([V_dot, s_dot, ey_dot, epsi_dot, t_dot], axis=-1)


def spatial_ode(x, u, k, p: PointMassParams):
    """Spatial point-mass dynamics (reference: dynamic_point_mass.py:93-99)."""
    xdot = temporal_ode(x, u, k, p)
    s_dot = xdot[..., 1]
    inv = safe_div(1.0, s_dot, eps=1e-3)
    prime = xdot * inv[..., None]
    return prime.at[..., 1].set(jnp.ones_like(s_dot))


def make_transitions(p: PointMassParams):
    """Euler for both forms (reference: dynamic_point_mass.py:88-103)."""
    temporal = euler(lambda x, u, k: temporal_ode(x, u, k, p))
    spatial = euler(lambda x, u, k: spatial_ode(x, u, k, p))
    return temporal, spatial


class DynamicPointMass:
    state_spec = STATE
    action_spec = ACTION

    def __init__(self, config, track=None):
        self.config = config
        self.track = track
        self.dt = float(config["dt"])
        self.params = PointMassParams.from_config(config)
        self.transition, self.spatial_transition = make_transitions(self.params)
        self.state = STATE.zeros(dtype=jnp.float64)
        self.input = ACTION.zeros(dtype=jnp.float64)

    def rel2glob(self, state):
        from vehicle_control_tpu.environment import track as track_mod

        return track_mod.rel2glob(
            self.track.data,
            STATE.get(state, "s"),
            STATE.get(state, "ey"),
            STATE.get(state, "epsi"),
        )
