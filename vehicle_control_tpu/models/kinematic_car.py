"""Kinematic bicycle in Frenet coordinates
(reference: vehicle_control/models/kinematic_car.py:22-64).

State  (ns=6): v, delta, s, ey, epsi, t
Action (na=2): a, w

Euler discretization for both temporal and spatial forms, matching the
reference (kinematic_car.py:42-45, 61-64).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from vehicle_control_tpu.utils.integrators import euler
from vehicle_control_tpu.utils.math import arctan, safe_div, tan
from vehicle_control_tpu.utils.structs import VectorSpec

STATE = VectorSpec("kinematic_car_state", ["v", "delta", "s", "ey", "epsi", "t"])
ACTION = VectorSpec("kinematic_car_action", ["a", "w"], [r"$a$", r"$\omega$"])


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class KinematicCarParams:
    l: jnp.ndarray  # wheelbase (config/models/kinematic_car.yaml)

    @classmethod
    def from_config(cls, config) -> "KinematicCarParams":
        return cls(l=jnp.asarray(float(config["car"]["l"])))


def temporal_ode(x, u, k, p: KinematicCarParams):
    """Temporal kinematic dynamics (reference: kinematic_car.py:34-41)."""
    v, delta, s, ey, epsi, t = [x[..., i] for i in range(6)]
    a, w = u[..., 0], u[..., 1]
    v_dot = a
    delta_dot = w
    s_dot = (v * jnp.cos(epsi)) / (1.0 - ey * k)
    ey_dot = v * jnp.sin(epsi)
    epsi_dot = v * tan(delta) / p.l - s_dot * k
    t_dot = jnp.ones_like(v)
    return jnp.stack([v_dot, delta_dot, s_dot, ey_dot, epsi_dot, t_dot], axis=-1)


def spatial_ode(x, u, k, p: KinematicCarParams):
    """Spatial kinematic dynamics (reference: kinematic_car.py:47-60).

    The reference writes these in closed form; they are exactly
    temporal_ode / s_dot with s' = 1, which is what we compute.
    """
    v, delta, s, ey, epsi, t = [x[..., i] for i in range(6)]
    a, w = u[..., 0], u[..., 1]
    dt_ds = safe_div(1.0 - ey * k, v * jnp.cos(epsi), eps=1e-3)
    v_prime = dt_ds * a
    delta_prime = dt_ds * w
    ey_prime = (1.0 - ey * k) * tan(epsi)
    epsi_prime = tan(delta) / p.l * safe_div(1.0 - ey * k, jnp.cos(epsi)) - k
    s_prime = jnp.ones_like(v)
    t_prime = dt_ds
    return jnp.stack(
        [v_prime, delta_prime, s_prime, ey_prime, epsi_prime, t_prime], axis=-1
    )


def make_transitions(p: KinematicCarParams):
    temporal = euler(lambda x, u, k: temporal_ode(x, u, k, p))
    spatial = euler(lambda x, u, k: spatial_ode(x, u, k, p))
    return temporal, spatial


class KinematicCar:
    state_spec = STATE
    action_spec = ACTION

    def __init__(self, config, track=None):
        self.config = config
        self.track = track
        self.dt = float(config["dt"])
        self.params = KinematicCarParams.from_config(config)
        self.transition, self.spatial_transition = make_transitions(self.params)
        self.state = STATE.zeros(dtype=jnp.float64)
        self.input = ACTION.zeros(dtype=jnp.float64)

    def drive(self, action):
        from vehicle_control_tpu.environment import track as track_mod

        k = track_mod.curvature(self.track.data, STATE.get(self.state, "s"))
        self.state = self.transition(self.state, jnp.asarray(action), k, self.dt)
        self.input = jnp.asarray(action)
        return self.state

    def rel2glob(self, state):
        from vehicle_control_tpu.environment import track as track_mod

        return track_mod.rel2glob(
            self.track.data,
            STATE.get(state, "s"),
            STATE.get(state, "ey"),
            STATE.get(state, "epsi"),
        )
