"""Single-track ("dynamic bicycle") model with the modified Fiala brush tire.

Pure-jnp re-derivation of the reference's CasADi symbolic model
(vehicle_control/models/dynamic_car.py:49-191, implementing Laurense & Gerdes
TCST 2022 eqs. 1a-1f / 11a-b / 41a-f).  Every function is trace-once and
``vmap``-clean over arbitrary leading batch axes of states/actions; the
parameter dataclass broadcasts too, so the model itself supports batched
(e.g. friction-swept) parameters.  The XLA solver path consumes this
end-to-end: problems.build_cascaded_problem(p_override=...) +
parallel.make_param_batched_racing_step give every scenario its own
params in ONE compiled program (scripts/sweep.py --frictions).  Only the
Pallas kernel path still inlines params as float literals (a Mosaic
requirement) and builds one kernel per parameter set.

State  (ns=8): Ux, Uy, r, delta, s, ey, epsi, t
Action (na=2): Fx, w

The only deliberate deviations from the reference expressions are numerical
guards (``safe_sqrt``/``safe_div``) that are inactive on feasible states; the
reference instead lets CasADi emit NaN and relies on IPOPT step rejection.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from vehicle_control_tpu.utils.integrators import euler, rk4
from vehicle_control_tpu.utils.math import arctan, safe_div, safe_sqrt, tan
from vehicle_control_tpu.utils.structs import VectorSpec

GRAVITY = 9.88  # the reference's value (dynamic_car.py:61), kept for parity

STATE = VectorSpec(
    "dynamic_car_state",
    ["Ux", "Uy", "r", "delta", "s", "ey", "epsi", "t"],
)
ACTION = VectorSpec("dynamic_car_action", ["Fx", "w"], [r"$F_x$", r"$\omega$"])


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DynamicCarParams:
    """Car + environment parameters (config/models/dynamic_car.yaml schema)."""

    m: jnp.ndarray
    Izz: jnp.ndarray
    a: jnp.ndarray
    b: jnp.ndarray
    l: jnp.ndarray
    h: jnp.ndarray
    eps: jnp.ndarray
    Peng: jnp.ndarray
    Xdf: jnp.ndarray
    Xdr: jnp.ndarray
    Xbf: jnp.ndarray
    Xbr: jnp.ndarray
    Caf: jnp.ndarray
    Car: jnp.ndarray
    mu_f: jnp.ndarray
    mu_r: jnp.ndarray
    theta: jnp.ndarray
    phi: jnp.ndarray
    Av2: jnp.ndarray
    Cd: jnp.ndarray
    Frr: jnp.ndarray

    @classmethod
    def from_config(cls, config) -> "DynamicCarParams":
        car, env = config["car"], config["env"]
        return cls(
            m=jnp.asarray(float(car["m"])),
            Izz=jnp.asarray(float(car["Izz"])),
            a=jnp.asarray(float(car["a"])),
            b=jnp.asarray(float(car["b"])),
            l=jnp.asarray(float(car["l"])),
            h=jnp.asarray(float(car["h"])),
            eps=jnp.asarray(float(car["eps"])),
            Peng=jnp.asarray(float(car["Peng"])),
            Xdf=jnp.asarray(float(car["Xd"]["f"])),
            Xdr=jnp.asarray(float(car["Xd"]["r"])),
            Xbf=jnp.asarray(float(car["Xb"]["f"])),
            Xbr=jnp.asarray(float(car["Xb"]["r"])),
            Caf=jnp.asarray(float(car["C_alpha"]["f"])),
            Car=jnp.asarray(float(car["C_alpha"]["r"])),
            mu_f=jnp.asarray(float(env["mu"]["f"])),
            mu_r=jnp.asarray(float(env["mu"]["r"])),
            theta=jnp.asarray(float(env["theta"])),
            phi=jnp.asarray(float(env["phi"])),
            Av2=jnp.asarray(float(env["Av2"])),
            Cd=jnp.asarray(float(env["Cd"])),
            Frr=jnp.asarray(float(env["Frr"])),
        )


# ---------------------------------------------------------------------------
# Force stack
# ---------------------------------------------------------------------------


# tanh blending scale of the drive/brake split (reference: dynamic_car.py:78);
# shared with the analytic Jacobians in solvers/fm_singletrack.py so the
# primal and its hand-derived derivatives cannot drift apart.
DRIVE_SPLIT_SCALE = 1000.0


def drive_split_front(Fx, p: DynamicCarParams):
    """Front drive/brake blend Xf (reference: dynamic_car.py:78-79)."""
    return (p.Xdf - p.Xbf) / 2 * jnp.tanh(2 * (Fx / DRIVE_SPLIT_SCALE + 0.5)) + (
        p.Xdf + p.Xbf
    ) / 2


def drive_split_rear(Fx, p: DynamicCarParams):
    """Rear drive/brake blend Xr (reference: dynamic_car.py:83)."""
    return (p.Xbr - p.Xdr) / 2 * jnp.tanh(-2 * (Fx / DRIVE_SPLIT_SCALE + 0.5)) + (
        p.Xdr + p.Xbr
    ) / 2


def Fx_f(Fx, p: DynamicCarParams):
    return Fx * drive_split_front(Fx, p)


def Fx_r(Fx, p: DynamicCarParams):
    return Fx * drive_split_rear(Fx, p)


def Fz_f(Ux, Fx, p: DynamicCarParams):
    """Front normal load with longitudinal weight transfer
    (reference: dynamic_car.py:98)."""
    static = (p.b / p.l) * p.m * (
        GRAVITY * jnp.cos(p.theta) * jnp.cos(p.phi) + p.Av2 * Ux**2
    )
    return static - p.h * Fx / p.l


def Fz_r(Ux, Fx, p: DynamicCarParams):
    """Rear normal load (reference: dynamic_car.py:101)."""
    static = (p.a / p.l) * p.m * (
        GRAVITY * jnp.cos(p.theta) * jnp.cos(p.phi) + p.Av2 * Ux**2
    )
    return static + p.h * Fx / p.l


def Fy_max_f(Ux, Fx, p: DynamicCarParams):
    """Friction-limited max front lateral force (reference: dynamic_car.py:107)."""
    return safe_sqrt((p.mu_f * Fz_f(Ux, Fx, p)) ** 2 - (0.99 * Fx_f(Fx, p)) ** 2)


def Fy_max_r(Ux, Fx, p: DynamicCarParams):
    return safe_sqrt((p.mu_r * Fz_r(Ux, Fx, p)) ** 2 - (0.99 * Fx_r(Fx, p)) ** 2)


def alpha_f(Ux, Uy, r, delta, p: DynamicCarParams):
    """Front slip angle, paper eq. 11a (reference: dynamic_car.py:111)."""
    return arctan(safe_div(Uy + p.a * r, Ux)) - delta


def alpha_r(Ux, Uy, r, delta, p: DynamicCarParams):
    """Rear slip angle, paper eq. 11b (reference: dynamic_car.py:114)."""
    return arctan(safe_div(Uy - p.b * r, Ux))


def alphamod_f(Fx, Ux, p: DynamicCarParams):
    """Front slip angle at tire saturation (reference: dynamic_car.py:119)."""
    return arctan(3.0 * Fy_max_f(Ux, Fx, p) * p.eps / p.Caf)


def alphamod_r(Fx, Ux, p: DynamicCarParams):
    return arctan(3.0 * Fy_max_r(Ux, Fx, p) * p.eps / p.Car)


def _fiala(alpha, alphamod, Fymax, Calpha, eps):
    """Modified Fiala brush tire (reference: dynamic_car.py:121-128).

    ``jnp.where`` replaces ``ca.if_else``; both branches are evaluated, so the
    unsaturated branch uses the guarded Fymax to stay finite when saturated.
    """
    ta = tan(alpha)
    unsat = (
        -Calpha * ta
        + Calpha**2 * jnp.abs(ta) * ta / (3.0 * Fymax)
        - Calpha**3 * ta**3 / (27.0 * Fymax**2)
    )
    sat = -Calpha * (1 - 2 * eps + eps**2) * ta - Fymax * (
        3 * eps**2 - 2 * eps**3
    ) * jnp.sign(alpha)
    return jnp.where(jnp.abs(alpha) <= alphamod, unsat, sat)


def Fy_f(Ux, Uy, r, delta, Fx, p: DynamicCarParams):
    af = alpha_f(Ux, Uy, r, delta, p)
    return _fiala(af, alphamod_f(Fx, Ux, p), Fy_max_f(Ux, Fx, p), p.Caf, p.eps)


def Fy_r(Ux, Uy, r, delta, Fx, p: DynamicCarParams):
    ar = alpha_r(Ux, Uy, r, delta, p)
    return _fiala(ar, alphamod_r(Fx, Ux, p), Fy_max_r(Ux, Fx, p), p.Car, p.eps)


def drag(Ux, p: DynamicCarParams):
    """Rolling resistance + aero drag (reference: dynamic_car.py:144-149)."""
    return p.Frr + p.Cd * Ux**2


# ---------------------------------------------------------------------------
# ODEs
# ---------------------------------------------------------------------------


def temporal_ode(x, u, k, p: DynamicCarParams):
    """Temporal Frenet-frame dynamics, paper eqs. 1a-1f
    (reference: dynamic_car.py:152-163)."""
    Ux, Uy, r, delta, s, ey, epsi, t = [x[..., i] for i in range(8)]
    Fx, w = u[..., 0], u[..., 1]

    fxf = Fx_f(Fx, p)
    fxr = Fx_r(Fx, p)
    fyf = Fy_f(Ux, Uy, r, delta, Fx, p)
    fyr = Fy_r(Ux, Uy, r, delta, Fx, p)
    Fd = drag(Ux, p)
    Fb = 0.0  # flat track (reference: dynamic_car.py:145)

    cd, sd = jnp.cos(delta), jnp.sin(delta)
    Ux_dot = (fxf * cd - fyf * sd + fxr - Fd) / p.m + r * Uy
    Uy_dot = (fyf * cd + fxf * sd + fyr + Fb) / p.m - r * Ux
    r_dot = (p.a * (fyf * cd + fxf * sd) - p.b * fyr) / p.Izz
    delta_dot = w
    s_dot = (Ux * jnp.cos(epsi) - Uy * jnp.sin(epsi)) / (1.0 - k * ey)
    ey_dot = Ux * jnp.sin(epsi) + Uy * jnp.cos(epsi)
    epsi_dot = r - k * s_dot
    t_dot = jnp.ones_like(Ux)
    return jnp.stack(
        [Ux_dot, Uy_dot, r_dot, delta_dot, s_dot, ey_dot, epsi_dot, t_dot], axis=-1
    )


def spatial_ode(x, u, k, p: DynamicCarParams):
    """Spatially-parameterised dynamics, paper eqs. 41a-41f
    (reference: dynamic_car.py:169-187): d(state)/ds = d(state)/dt / s_dot."""
    xdot = temporal_ode(x, u, k, p)
    s_dot = xdot[..., 4]
    inv = safe_div(1.0, s_dot, eps=1e-3)
    prime = xdot * inv[..., None]
    # s' = 1 exactly (reference: dynamic_car.py:174)
    return prime.at[..., 4].set(jnp.ones_like(s_dot))


def make_transitions(p: DynamicCarParams):
    """Discrete transitions, both RK4 (reference: dynamic_car.py:166, 188)."""
    temporal = rk4(lambda x, u, k: temporal_ode(x, u, k, p))
    spatial = rk4(lambda x, u, k: spatial_ode(x, u, k, p))
    return temporal, spatial


class DynamicCar:
    """Thin stateful wrapper with the reference's Robot/RacingCar API
    (drive / transition / rel2glob; reference: models/racing_car.py:34-52)."""

    state_spec = STATE
    action_spec = ACTION

    def __init__(self, config, track=None):
        self.config = config
        self.track = track
        self.dt = float(config["dt"])
        self.params = DynamicCarParams.from_config(config)
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


def diagnostics(x, u, p: DynamicCarParams):
    """Tire-force / slip diagnostics (the reference's debug ``print``,
    dynamic_car.py:20-47, as data instead of stdout)."""
    Ux, Uy, r, delta = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    Fx = u[..., 0]
    af = alpha_f(Ux, Uy, r, delta, p)
    ar = alpha_r(Ux, Uy, r, delta, p)
    return {
        "Fx_f": Fx_f(Fx, p),
        "Fx_r": Fx_r(Fx, p),
        "Fy_f": Fy_f(Ux, Uy, r, delta, Fx, p),
        "Fy_r": Fy_r(Ux, Uy, r, delta, Fx, p),
        "Fz_f": Fz_f(Ux, Fx, p),
        "Fz_r": Fz_r(Ux, Fx, p),
        "alpha_f": af,
        "alpha_r": ar,
        "alphamod_f": alphamod_f(Fx, Ux, p),
        "alphamod_r": alphamod_r(Fx, Ux, p),
        "slipping_f": jnp.abs(af) - alphamod_f(Fx, Ux, p),
        "slipping_r": jnp.abs(ar) - alphamod_r(Fx, Ux, p),
    }
