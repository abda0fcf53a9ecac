"""Fixed-step one-step integrators.

The reference builds CasADi ``f_discrete(state, action, curvature, h)``
functions (vehicle_control/utils/integrators.py:15-49).  Here an integrator is
a higher-order function: given a continuous-time ODE right-hand side
``f(state, action, curvature) -> state_dot`` it returns the discrete
transition ``step(state, action, curvature, h) -> next_state``.

All returned functions are pure jnp, trace-once under ``jax.jit`` and
``jax.vmap``-clean over any leading batch axes.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

Ode = Callable  # f(x, u, k) -> x_dot
Step = Callable  # step(x, u, k, h) -> x_next


def _hb(h):
    """Broadcast the step size over the trailing state axis so per-scenario
    (batched) step sizes work: scalar h -> (1,), batched (...,) h -> (..., 1)."""
    return jnp.asarray(h)[..., None]


def euler(f: Ode) -> Step:
    """Explicit Euler (reference: utils/integrators.py:15-23)."""

    def step(x, u, k, h):
        return x + _hb(h) * f(x, u, k)

    return step


def rk2(f: Ode) -> Step:
    """Midpoint RK2 (reference: utils/integrators.py:40-49)."""

    def step(x, u, k, h):
        h = _hb(h)
        k1 = f(x, u, k)
        k2 = f(x + 0.5 * h * k1, u, k)
        return x + h * k2

    return step


def rk4(f: Ode) -> Step:
    """Classic RK4 (reference: utils/integrators.py:26-37)."""

    def step(x, u, k, h):
        h = _hb(h)
        k1 = f(x, u, k)
        k2 = f(x + 0.5 * h * k1, u, k)
        k3 = f(x + 0.5 * h * k2, u, k)
        k4 = f(x + h * k3, u, k)
        return x + h * (k1 + 2.0 * k2 + 2.0 * k3 + k4) / 6.0

    return step


INTEGRATORS = {"euler": euler, "rk2": rk2, "rk4": rk4}
