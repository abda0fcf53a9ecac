"""Small math helpers shared across the framework."""

from __future__ import annotations

import jax.numpy as jnp


def wrap(angle):
    """Wrap an angle into (-pi, pi].

    Branch-free jnp version of the reference's scalar helper
    (reference: vehicle_control/utils/common_utils.py:22-31).  The reference
    only applies one correction; for plant states the angle never exceeds one
    revolution per step, so behaviour is identical in practice, while this
    version is total.
    """
    return jnp.mod(jnp.asarray(angle) + jnp.pi, 2.0 * jnp.pi) - jnp.pi


def safe_sqrt(x, eps: float = 1e-9):
    """sqrt clamped away from 0 so gradients stay finite.

    Used where the reference lets CasADi produce NaN on infeasible iterates
    (e.g. the friction-limited Fymax at dynamic_car.py:107-108) and relies on
    IPOPT's step rejection; our solver keeps every iterate finite instead.
    """
    return jnp.sqrt(jnp.maximum(x, eps))


def safe_div(num, den, eps: float = 1e-6):
    """Division with a sign-preserving floor on the denominator magnitude."""
    den = jnp.asarray(den)
    sign = jnp.where(den >= 0, 1.0, -1.0)
    safe = sign * jnp.maximum(jnp.abs(den), eps)
    return num / safe
