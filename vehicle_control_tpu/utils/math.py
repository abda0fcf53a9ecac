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


# --- Mosaic-lowerable transcendentals ---------------------------------------
# Pallas TPU lowering implements sin/cos/exp/log but not tan/atan; the model
# stack uses these implementations everywhere so the identical expressions run
# on the XLA path and inside kernels.  atan is a degree-12 even polynomial in
# z^2 with the |x|>1 inversion identity; max abs error 3.4e-11 over the reals
# (fitted offline, see git history).

_ATAN_COEF = (
    0.99999999999263123, -0.3333333306680264, 0.1999998397885146,
    -0.14285333912904893, 0.11106380339266723, -0.090554546996879717,
    0.075185007155151209, -0.060787989990705574, 0.044565591157096275,
    -0.026990770717991868, 0.012096335799244793, -0.0034560864803735883,
    0.00046365012913819137,
)


def tan(x):
    """tan via sin/cos (identical mathematically; Mosaic-lowerable)."""
    return jnp.sin(x) / jnp.cos(x)


def arctan(x):
    """Polynomial arctan, |err| < 3.5e-11 (Mosaic-lowerable)."""
    x = jnp.asarray(x)
    ax = jnp.abs(x)
    inv = ax > 1.0
    s = jnp.where(x >= 0, 1.0, -1.0)
    # Odd form (z carries the sign) so grad(arctan)(0) == 1, not sign(0)*...
    # == 0.  The inversion-branch guard must keep 1/guard**2 finite in f32:
    # the *unselected* branch still back-propagates a -1/ax**2 cotangent, and
    # a 1e-30 floor overflows it to inf at ax ~ 0, poisoning the gradient at
    # the origin with 0*inf = NaN (hit at every standstill/straight-line
    # state via the slip angles).  1e-6 never binds when the branch is
    # selected (ax > 1).
    z = jnp.where(inv, s / jnp.maximum(ax, 1e-6), x)
    z2 = z * z
    acc = jnp.full_like(z, _ATAN_COEF[-1])
    for c in _ATAN_COEF[-2::-1]:
        acc = acc * z2 + c
    r = z * acc
    return jnp.where(inv, s * (jnp.pi / 2) - r, r)
