"""Flat-output reference trajectories for the feedback-linearization demos
(reference: vehicle_control/environment/trajectory.py)."""

from __future__ import annotations

from abc import ABC, abstractmethod

import jax.numpy as jnp


class Trajectory(ABC):
    @abstractmethod
    def update(self, t):
        """Return dict with desired flat output p, pd, pdd at time t."""


class Circle(Trajectory):
    """Analytic circle (reference: trajectory.py:24-60)."""

    def __init__(self, T=6, center=(0.0, 0.0), radius=1.0, freq=0.2):
        self.center = jnp.asarray(center, dtype=jnp.float64)
        self.radius = radius
        self.freq = freq
        self.omega = 2.0 * jnp.pi * freq
        self.T = T

    def update(self, t):
        w = self.omega
        c, s = jnp.cos(w * t), jnp.sin(w * t)
        p = self.center + self.radius * jnp.stack([c, s], axis=-1)
        pd = self.radius * w * jnp.stack([-s, c], axis=-1)
        pdd = -self.radius * w**2 * jnp.stack([c, s], axis=-1)
        return {"p": p, "pd": pd, "pdd": pdd}
