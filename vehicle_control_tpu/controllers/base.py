"""Controller base class (reference: controllers/controller.py:6-19)."""

from __future__ import annotations

from abc import ABC, abstractmethod

import jax.numpy as jnp


class Controller(ABC):
    """ABC with proportional/derivative gains; MPC subclasses ignore them
    (as in the reference, where only FBL/DFBL use kp/kd)."""

    def __init__(self, kp=None, kd=None):
        self.kp = jnp.asarray(kp) if kp is not None else None
        self.kd = jnp.asarray(kd) if kd is not None else None

    @abstractmethod
    def command(self, *args, **kwargs):
        """Compute the next action."""
