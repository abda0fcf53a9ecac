"""Named vector specs.

The reference's ``FancyVector`` (vehicle_control/utils/fancy_vector.py:7-72)
couples numeric values with CasADi symbols.  Under JAX, tracing makes the
symbolic half unnecessary: a state is just a ``jnp`` array whose last axis is
indexed by name through a :class:`VectorSpec`.  Specs are static Python
objects (never traced), so name lookups cost nothing inside ``jit``.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np


class VectorSpec:
    """Maps component names to last-axis indices of an array."""

    def __init__(self, name: str, keys: Sequence[str], labels: Sequence[str] | None = None):
        self.name = name
        self.keys = tuple(keys)
        self.labels = tuple(labels) if labels is not None else self.keys
        self._index = {k: i for i, k in enumerate(self.keys)}

    def __len__(self) -> int:
        return len(self.keys)

    def __repr__(self) -> str:  # pragma: no cover
        return f"VectorSpec({self.name}, {list(self.keys)})"

    def index(self, key: str) -> int:
        return self._index[key]

    def pack(self, dtype=None, **components) -> jnp.ndarray:
        """Build a vector (last axis = len(self)) from named components.

        Missing components default to 0.  Components may be scalars or arrays
        with a common broadcast shape: the result gets that shape + (ns,).
        """
        unknown = set(components) - set(self.keys)
        if unknown:
            raise KeyError(f"unknown components for {self.name}: {sorted(unknown)}")
        vals = [jnp.asarray(components.get(k, 0.0), dtype=dtype) for k in self.keys]
        vals = jnp.broadcast_arrays(*vals)
        return jnp.stack(vals, axis=-1)

    def unpack(self, arr) -> dict:
        """Split the last axis into a name -> array dict."""
        arr = jnp.asarray(arr)
        if arr.shape[-1] != len(self):
            raise ValueError(
                f"{self.name}: expected last axis {len(self)}, got {arr.shape}"
            )
        return {k: arr[..., i] for i, k in enumerate(self.keys)}

    def get(self, arr, key: str):
        return jnp.asarray(arr)[..., self.index(key)]

    def set(self, arr, key: str, value):
        return jnp.asarray(arr).at[..., self.index(key)].set(value)

    def zeros(self, shape=(), dtype=jnp.float32) -> jnp.ndarray:
        return jnp.zeros(tuple(shape) + (len(self),), dtype=dtype)

    def to_numpy(self, **components) -> np.ndarray:
        vals = [np.asarray(components.get(k, 0.0), dtype=np.float64) for k in self.keys]
        return np.stack(np.broadcast_arrays(*vals), axis=-1)
